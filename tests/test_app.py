"""Headless interactive-runtime tests: the exact flows gui.py drives."""

import time

import numpy as np
import pytest

from tpu_rt.app import (
    FrameRateLimiter,
    RayTracerInteraction,
    RenderMode,
    SceneManager,
)
from tpu_rt.app.interaction import procedural_noise_color
from tpu_rt.api import Vector3


@pytest.fixture
def rti():
    r = RayTracerInteraction(48, 36)
    r.settings["max_samples"] = 4
    r.settings["samples_per_batch"] = 2
    r.settings["max_depth"] = 2
    yield r
    r.stop_rendering()


def drain(rti, timeout=30.0, want_done=True):
    frames = []
    t0 = time.time()
    while time.time() - t0 < timeout:
        f = rti.get_frame()
        if f is None:
            time.sleep(0.02)
            continue
        frames.append(f)
        if want_done and f.get("done"):
            break
    return frames


def test_scene_factory_matches_reference_layout():
    scene = SceneManager.create_interactive_scene()
    assert len(scene.spheres) == 9
    names = [s.name for s in scene.spheres]
    assert names[0] == "Ground" and "Main Light" in names
    assert scene.background_color.z == 0.1
    light = scene.spheres[6]
    assert light.material.emission.x == 10


def test_progressive_render_to_completion(rti):
    rti.start_rendering()
    frames = drain(rti)
    assert frames and frames[-1].get("done")
    # noise_target defaults OFF: runs to max_samples, never "converged"
    assert frames[-1].get("converged") is False
    rt_frames = [f for f in frames if "display" in f]
    assert rt_frames, "no raytracing frames produced"
    last = rt_frames[-1]
    assert last["samples"] == 4
    assert last["mode"] == "raytracing"
    img = last["display"]
    assert img.shape == (36, 48, 3)
    assert img.dtype == np.uint8  # quantized on device (render/display.py)
    assert img.max() > 12  # scene is lit (uint8 scale)
    assert last["enhanced"].shape == img.shape


def test_noise_target_auto_stops_converged_render():
    """Beyond-reference progressive auto-stop: with a loose noise target
    the worker stops as soon as two consecutive batches stop changing the
    accumulated image, well before max_samples; production serving stops
    paying for invisible samples."""
    r = RayTracerInteraction(48, 36)
    r.settings["max_samples"] = 1024
    r.settings["samples_per_batch"] = 2
    r.settings["max_depth"] = 2
    r.settings["noise_target"] = 0.5  # any scene converges immediately
    try:
        r.start_rendering()
        frames = drain(r, timeout=60.0)
    finally:
        r.stop_rendering()
    assert frames and frames[-1].get("done")
    assert frames[-1]["converged"] is True
    rt = [f for f in frames if "display" in f]
    # stopped after the 2-batch convergence streak, far below max_samples
    assert rt and rt[-1]["samples"] <= 8, rt[-1]["samples"]


def test_camera_keys_switch_to_wireframe_and_back(rti):
    rti.start_rendering()
    rti.set_camera_key_state("forward", True)
    assert rti.render_state.current_mode == RenderMode.WIREFRAME
    # drain while the key is held: restart_rendering() on release swaps the
    # frame queue, discarding preview frames (reference behavior,
    # interaction.py:1194)
    time.sleep(0.2)
    frames = drain(rti, want_done=False, timeout=2)
    modes = {f.get("mode") for f in frames if "mode" in f}
    assert "wireframe" in modes
    rti.set_camera_key_state("forward", False)
    assert rti.render_state.current_mode == RenderMode.RAYTRACING


def test_camera_movement_moves_position(rti):
    z0 = rti.camera.position.z
    rti.set_camera_key_state("forward", True)
    time.sleep(0.3)
    rti.set_camera_key_state("forward", False)
    assert rti.camera.position.z < z0  # moved toward target


def test_camera_rotation_flow(rti):
    t0 = rti.camera.target
    before = (t0.x, t0.y, t0.z)
    rti.start_camera_rotation(0.5, 0.5)
    rti.update_camera_rotation(30.0 / 640, 0.0)
    rti.stop_camera_rotation()
    t1 = rti.camera.target
    assert (t1.x, t1.y, t1.z) != before
    assert rti.render_state.current_mode == RenderMode.RAYTRACING


def test_selection_and_drag(rti):
    # Red Metallic sphere at (-2, .5, -3): project into screen space to click.
    # From camera (0,2,5) it sits left of center, slightly below.
    found = False
    for x in np.linspace(0.1, 0.45, 12):
        for y in np.linspace(0.4, 0.7, 8):
            if rti.select_object_by_click(float(x), float(y)):
                found = True
                break
        if found:
            break
    assert found, "no object selectable by scanning screen"
    sel = rti.get_selected_object()
    assert sel is not None and sel.object_id > 0

    start = rti.start_object_dragging(float(x), float(y))
    assert start
    assert rti.render_state.current_mode == RenderMode.SILHOUETTE
    cx = sel.center.x
    rti.update_object_dragging(0.1, 0.0)
    assert sel.center.x != cx
    rti.stop_object_dragging()
    assert rti.render_state.current_mode == RenderMode.RAYTRACING


def test_dimension_locks(rti):
    rti.settings["selected_object"] = 1
    rti.object_dragger.selected_object_id = 1
    obj = rti.get_selected_object()
    rti.object_dragger.dragging = True
    rti.object_dragger.drag_start_object_pos = Vector3(
        obj.center.x, obj.center.y, obj.center.z)
    rti.set_dimension_lock("x", True)
    x0, y0 = obj.center.x, obj.center.y
    rti.object_dragger.update_drag(0.3, 0.3)
    assert obj.center.x == x0  # locked
    assert obj.center.y != y0
    rti.object_dragger.stop_drag()
    assert not rti.object_dragger.lock_x  # locks clear on stop


def test_object_crud(rti):
    n0 = rti.get_object_count()
    new_id = rti.add_object_to_scene()
    assert rti.get_object_count() == n0 + 1
    assert rti.settings["selected_object"] == new_id
    assert rti.remove_object_from_scene(new_id)
    assert rti.get_object_count() == n0
    assert not rti.remove_object_from_scene(12345)


def test_material_edits(rti):
    rti.settings["selected_object"] = 1
    obj = rti.get_selected_object()
    rti.set_object_color(0.1, 0.2, 0.3, apply_immediate=False)
    assert abs(obj.material.albedo.y - 0.2) < 1e-9
    rti.set_object_color_hsv(0, 1, 1, apply_immediate=False)  # pure red
    assert obj.material.albedo.x == 1.0 and obj.material.albedo.y == 0.0
    rti.update_object_material("roughness", 0.7)
    assert obj.material.roughness == 0.7
    # light intensity scaling preserves ratios
    rti.settings["selected_object"] = 6  # Main Light (10,10,8)
    rti.update_light_intensity(5.0)
    e = rti.get_selected_object().material.emission
    assert abs(e.x - 5.0) < 1e-6 and abs(e.z - 4.0) < 1e-6


def test_procedural_texture(rti):
    rti.settings["selected_object"] = 2
    obj = rti.get_selected_object()
    before = (obj.material.albedo.x, obj.material.albedo.y)
    assert rti.set_object_texture("noise", {"scale": 2.0, "octaves": 3})
    after = (obj.material.albedo.x, obj.material.albedo.y)
    assert after != before
    assert rti.set_object_texture("none", {})
    assert not rti.set_object_texture("marble", {})
    # determinism of the noise function itself
    c1 = procedural_noise_color(Vector3(1, 2, 3), 1.5, 3)
    c2 = procedural_noise_color(Vector3(1, 2, 3), 1.5, 3)
    assert c1 == c2


def test_resize_viewport(rti):
    assert rti.resize_viewport(32, 24)
    rti.start_rendering()
    frames = drain(rti)
    rt = [f for f in frames if "display" in f]
    assert rt and rt[-1]["display"].shape == (24, 32, 3)


def test_denoised_frames(rti):
    rti.settings["show_denoisers"] = True
    rti.settings["selected_denoisers"] = ["gaussian", "median"]
    rti.start_rendering()
    frames = drain(rti)
    rt = [f for f in frames if f.get("denoised")]
    assert rt, "no denoised frames"
    d = rt[-1]["denoised"]
    assert set(d) == {"gaussian", "median"}
    # default denoiser_grid_scale=2: grid tiles come back at half size
    # (the GUI's 2x2 comparison grid shows them no larger — render/
    # display.py quad packing); grid_scale=1 restores full-res rows
    assert d["gaussian"].shape == (18, 24, 3)


def test_previews_draw_content(rti):
    sil = rti.renderer.render_silhouette(1)
    wf = rti.renderer.render_wireframe(1)
    assert sil.sum() > 0 and wf.sum() > 0
    # wireframe includes the grid (gray pixels), silhouette does not
    assert (wf.sum() > sil.sum())
    # selection markers present (crosshair cyan; at tiny resolutions the
    # yellow circle may be fully overdrawn by the crosshair, like cv2)
    cyan = (sil[..., 1] > 0.9) & (sil[..., 2] > 0.9) & (sil[..., 0] < 0.1)
    assert cyan.any()
    # at a realistic resolution the yellow selected circle survives
    from tpu_rt.app.preview import PreviewRenderer

    big = PreviewRenderer(320, 240, rti.camera, rti.scene)
    sil_big = big.render_silhouette(1)
    yellow = ((sil_big[..., 0] > 0.9) & (sil_big[..., 1] > 0.9)
              & (sil_big[..., 2] < 0.1))
    assert yellow.any()


def test_frame_rate_limiter():
    lim = FrameRateLimiter(1000)
    assert lim.should_update()
    lim.update()
    lim2 = FrameRateLimiter(0.5)
    lim2.update()
    assert not lim2.should_update()


def test_reset_camera(rti):
    rti.camera.position = Vector3(5, 5, 5)
    rti.reset_camera_and_rerender()
    assert rti.camera.position.z == 5 and rti.camera.position.y == 2


def test_session_save_load(rti, tmp_path):
    rti.start_rendering()
    frames = drain(rti)
    assert rti.total_samples == 4
    # raise the target before saving so the restored session has headroom
    rti.settings["max_samples"] = 8
    path = str(tmp_path / "sess.npz")
    rti.save_session(path)

    # fresh runtime, restore: accumulator and settings resume
    r2 = RayTracerInteraction(48, 36)
    try:
        r2.load_session(path)
        assert r2.settings["max_samples"] == 8
        # progressive render continues beyond the restored sample count
        frames = drain(r2)
        assert r2.total_samples == 8
    finally:
        r2.stop_rendering()


def test_frame_stats_tracked(rti):
    rti.start_rendering()
    drain(rti)
    assert rti.frame_stats.times, "no frame timings recorded"
    assert rti.frame_stats.mrays_per_s > 0


def test_linear_accumulation_mode():
    """linear_accumulation=True averages radiance pre-gamma; the final image
    stays in range and converges to the same scene (different, correct,
    blending weights)."""
    r = RayTracerInteraction(48, 36, linear_accumulation=True)
    try:
        r.settings.update(max_samples=4, samples_per_batch=2, max_depth=2)
        r.start_rendering()
        frames = drain(r)
        rt = [f for f in frames if "display" in f]
        assert rt
        img = rt[-1]["display"]
        assert img.dtype == np.uint8  # display frames are uint8 RGB
        assert img.max() > 12
        # accumulator itself is linear (unbounded emissives allowed)
        assert r.accumulated_image is not None
    finally:
        r.stop_rendering()


def test_mesh_attach_render_and_session_roundtrip(rti, tmp_path):
    """Attach a triangle mesh, render headlessly, round-trip it through a
    saved session."""
    from tpu_rt.ops.triangle import box

    n = 12
    rti.set_mesh(box(center=(0, 1, -3), size=(1.5, 1.5, 1.5),
                     albedo=(0.9, 0.2, 0.1)))
    assert rti.ray_tracer._mesh is not None
    rti.start_rendering()
    frames = drain(rti)
    assert frames and frames[-1].get("done")
    img = next(f["display"] for f in frames if "display" in f)
    assert np.isfinite(img).all()

    p = str(tmp_path / "mesh_session.npz")
    rti.save_session(p)

    r2 = RayTracerInteraction(48, 36)
    try:
        r2.load_session(p)
        assert r2.mesh is not None
        assert int(np.asarray(r2.mesh.valid).sum()) == n
        assert r2.ray_tracer._mesh is not None
        frames2 = drain(r2)
        assert frames2
    finally:
        r2.stop_rendering()

    # clearing the mesh goes back to spheres-only
    rti.set_mesh(None)
    assert rti.ray_tracer._mesh is None


def test_load_mesh_from_obj(rti, tmp_path):
    from tpu_rt.ops.triangle import box
    from tpu_rt.utils.objio import save_obj

    p = str(tmp_path / "b.obj")
    save_obj(p, box(center=(0, 1, -3), size=(1, 1, 1)))
    count = rti.load_mesh_from_obj(p, default_albedo=(0.2, 0.8, 0.3))
    assert count == 12
    assert rti.mesh is not None


def test_headless_cli_with_obj_and_dof(tmp_path):
    """The launcher's headless mode end-to-end with an OBJ mesh and
    depth-of-field flags."""
    from tpu_rt.app import run as app_run
    from tpu_rt.ops.triangle import box
    from tpu_rt.utils.objio import save_obj

    obj = str(tmp_path / "b.obj")
    save_obj(obj, box(center=(0, 1, -3), size=(1, 1, 1)))
    out = str(tmp_path / "r.png")
    rc = app_run.main([
        "--headless", "--width", "48", "--height", "36",
        "--samples", "4", "--batch", "2", "--depth", "2",
        "--obj", obj, "--aperture", "0.2", "--focus-dist", "5.0",
        "--output", out, "--timeout", "240",
    ])
    assert rc == 0
    import os

    assert os.path.exists(out) or os.path.exists(out + ".npy")


def test_nee_setting_flows_to_renderer(rti):
    """The beyond-reference `nee` knob (utils/config.py) must reach the
    estimator: the worker syncs it per batch. On the CPU test backend the
    engine resolves to lax naturally (NEE no longer forces a downgrade —
    it is fused into all three engines; on TPU the batch would stay on
    its resolved Pallas engine)."""
    rti.settings["nee"] = True
    rti.start_rendering()
    frames = drain(rti, timeout=120.0)
    assert frames and frames[-1].get("done")
    assert rti.ray_tracer._nee is True
    assert rti.ray_tracer._last_engine == "lax"
    rt_frames = [f for f in frames if "display" in f]
    assert rt_frames and np.isfinite(rt_frames[-1]["display"]).all()
