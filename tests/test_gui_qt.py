"""EXECUTE the Qt GUI layer (VERDICT r2 missing #1).

PyQt5 is uninstallable here (no network egress; attempt recorded in
docs/GUI_EXECUTION.md), so these tests run the REAL ``tpu_rt/app/gui.py`` —
unmodified — against the behavioral PyQt5 double in tests/pyqt5_stub/:
window construction, all six control tabs, signal/slot hookup, the
RenderThread -> _on_frame display fan-out with a real frame from the real
render worker, mode buttons, material debounce timer, camera sync timer,
scripted color/file dialogs, key routing, and the close/shutdown path.

What the stub can and cannot catch is documented in
tests/pyqt5_stub/PyQt5/__init__.py; signal/slot miswiring, bad layout
nesting (double insertion), QImage stride bugs, and re-entrancy-guard
regressions all surface here.
"""

import os
import sys
import time

import numpy as np
import pytest

STUB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pyqt5_stub")

_PURGE_PREFIXES = ("PyQt5", "tpu_rt.app.gui")


def _real_qt_available() -> bool:
    if not os.environ.get("TPU_RT_REAL_QT"):
        return False
    try:
        import PyQt5  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.fixture(scope="module")
def gui_mod():
    """Import the real gui.py against the stub (or real PyQt5 when
    TPU_RT_REAL_QT=1 and it is installed), restoring modules after."""
    use_stub = not _real_qt_available()
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k.split(".")[0] == "PyQt5" or k == "tpu_rt.app.gui"}
    if use_stub:
        sys.path.insert(0, STUB)
    try:
        import tpu_rt.app.gui as gui

        assert gui.HAVE_QT, "stub import failed; gui fell back to headless"
        yield gui
    finally:
        if use_stub:
            sys.path.remove(STUB)
        for k in list(sys.modules):
            if k.split(".")[0] == "PyQt5" or k == "tpu_rt.app.gui":
                del sys.modules[k]
        sys.modules.update(saved)


@pytest.fixture()
def gui(gui_mod):
    g = gui_mod.GUI(64, 48)
    yield g
    g.close()


class _KeyEvent:
    def __init__(self, key, auto=False):
        self._key = key
        self._auto = auto

    def key(self):
        return self._key

    def isAutoRepeat(self):
        return self._auto


class _Pos:
    def __init__(self, x, y):
        self._x, self._y = x, y

    def x(self):
        return self._x

    def y(self):
        return self._y


class _MouseEvent:
    def __init__(self, x, y, button=1):
        self._pos = _Pos(x, y)
        self._button = button

    def pos(self):
        return self._pos

    def button(self):
        return self._button


def test_window_constructs_with_full_widget_tree(gui, gui_mod):
    # six control tabs, in reference order (ref gui.py:149-162)
    titles = [gui.control_panel.tabText(i)
              for i in range(gui.control_panel.count())]
    assert titles == ["Render", "Scene", "Camera", "Object", "Material",
                      "Denoiser"]
    # three display tabs (ref gui.py:1446-1499)
    dtitles = [gui.display_tabs.tabText(i)
               for i in range(gui.display_tabs.count())]
    assert dtitles == ["Main", "Enhanced", "Denoisers"]
    # three mode buttons, raytracing checked (ref gui.py:1416-1444)
    RM = gui_mod.RenderMode
    assert gui.mode_buttons[RM.RAYTRACING].isChecked()
    assert not gui.mode_buttons[RM.WIREFRAME].isChecked()
    # stylesheet applied and structurally sane
    assert "QMainWindow" in gui._stylesheet
    # status bar wired
    assert gui.statusBar()._widgets == [gui.status_label]
    assert gui.statusBar()._permanent == [gui.progress]
    # render thread is live
    assert gui.render_thread.isRunning()


def test_real_frame_flows_through_render_thread_to_displays(gui):
    """The actual pipeline: render worker -> frame queue -> RenderThread
    (real Python thread) -> frame_ready signal -> _on_frame -> QImage on
    every display. Waits for the real first frame (64x48, CPU backend)."""
    deadline = time.time() + 300.0
    while gui.main_display.pixmap() is None and time.time() < deadline:
        time.sleep(0.1)
    pm = gui.main_display.pixmap()
    assert pm is not None, "no frame reached the main display"
    img = pm.image()
    assert (img.width(), img.height()) == (64, 48)
    # enhanced display got its fan-out too
    assert gui.enhanced_display.pixmap() is not None
    # status text/progress updated by the same slot
    assert "Samples" in gui.status_label.text()
    assert gui.progress.value() > 0
    # stride contract held (QImage validated it; spot-check a pixel)
    r, g, b = img.pixel_rgb(32, 24)
    assert all(0 <= c <= 255 for c in (r, g, b))


def test_mode_buttons_drive_fsm_and_check_states(gui, gui_mod):
    RM = gui_mod.RenderMode
    gui.mode_buttons[RM.WIREFRAME].click()
    assert gui.raytracer.render_state.current_mode == RM.WIREFRAME
    assert gui.mode_buttons[RM.WIREFRAME].isChecked()
    assert not gui.mode_buttons[RM.RAYTRACING].isChecked()
    gui.mode_buttons[RM.SILHOUETTE].click()
    assert gui.raytracer.render_state.current_mode == RM.SILHOUETTE
    gui.mode_buttons[RM.RAYTRACING].click()
    assert gui.raytracer.render_state.current_mode == RM.RAYTRACING
    assert gui.mode_buttons[RM.RAYTRACING].isChecked()


def test_render_tab_spins_write_settings(gui):
    panel = gui.control_panel
    # the first tab's first spin is Max Samples (built in order)
    st = gui.raytracer.settings
    before = st["max_samples"]
    tab0 = panel.widget(0).widget()  # scroll area -> tab widget
    spins = [w for w in tab0.layout().widgets()
             if w.__class__.__name__ in ("QSpinBox", "QDoubleSpinBox")]
    spins[0].setValue(before + 32)
    assert st["max_samples"] == before + 32
    # depth spin
    spins[2].setValue(7)
    assert st["max_depth"] == 7


def test_material_sliders_debounce_then_commit(gui):
    panel = gui.control_panel
    rt = gui.raytracer
    obj = rt.get_selected_object()
    assert obj is not None
    panel.rgb_sliders["r"].setValue(10)
    # slider write landed on the object immediately...
    assert abs(obj.material.albedo.x - 0.10) < 1e-6
    # ...but the commit is debounced behind the 1 s timer (ref gui.py:130-133)
    assert panel._material_timer.isActive()
    assert panel._material_timer.interval() == 1000
    panel._material_timer.fire()
    assert not panel._material_timer.isActive()


def test_updating_guard_blocks_reentrant_material_writes(gui):
    """update_material_sliders writes slider values; real Qt emits
    valueChanged for each write — the _updating guard must stop those
    emissions from re-triggering the debounce."""
    panel = gui.control_panel
    panel._material_timer.stop()
    panel.update_material_sliders()
    assert not panel._material_timer.isActive()


def test_camera_sync_timer_reads_back_camera(gui):
    gui.raytracer.camera.position.x = 3.25
    gui.cam_timer.fire()
    assert gui.control_panel.cam_spins[("position", "x")].value() == \
        pytest.approx(3.25)


def test_camera_spin_writes_camera_and_restarts(gui):
    box = gui.control_panel.cam_spins[("position", "y")]
    box.setValue(4.5)
    assert gui.raytracer.camera.position.y == pytest.approx(4.5)


def test_scripted_color_dialog_applies_albedo(gui, gui_mod):
    from PyQt5.QtGui import QColor
    from PyQt5.QtWidgets import QColorDialog

    QColorDialog._next_color = QColor(255, 0, 0)
    gui.control_panel._pick_color()
    obj = gui.raytracer.get_selected_object()
    assert obj.material.albedo.x == pytest.approx(1.0, abs=2e-2)
    assert obj.material.albedo.y == pytest.approx(0.0, abs=2e-2)


def test_scripted_file_dialog_loads_obj(gui, tmp_path):
    from PyQt5.QtWidgets import QFileDialog

    obj_path = tmp_path / "tri.obj"
    obj_path.write_text(
        "v 0 0 -3\nv 1 0 -3\nv 0 1 -3\nf 1 2 3\n")
    QFileDialog._next_path = str(obj_path)
    gui.control_panel._load_obj_mesh()
    assert "Loaded 1 triangles" in gui.statusBar().currentMessage()


def test_key_routing_press_release(gui, gui_mod):
    from PyQt5.QtCore import Qt

    gui.keyPressEvent(_KeyEvent(Qt.Key_W))
    assert gui.raytracer.camera_controller.keys_pressed["forward"]
    # auto-repeat events are ignored (ref gui.py:1729-1741)
    gui.keyReleaseEvent(_KeyEvent(Qt.Key_W, auto=True))
    assert gui.raytracer.camera_controller.keys_pressed["forward"]
    gui.keyReleaseEvent(_KeyEvent(Qt.Key_W))
    assert not gui.raytracer.camera_controller.keys_pressed["forward"]
    # focus loss clears key state (ref gui.py:1810-1820)
    gui.keyPressEvent(_KeyEvent(Qt.Key_A))
    gui.focusOutEvent(None)
    assert not any(gui.raytracer.camera_controller.keys_pressed.values())


def test_mouse_events_route_through_display_signals(gui):
    """ImageDisplay normalizes pixel coords against the scaled pixmap and
    emits; GUI routes into the headless MouseRouter."""
    disp = gui.main_display
    # give the display a pixmap so _norm has geometry to work with
    disp.set_image(np.full((48, 64, 3), 0.5, np.float32))
    seen = []
    disp.mouse_pressed.connect(lambda x, y, b: seen.append((x, y, b)))
    disp.mousePressEvent(_MouseEvent(10, 10))
    assert seen, "mousePressEvent did not emit mouse_pressed"
    x, y, _ = seen[0]
    assert 0.0 <= x <= 1.0 and 0.0 <= y <= 1.0
    disp.mouseReleaseEvent(_MouseEvent(10, 10))


def test_image_display_rejects_wrong_stride(gui_mod):
    """The QImage stride contract the stub enforces: a buffer smaller than
    stride*height raises instead of shearing — set_image's 3*w stride math
    is exercised by every frame test above; this proves the check bites."""
    from PyQt5.QtGui import QImage

    buf = np.zeros((10, 10, 3), np.uint8)
    with pytest.raises(ValueError):
        QImage(buf.data, 20, 10, 60, QImage.Format_RGB888)


def test_denoiser_tab_toggles_methods(gui):
    panel = gui.control_panel
    st = gui.raytracer.settings
    assert "bilateral" in st["selected_denoisers"]
    panel.denoiser_boxes["bilateral"].setChecked(False)
    assert "bilateral" not in st["selected_denoisers"]
    panel.denoiser_boxes["gaussian"].setChecked(True)
    assert "gaussian" in st["selected_denoisers"]


def test_object_combo_selects_and_updates_info(gui):
    panel = gui.control_panel
    combo = panel.object_select
    assert combo.count() > 1
    panel._select_object(1)
    # selecting via index routes through PL.select_object
    oid = combo.itemData(1)
    if oid is not None:
        assert gui.raytracer.settings["selected_object"] == oid
    assert panel.object_info.text()


def test_close_event_stops_threads(gui_mod):
    g = gui_mod.GUI(64, 48)
    assert g.render_thread.isRunning()
    assert g.close()
    deadline = time.time() + 5
    while g.render_thread.isRunning() and time.time() < deadline:
        time.sleep(0.05)
    assert not g.render_thread.isRunning()
    assert not g.raytracer.render_state.is_rendering
