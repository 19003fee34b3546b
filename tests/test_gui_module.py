"""GUI module smoke tests (PyQt5 absent in this image: verify gating)."""

import pytest


def test_gui_module_imports_without_qt():
    from tpu_rt.app import gui

    if gui.HAVE_QT:
        pytest.skip("PyQt5 present; gating path not exercised")
    with pytest.raises(ImportError, match="PyQt5"):
        gui.GUI()


def test_launcher_reports_missing_qt(capsys):
    from tpu_rt.app import run as app_run
    from tpu_rt.app.gui import HAVE_QT

    if HAVE_QT:
        pytest.skip("PyQt5 present")
    rc = app_run.main([])  # GUI mode requested, Qt missing
    assert rc == 1
    out = capsys.readouterr().out
    assert "PyQt5" in out and "--headless" in out
