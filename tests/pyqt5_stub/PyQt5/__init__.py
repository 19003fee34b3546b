"""Headless PyQt5 test double.

PyQt5 is uninstallable in this image (no network egress — the
``pip install PyQt5`` attempt is recorded in docs/GUI_EXECUTION.md), so this
package implements the exact Qt subset ``tpu_rt/app/gui.py`` uses, with
faithful *behavioral* semantics where the GUI wiring depends on them:

  * signals are synchronous observer lists (Qt DirectConnection);
  * ``setValue`` / ``setChecked`` / ``setCurrentIndex`` emit their change
    signals only when the value actually changes (the reference GUI's
    ``_updating`` re-entrancy guards exist precisely because real Qt does
    this — executing them is the point);
  * spin boxes clamp to their range like real Qt;
  * ``QImage`` validates the (bytes, width, height, stride, format)
    contract — a wrong-stride buffer raises instead of shearing pixels;
  * ``QThread`` runs ``run()`` on a real Python thread.

This makes ``from PyQt5.QtWidgets import ...`` succeed so the REAL
``gui.py`` module executes top to bottom in tests (tests/test_gui_qt.py):
window construction, six tabs, signal/slot hookup, frame fan-out, mode
buttons, key routing — the layer VERDICT r2 flagged as never executed.

It is intentionally NOT a renderer: nothing paints; geometry is tracked as
plain numbers. Layout classes only record parent/child relationships (and
reject double-insertion, the common Qt layout bug).
"""
