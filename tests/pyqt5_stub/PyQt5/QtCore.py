"""QtCore subset: Qt namespace, signals, QThread, QTimer."""

from __future__ import annotations

import threading
import time


class _Qt:
    AlignCenter = 0x0084
    Horizontal = 0x1
    Vertical = 0x2
    KeepAspectRatio = 1
    SmoothTransformation = 1
    LeftButton = 1
    RightButton = 2
    # Qt key codes (values match real Qt; gui.py maps them to names)
    Key_Escape = 0x01000000
    Key_Space = 0x20
    Key_Control = 0x01000021
    Key_A = 0x41
    Key_D = 0x44
    Key_I = 0x49
    Key_J = 0x4A
    Key_K = 0x4B
    Key_L = 0x4C
    Key_O = 0x4F
    Key_S = 0x53
    Key_U = 0x55
    Key_W = 0x57
    Key_X = 0x58
    Key_Y = 0x59
    Key_Z = 0x5A


Qt = _Qt()


class _BoundSignal:
    """Synchronous observer list — Qt DirectConnection semantics."""

    def __init__(self, name: str, types):
        self._name = name
        self._types = types
        self._slots = []

    def connect(self, slot):
        if not callable(slot):
            raise TypeError(f"connect({self._name}): slot is not callable")
        self._slots.append(slot)

    def disconnect(self, slot=None):
        if slot is None:
            self._slots.clear()
        else:
            self._slots.remove(slot)

    def emit(self, *args):
        if len(args) != len(self._types):
            raise TypeError(
                f"{self._name}.emit: expected {len(self._types)} args "
                f"({self._types}), got {len(args)}")
        for slot in list(self._slots):
            slot(*args)


class pyqtSignal:
    """Class-level descriptor; binds one _BoundSignal per instance, like
    real pyqtSignal."""

    _count = 0

    def __init__(self, *types):
        self._types = types
        pyqtSignal._count += 1
        self._attr = f"_pyqtsignal_{pyqtSignal._count}"
        self._name = "signal"

    def __set_name__(self, owner, name):
        self._name = f"{owner.__name__}.{name}"

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        bound = getattr(obj, self._attr, None)
        if bound is None:
            bound = _BoundSignal(self._name, self._types)
            setattr(obj, self._attr, bound)
        return bound


class QObject:
    def __init__(self, parent=None):
        self._parent = parent


class QThread(QObject):
    """Runs ``run()`` on a real Python thread (daemon, like Qt threads die
    with the app)."""

    def __init__(self, parent=None):
        super().__init__(parent)
        self._thread = None

    def start(self):
        self._thread = threading.Thread(target=self.run, daemon=True)
        self._thread.start()

    def run(self):  # overridden by subclasses
        pass

    def isRunning(self):
        return self._thread is not None and self._thread.is_alive()

    def wait(self, ms=None):
        if self._thread is not None:
            self._thread.join(None if ms is None else ms / 1000.0)
            return not self._thread.is_alive()
        return True

    @staticmethod
    def msleep(ms):
        time.sleep(ms / 1000.0)


class QTimer(QObject):
    """Deterministic timer: no event loop here, so tests fire ticks with
    ``fire()`` (or all pending timers via QTimer.fire_all()). start/stop
    and singleShot bookkeeping match Qt."""

    _live = []

    timeout = pyqtSignal()

    def __init__(self, parent=None):
        super().__init__(parent)
        self._single = False
        self._active = False
        self._interval = 0
        QTimer._live.append(self)

    def setSingleShot(self, single):
        self._single = bool(single)

    def isSingleShot(self):
        return self._single

    def start(self, interval=None):
        if interval is not None:
            self._interval = int(interval)
        self._active = True

    def stop(self):
        self._active = False

    def isActive(self):
        return self._active

    def interval(self):
        return self._interval

    def fire(self):
        """Test hook: one elapsed interval."""
        if not self._active:
            return
        if self._single:
            self._active = False
        self.timeout.emit()

    @classmethod
    def fire_all(cls):
        for t in list(cls._live):
            t.fire()
