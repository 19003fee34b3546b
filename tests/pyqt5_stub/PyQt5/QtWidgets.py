"""QtWidgets subset with faithful signal-emission semantics.

Key behavioral contracts reproduced from real Qt (gui.py depends on them):
  * ``setValue``/``setChecked``/``setCurrentIndex`` emit their change signal
    only when the value changes — this is what makes the ``_updating``
    re-entrancy guards in ControlPanel meaningful;
  * spin boxes and sliders clamp to their range before comparing/emitting;
  * inserting the same widget into two layouts raises (Qt warns and
    reparents; here it is an error so tests catch layout mistakes);
  * ``QWidget.close()`` routes through ``closeEvent`` with an acceptable
    event, like the real shutdown path.
"""

from __future__ import annotations

from .QtCore import QObject, Qt, pyqtSignal
from .QtGui import QColor


class QSize:
    def __init__(self, w, h):
        self._w, self._h = int(w), int(h)

    def width(self):
        return self._w

    def height(self):
        return self._h


class QWidget(QObject):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._layout = None
        self._in_layout = None
        self._visible = False
        self._w, self._h = 640, 480
        self._min_w = self._min_h = 0
        self._stylesheet = ""
        self._window_title = ""
        self._mouse_tracking = False

    # geometry / visibility
    def resize(self, w, h):
        self._w, self._h = int(w), int(h)

    def setMinimumSize(self, w, h):
        self._min_w, self._min_h = int(w), int(h)

    def size(self):
        return QSize(self._w, self._h)

    def width(self):
        return self._w

    def height(self):
        return self._h

    def show(self):
        self._visible = True

    def isVisible(self):
        return self._visible

    def close(self):
        ev = _CloseEvent()
        self.closeEvent(ev)
        if ev._accepted:
            self._visible = False
        return ev._accepted

    # hooks subclasses override
    def closeEvent(self, event):
        event.accept()

    def keyPressEvent(self, event):
        pass

    def keyReleaseEvent(self, event):
        pass

    def focusOutEvent(self, event):
        pass

    def mousePressEvent(self, event):
        pass

    def mouseMoveEvent(self, event):
        pass

    def mouseReleaseEvent(self, event):
        pass

    # layout / style
    def setLayout(self, layout):
        if self._layout is not None:
            raise RuntimeError("widget already has a layout")
        self._layout = layout
        layout._host = self

    def layout(self):
        return self._layout

    def setStyleSheet(self, text):
        if not isinstance(text, str):
            raise TypeError("stylesheet must be a string")
        # cheap structural sanity: balanced braces
        if text.count("{") != text.count("}"):
            raise ValueError("unbalanced braces in stylesheet")
        self._stylesheet = text

    def setWindowTitle(self, title):
        self._window_title = str(title)

    def windowTitle(self):
        return self._window_title

    def setMouseTracking(self, on):
        self._mouse_tracking = bool(on)

    def setAlignment(self, _flags):
        pass


class _CloseEvent:
    def __init__(self):
        self._accepted = False

    def accept(self):
        self._accepted = True

    def ignore(self):
        self._accepted = False


class _Layout:
    """Common layout bookkeeping: ordered items, double-insert detection."""

    def __init__(self, parent: QWidget | None = None):
        self._items = []  # (kind, obj, meta)
        self._host = None
        if parent is not None:
            parent.setLayout(self)

    def addWidget(self, w, *args, stretch=0, **kwargs):
        if not isinstance(w, QWidget):
            raise TypeError(f"addWidget: {w!r} is not a QWidget")
        if w._in_layout is not None:
            raise RuntimeError(
                f"widget {w!r} inserted into two layouts")
        w._in_layout = self
        self._items.append(("widget", w, args))

    def addLayout(self, lay, *args, stretch=0):
        if not isinstance(lay, _Layout):
            raise TypeError(f"addLayout: {lay!r} is not a layout")
        self._items.append(("layout", lay, args))

    def addStretch(self, stretch=0):
        self._items.append(("stretch", stretch, ()))

    def count(self):
        return len(self._items)

    def widgets(self):
        """Test hook: flattened widget list in insertion order."""
        out = []
        for kind, obj, _ in self._items:
            if kind == "widget":
                out.append(obj)
            elif kind == "layout":
                out.extend(obj.widgets())
        return out


class QVBoxLayout(_Layout):
    pass


class QHBoxLayout(_Layout):
    pass


class QGridLayout(_Layout):
    def addWidget(self, w, row=0, col=0, *args):
        super().addWidget(w, row, col, *args)


class QLabel(QWidget):
    def __init__(self, text="", parent=None):
        super().__init__(parent)
        self._text = str(text)
        self._pixmap = None

    def setText(self, text):
        self._text = str(text)

    def text(self):
        return self._text

    def setPixmap(self, pm):
        self._pixmap = pm

    def pixmap(self):
        return self._pixmap


class QAbstractButton(QWidget):
    clicked = pyqtSignal(bool)
    toggled = pyqtSignal(bool)

    def __init__(self, text="", parent=None):
        super().__init__(parent)
        self._text = str(text)
        self._checkable = False
        self._checked = False

    def text(self):
        return self._text

    def setCheckable(self, on):
        self._checkable = bool(on)

    def setChecked(self, on):
        on = bool(on)
        if not self._checkable:
            # real Qt silently ignores setChecked on non-checkable buttons
            # for the checked state but QCheckBox is always checkable
            return
        if on != self._checked:
            self._checked = on
            self.toggled.emit(on)

    def isChecked(self):
        return self._checked

    def click(self):
        """Full Qt click semantics: toggle first (emitting toggled), then
        emit clicked(checked)."""
        if self._checkable:
            self.setChecked(not self._checked)
        self.clicked.emit(self._checked)


class QPushButton(QAbstractButton):
    pass


class QCheckBox(QAbstractButton):
    def __init__(self, text="", parent=None):
        super().__init__(text, parent)
        self._checkable = True


class _SpinBase(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._lo, self._hi = 0, 99
        self._value = 0
        self._step = 1

    def setRange(self, lo, hi):
        self._lo, self._hi = lo, hi
        self._assign(self._value)

    def setSingleStep(self, step):
        self._step = step

    def minimum(self):
        return self._lo

    def maximum(self):
        return self._hi

    def value(self):
        return self._value

    def _assign(self, v):
        v = self._coerce(min(max(v, self._lo), self._hi))
        if v != self._value:
            self._value = v
            self.valueChanged.emit(v)

    def setValue(self, v):
        self._assign(v)


class QSpinBox(_SpinBase):
    valueChanged = pyqtSignal(int)

    def _coerce(self, v):
        return int(round(v))


class QDoubleSpinBox(_SpinBase):
    valueChanged = pyqtSignal(float)

    def _coerce(self, v):
        return float(v)


class QSlider(_SpinBase):
    valueChanged = pyqtSignal(int)

    def __init__(self, orientation=Qt.Horizontal, parent=None):
        super().__init__(parent)
        self._orientation = orientation

    def _coerce(self, v):
        return int(round(v))


class QComboBox(QWidget):
    currentIndexChanged = pyqtSignal(int)

    def __init__(self, parent=None):
        super().__init__(parent)
        self._items = []  # (text, data)
        self._index = -1

    def addItem(self, text, data=None):
        self._items.append((str(text), data))
        if self._index == -1:
            self._set_index(0)

    def addItems(self, texts):
        for t in texts:
            self.addItem(t)

    def clear(self):
        had = bool(self._items)
        self._items = []
        if had:
            self._set_index(-1)

    def count(self):
        return len(self._items)

    def _set_index(self, i):
        if i != self._index:
            self._index = i
            self.currentIndexChanged.emit(i)

    def setCurrentIndex(self, i):
        if -1 <= i < len(self._items):
            self._set_index(i)

    def currentIndex(self):
        return self._index

    def currentText(self):
        return self._items[self._index][0] if self._index >= 0 else ""

    def itemData(self, i):
        return self._items[i][1] if 0 <= i < len(self._items) else None


class QTabWidget(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._tabs = []  # (widget, label)
        self._current = -1

    def addTab(self, widget, label):
        self._tabs.append((widget, str(label)))
        if self._current == -1:
            self._current = 0
        return len(self._tabs) - 1

    def count(self):
        return len(self._tabs)

    def tabText(self, i):
        return self._tabs[i][1]

    def widget(self, i):
        return self._tabs[i][0]

    def setCurrentIndex(self, i):
        if 0 <= i < len(self._tabs):
            self._current = i

    def currentIndex(self):
        return self._current


class QScrollArea(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._widget = None
        self._resizable = False

    def setWidget(self, w):
        self._widget = w

    def widget(self):
        return self._widget

    def setWidgetResizable(self, on):
        self._resizable = bool(on)


class QGroupBox(QWidget):
    def __init__(self, title="", parent=None):
        super().__init__(parent)
        self._title = str(title)

    def title(self):
        return self._title


class QProgressBar(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._value = 0
        self._lo, self._hi = 0, 100

    def setRange(self, lo, hi):
        self._lo, self._hi = lo, hi

    def setValue(self, v):
        self._value = int(v)

    def value(self):
        return self._value


class QStatusBar(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._widgets = []
        self._permanent = []
        self._message = ""

    def addWidget(self, w, stretch=0):
        self._widgets.append(w)

    def addPermanentWidget(self, w, stretch=0):
        self._permanent.append(w)

    def showMessage(self, msg, timeout=0):
        self._message = str(msg)

    def currentMessage(self):
        return self._message


class QMainWindow(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self._central = None
        self._statusbar = None

    def setCentralWidget(self, w):
        self._central = w

    def centralWidget(self):
        return self._central

    def statusBar(self):
        if self._statusbar is None:
            self._statusbar = QStatusBar()
        return self._statusbar


class QColorDialog:
    """Static dialog. Tests monkeypatch ``_next_color`` to script a pick;
    the default is a cancelled dialog (invalid color), like dismissing it."""

    _next_color = None

    @staticmethod
    def getColor(initial=None, parent=None):
        c = QColorDialog._next_color
        QColorDialog._next_color = None
        return c if c is not None else QColor.invalid()


class QFileDialog:
    """Static dialog; monkeypatch ``_next_path`` to script a selection."""

    _next_path = ""

    @staticmethod
    def getOpenFileName(parent=None, caption="", directory="", filter=""):
        p = QFileDialog._next_path
        QFileDialog._next_path = ""
        return (p, filter)


class QApplication(QObject):
    _instance = None

    def __init__(self, argv=None):
        super().__init__()
        QApplication._instance = self

    @staticmethod
    def instance():
        return QApplication._instance

    def exec_(self):
        """No event loop in the stub: timers/threads are driven explicitly
        by tests. Returns immediately."""
        return 0

    def processEvents(self):
        pass
