"""QtGui subset: QImage (with strict buffer/stride validation), QPixmap,
QColor."""

from __future__ import annotations


class QImage:
    Format_RGB888 = 13

    def __init__(self, data, width, height, bytes_per_line, fmt):
        if fmt != QImage.Format_RGB888:
            raise ValueError(f"unsupported format {fmt}")
        if bytes_per_line < 3 * width:
            raise ValueError(
                f"stride {bytes_per_line} < 3*width {3 * width}")
        need = bytes_per_line * height
        view = memoryview(data)
        if not view.contiguous:
            raise ValueError("QImage buffer must be contiguous")
        if view.nbytes < need:
            raise ValueError(
                f"QImage buffer too small: {view.nbytes} < {need} "
                f"(w={width} h={height} stride={bytes_per_line}) — "
                "stride bug")
        self._w = int(width)
        self._h = int(height)
        self._stride = int(bytes_per_line)
        self._data = view

    def width(self):
        return self._w

    def height(self):
        return self._h

    def bytesPerLine(self):
        return self._stride

    def pixel_rgb(self, x, y):
        """Test hook: (r, g, b) at pixel — proves the stride math."""
        off = y * self._stride + 3 * x
        b = self._data.tobytes()
        return (b[off], b[off + 1], b[off + 2])


class QPixmap:
    def __init__(self, w=0, h=0, image=None):
        self._w = int(w)
        self._h = int(h)
        self._image = image

    @staticmethod
    def fromImage(img: QImage) -> "QPixmap":
        return QPixmap(img.width(), img.height(), img)

    def scaled(self, size, aspect_mode=0, transform_mode=0):
        """KeepAspectRatio scaling into ``size`` (QSize-like)."""
        tw, th = size.width(), size.height()
        if self._w == 0 or self._h == 0 or tw == 0 or th == 0:
            return QPixmap(0, 0, self._image)
        scale = min(tw / self._w, th / self._h)
        return QPixmap(max(1, round(self._w * scale)),
                       max(1, round(self._h * scale)), self._image)

    def width(self):
        return self._w

    def height(self):
        return self._h

    def image(self):
        """Test hook: the backing QImage."""
        return self._image


class QColor:
    def __init__(self, r=0, g=0, b=0):
        for v in (r, g, b):
            if not 0 <= int(v) <= 255:
                raise ValueError(f"QColor component out of range: {v}")
        self._r, self._g, self._b = int(r), int(g), int(b)
        self._valid = True

    @staticmethod
    def invalid():
        c = QColor()
        c._valid = False
        return c

    def isValid(self):
        return self._valid

    def red(self):
        return self._r

    def green(self):
        return self._g

    def blue(self):
        return self._b

    def redF(self):
        return self._r / 255.0

    def greenF(self):
        return self._g / 255.0

    def blueF(self):
        return self._b / 255.0
