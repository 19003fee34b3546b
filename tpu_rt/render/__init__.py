from .frame import accumulate, enhance_contrast, render, tone_map  # noqa: F401
