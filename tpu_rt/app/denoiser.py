"""Denoiser bank with the reference's class API (denoiser.py:4-44).

Same four methods and default parameters; filtering runs on-device through
tpu_rt.ops.post instead of host OpenCV. ``backend='cv2'`` switches to OpenCV
(when installed) for bit-parity comparisons.
"""

from __future__ import annotations

import numpy as np

from ..ops import post


class Denoiser:
    """Denoising algorithms (reference: denoiser.py:4-44)."""

    def __init__(self, backend: str = "jax"):
        # "joint" (feature-guided bilateral over render AOVs) extends the
        # reference's four color-only methods; it needs aovs= and has no
        # cv2 counterpart.
        self.available_methods = ["bilateral", "nlmeans", "gaussian",
                                  "median", "joint"]
        self.backend = backend

    def denoise(self, image: np.ndarray, method: str = "bilateral",
                aovs=None, **kwargs) -> np.ndarray:
        if method == "joint":
            if aovs is None:
                raise ValueError(
                    "method='joint' needs aovs= (tpu_rt.render.aov."
                    "render_aovs output)")
            out = post.joint_bilateral(
                image, aovs["normal"], aovs["depth"],
                d=kwargs.get("d", 9),
                sigma_color=kwargs.get("sigma_color", 75),
                sigma_space=kwargs.get("sigma_space", 75),
                sigma_normal=kwargs.get("sigma_normal", 0.25),
                sigma_depth=kwargs.get("sigma_depth", 0.08),
            )
            return np.asarray(out, np.float32)
        if self.backend == "cv2":
            return self._denoise_cv2(image, method, **kwargs)
        if method == "bilateral":
            out = post.bilateral_filter(
                image, d=kwargs.get("d", 9),
                sigma_color=kwargs.get("sigma_color", 75),
                sigma_space=kwargs.get("sigma_space", 75),
            )
        elif method == "nlmeans":
            out = post.nlmeans(
                image, h=kwargs.get("h", 10),
                template_window_size=kwargs.get("template_window_size", 7),
                search_window_size=kwargs.get("search_window_size", 21),
            )
        elif method == "gaussian":
            out = post.gaussian_blur(
                image, ksize=kwargs.get("kernel_size", 5),
                sigma=kwargs.get("sigma", 1.0),
            )
        elif method == "median":
            out = post.median_blur(image, ksize=kwargs.get("kernel_size", 5))
        else:
            raise ValueError(f"Unknown denoising method: {method}")
        return np.asarray(out, np.float32)

    def _denoise_cv2(self, image, method, **kwargs):
        import cv2

        u8 = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        if method == "bilateral":
            out = cv2.bilateralFilter(u8, kwargs.get("d", 9),
                                      kwargs.get("sigma_color", 75),
                                      kwargs.get("sigma_space", 75))
        elif method == "nlmeans":
            out = cv2.fastNlMeansDenoisingColored(
                u8, None, kwargs.get("h", 10), kwargs.get("h", 10),
                kwargs.get("template_window_size", 7),
                kwargs.get("search_window_size", 21))
        elif method == "gaussian":
            k = kwargs.get("kernel_size", 5)
            out = cv2.GaussianBlur(u8, (k, k), kwargs.get("sigma", 1.0))
        elif method == "median":
            out = cv2.medianBlur(u8, kwargs.get("kernel_size", 5))
        else:
            raise ValueError(f"Unknown denoising method: {method}")
        return out.astype(np.float32) / 255.0
