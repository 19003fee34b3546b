"""On-device post-processing: the denoiser bank.

TPU-native re-implementation of the reference's OpenCV denoiser bank
(denoiser.py:4-44): bilateral / NL-means / gaussian / median, fused on-device
over the accumulation buffer (BASELINE.json north star) instead of
round-tripping to the host for cv2.

Fidelity contract: the reference quantizes the tone-mapped [0,1] float image
to uint8, filters, and converts back (denoiser.py:12). We reproduce that
roundtrip (including the quantization!) so outputs are comparable, but run
the filters as vectorized JAX ops:

  * gaussian — separable k-tap convolution, reflect-101 border
    (cv2.GaussianBlur(5, sigma=1), denoiser.py:37-40)
  * median   — k*k shifted-stack + sort, replicate border
    (cv2.medianBlur(5), denoiser.py:42-44)
  * bilateral — circular-window joint range/space kernel, cv2 semantics:
    range distance = L1 over channels, weights shared across channels
    (cv2.bilateralFilter(9, 75, 75), denoiser.py:25-28)
  * nlmeans  — patchwise NL-means over a search window; same parameter names
    as cv2.fastNlMeansDenoisingColored(10, 7, 21) (denoiser.py:30-35) but the
    classic RGB formulation rather than cv2's Lab-space variant.

All filters process every pixel in parallel as (offsets, H, W, C) stacks —
the offset loop is a static Python loop over <=441 shifts that XLA fuses
into lane-parallel VPU work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _to_u8f(image: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float -> quantized uint8 values held in f32.

    Truncation, not rounding: the reference converts with
    ``(clip(image,0,1)*255).astype(np.uint8)`` (denoiser.py:12), which
    truncates — matched so medians/sorts agree bit-for-bit with cv2."""
    return jnp.floor(jnp.clip(image, 0.0, 1.0) * 255.0)


def _from_u8f(u8: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(u8, 0.0, 255.0) / 255.0


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel: exp(-(i-c)^2 / (2 sigma^2)), normalized.
    sigma <= 0 follows cv2's default sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    c = (ksize - 1) / 2
    xs = np.arange(ksize, dtype=np.float64)
    k = np.exp(-((xs - c) ** 2) / (2 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(image: jnp.ndarray, ksize: int = 5, sigma: float = 1.0):
    """Separable gaussian with reflect-101 border (cv2.GaussianBlur)."""
    k = jnp.asarray(_gaussian_kernel1d(ksize, float(sigma)))
    r = ksize // 2
    u8 = _to_u8f(image)
    x = jnp.pad(u8, ((r, r), (0, 0), (0, 0)), mode="reflect")
    x = sum(k[i] * x[i:i + u8.shape[0]] for i in range(ksize))
    x = jnp.pad(x, ((0, 0), (r, r), (0, 0)), mode="reflect")
    x = sum(k[i] * x[:, i:i + u8.shape[1]] for i in range(ksize))
    return _from_u8f(jnp.round(x))


@partial(jax.jit, static_argnames=("ksize",))
def median_blur(image: jnp.ndarray, ksize: int = 5):
    """k x k median with replicate border (cv2.medianBlur)."""
    r = ksize // 2
    u8 = _to_u8f(image)
    h, w, _ = u8.shape
    x = jnp.pad(u8, ((r, r), (r, r), (0, 0)), mode="edge")
    stack = jnp.stack(
        [x[i:i + h, j:j + w] for i in range(ksize) for j in range(ksize)],
        axis=-1,
    )  # (h, w, 3, k*k)
    med = jnp.sort(stack, axis=-1)[..., (ksize * ksize) // 2]
    return _from_u8f(med)


@partial(jax.jit, static_argnames=("d",))
def bilateral_filter(image: jnp.ndarray, d: int = 9,
                     sigma_color: float = 75.0, sigma_space: float = 75.0):
    """Joint range/space filter, cv2.bilateralFilter semantics.

    Circular window of radius d//2; range weight from the L1 color distance
    on uint8 values; one weight shared by all channels; reflect-101 border.
    """
    radius = d // 2
    color_coeff = -0.5 / (sigma_color * sigma_color)
    space_coeff = -0.5 / (sigma_space * sigma_space)

    u8 = _to_u8f(image)
    h, w, _ = u8.shape
    x = jnp.pad(u8, ((radius, radius), (radius, radius), (0, 0)),
                mode="reflect")

    num = jnp.zeros_like(u8)
    den = jnp.zeros(u8.shape[:2], u8.dtype)
    for i in range(-radius, radius + 1):
        for j in range(-radius, radius + 1):
            rr = i * i + j * j
            if rr > radius * radius:
                continue  # circular window, like cv2
            shifted = x[radius + i:radius + i + h, radius + j:radius + j + w]
            l1 = jnp.sum(jnp.abs(shifted - u8), axis=-1)
            wgt = jnp.exp(rr * space_coeff + (l1 * l1) * color_coeff)
            num = num + shifted * wgt[..., None]
            den = den + wgt
    return _from_u8f(num / den[..., None])


@partial(jax.jit, static_argnames=("d",))
def joint_bilateral(
    image: jnp.ndarray,
    normal: jnp.ndarray,
    depth: jnp.ndarray,
    d: int = 9,
    sigma_color: float = 75.0,
    sigma_space: float = 75.0,
    sigma_normal: float = 0.25,
    sigma_depth: float = 0.08,
):
    """Feature-guided (joint) bilateral filter over the render AOVs.

    Beyond the reference's color-only bank: weights combine the classic
    space x color-range terms (cv2 semantics, like bilateral_filter) with
    first-hit GEOMETRY similarity — normal agreement ``(1 - n.n')`` and
    relative depth difference — so noise smooths within a surface while
    silhouette and crease edges stay crisp even when color noise swamps
    the range term. This is the guided pre-pass modern denoisers (SVGF,
    OIDN) build on. ``normal``: (h, w, 3) unit vectors (zeros on miss);
    ``depth``: (h, w) hit distance (any finite value on miss).
    """
    radius = d // 2
    color_coeff = -0.5 / (sigma_color * sigma_color)
    space_coeff = -0.5 / (sigma_space * sigma_space)
    normal_coeff = -0.5 / (sigma_normal * sigma_normal)
    depth_coeff = -0.5 / (sigma_depth * sigma_depth)

    u8 = _to_u8f(image)
    h, w, _ = u8.shape
    pad2 = ((radius, radius), (radius, radius))
    x = jnp.pad(u8, pad2 + ((0, 0),), mode="reflect")
    nrm = jnp.pad(normal.astype(jnp.float32), pad2 + ((0, 0),),
                  mode="reflect")
    dep = jnp.pad(depth.astype(jnp.float32), pad2, mode="reflect")
    dep_c = dep[radius:radius + h, radius:radius + w]
    nrm_c = nrm[radius:radius + h, radius:radius + w]

    num = jnp.zeros_like(u8)
    den = jnp.zeros(u8.shape[:2], u8.dtype)
    for i in range(-radius, radius + 1):
        for j in range(-radius, radius + 1):
            rr = i * i + j * j
            if rr > radius * radius:
                continue
            sl_y = slice(radius + i, radius + i + h)
            sl_x = slice(radius + j, radius + j + w)
            shifted = x[sl_y, sl_x]
            l1 = jnp.sum(jnp.abs(shifted - u8), axis=-1)
            ndot = jnp.sum(nrm[sl_y, sl_x] * nrm_c, axis=-1)
            nterm = jnp.square(1.0 - jnp.clip(ndot, -1.0, 1.0))
            zrel = (dep[sl_y, sl_x] - dep_c) / (jnp.abs(dep_c) + 1e-3)
            wgt = jnp.exp(rr * space_coeff + (l1 * l1) * color_coeff
                          + nterm * normal_coeff
                          + jnp.square(zrel) * depth_coeff)
            num = num + shifted * wgt[..., None]
            den = den + wgt
    return _from_u8f(num / den[..., None])


@partial(jax.jit, static_argnames=("template_window_size", "search_window_size"))
def nlmeans(image: jnp.ndarray, h: float = 10.0,
            template_window_size: int = 7, search_window_size: int = 21):
    """Non-local means on RGB.

    For each search offset: squared-difference image, box-filtered over the
    template window (= patch SSD at every pixel simultaneously), mapped to a
    weight exp(-max(ssd/n - 2sigma^2, 0) / h^2). Offsets stream through a
    static loop; everything stays lane-parallel.
    """
    t_r = template_window_size // 2
    s_r = search_window_size // 2
    npix = template_window_size * template_window_size * 3

    u8 = _to_u8f(image)
    hh, ww, _ = u8.shape
    pad = s_r + t_r
    x = jnp.pad(u8, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")

    def box(img2d):
        """Centered template-window box sum via integral image.

        With pad (r+1, r), ``cs[y+k] - cs[y]`` covers padded rows
        y+1 .. y+k = original rows y-r .. y+r — centered at y.
        """
        r = t_r
        k = template_window_size
        p = jnp.pad(img2d, ((r + 1, r), (r + 1, r)), mode="edge")
        cs = jnp.cumsum(jnp.cumsum(p, axis=0), axis=1)
        return cs[k:, k:] - cs[:-k, k:] - cs[k:, :-k] + cs[:-k, :-k]

    center = x[pad:pad + hh, pad:pad + ww]
    num = jnp.zeros_like(u8)
    den = jnp.zeros((hh, ww), u8.dtype)
    inv_h2 = 1.0 / (h * h)
    for i in range(-s_r, s_r + 1):
        for j in range(-s_r, s_r + 1):
            shifted = x[pad + i:pad + i + hh, pad + j:pad + j + ww]
            sq = jnp.sum((shifted - center) ** 2, axis=-1)
            ssd = box(sq) / npix
            wgt = jnp.exp(-jnp.maximum(ssd, 0.0) * inv_h2)
            num = num + shifted * wgt[..., None]
            den = den + wgt
    return _from_u8f(num / den[..., None])
