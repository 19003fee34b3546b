"""Batched camera ray generation, v1 semantics.

The behavioral contract is the v1 ``Camera`` the GUI drives
(old/raytracer_core copy.h:150-202): position/target/up pose, NDC mapping
``(u - 0.5) * 2`` with Y flip, ``tan(fov * 3.14159 / 360)``, and a
degenerate-right fallback to +X. Basis vectors are recomputed from
position/target on every call — pure function of the CameraP pytree, so
camera motion never invalidates compiled code.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import vecmath as vm
from .types import CameraP

# The reference uses a truncated pi in both cores
# (old/raytracer_core copy.h:165, cpp_raytracer/raytracer_core.h:263).
# Kept bit-compatible for RMSE parity with the C++ render.
REF_PI = 3.14159


def basis(cam: CameraP):
    """Forward/right/up orthonormal basis (old/raytracer_core copy.h:167-173).

    right falls back to +X when forward is parallel to world-up
    (old/raytracer_core copy.h:170-172).
    """
    forward = vm.normalize(cam.target - cam.position)
    world_up = jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32)
    right_raw = vm.cross(forward, world_up)
    degenerate = vm.length_squared(right_raw) < 1e-6
    right = jnp.where(
        degenerate, jnp.array([1.0, 0.0, 0.0], jnp.float32), vm.normalize(right_raw)
    )
    up = vm.normalize(vm.cross(right, forward))
    return forward, right, up


def tan_half_fov(cam: CameraP) -> jnp.ndarray:
    return jnp.tan(cam.fov * (REF_PI / 360.0))


def generate_rays(cam: CameraP, u: jnp.ndarray, v: jnp.ndarray):
    """Rays through screen coords ``u, v`` in [0, 1] (any broadcastable shape).

    Returns (origins, directions), both shaped ``u.shape + (3,)``, directions
    normalized. Math of Camera::get_ray (old/raytracer_core copy.h:160-184):
    ndc = (u-.5)*2 / (.5-v)*2, view = ndc * [aspect *] tan_fov.
    """
    forward, right, up = basis(cam)
    tf = tan_half_fov(cam)

    ndc_x = (u - 0.5) * 2.0
    ndc_y = (0.5 - v) * 2.0
    view_x = (ndc_x * cam.aspect * tf)[..., None]
    view_y = (ndc_y * tf)[..., None]

    direction = vm.normalize(forward + right * view_x + up * view_y)
    origin = jnp.broadcast_to(cam.position, direction.shape)
    return origin, direction


def pixel_uv(width: int, height: int, jitter: jnp.ndarray | None = None):
    """Screen-space (u, v) for every pixel, shape (height, width).

    ``u = (i + xi) / width``, ``v = (j + xi) / height`` exactly as the
    reference render loops (old/raytracer_core copy.cpp:287-289;
    cpp_raytracer/raytracer_core.cpp:390-392). ``jitter`` is an optional
    (height, width, 2) array in [0, 1); None means pixel centers (0.5), the
    deterministic mode used for golden-image parity tests.
    """
    jj, ii = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    if jitter is None:
        xu = xv = 0.5
    else:
        xu = jitter[..., 0]
        xv = jitter[..., 1]
    u = (ii + xu) / width
    v = (jj + xv) / height
    return u, v
