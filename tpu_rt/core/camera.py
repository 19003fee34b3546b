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


def generate_rays(cam: CameraP, u: jnp.ndarray, v: jnp.ndarray,
                  lens_xi: jnp.ndarray | None = None):
    """Rays through screen coords ``u, v`` in [0, 1] (any broadcastable shape).

    Returns (origins, directions), both shaped ``u.shape + (3,)``, directions
    normalized. Math of Camera::get_ray (old/raytracer_core copy.h:160-184):
    ndc = (u-.5)*2 / (.5-v)*2, view = ndc * [aspect *] tan_fov.

    ``lens_xi``: optional ``u.shape + (2,)`` uniforms enabling thin-lens
    depth of field (beyond-reference): origins jitter on a disk of radius
    ``cam.aperture`` in the lens plane and directions re-aim at the ray's
    point on the focal plane (perpendicular to forward at ``focus_dist``;
    <= 0 focuses at the look-at target).
    """
    forward, right, up = basis(cam)
    tf = tan_half_fov(cam)

    ndc_x = (u - 0.5) * 2.0
    ndc_y = (0.5 - v) * 2.0
    view_x = (ndc_x * cam.aspect * tf)[..., None]
    view_y = (ndc_y * tf)[..., None]

    direction = vm.normalize(forward + right * view_x + up * view_y)
    origin = jnp.broadcast_to(cam.position, direction.shape)
    if lens_xi is None:
        return origin, direction

    focus = jnp.where(cam.focus_dist > 0.0, cam.focus_dist,
                      vm.length(cam.target - cam.position))
    # point on the focal plane along the pinhole ray
    cos_f = jnp.sum(direction * forward, axis=-1, keepdims=True)
    focal_pt = origin + direction * (focus / jnp.maximum(cos_f, 1e-6))
    # uniform disk sample of the lens
    r = cam.aperture * jnp.sqrt(lens_xi[..., 0])
    phi = (2.0 * jnp.pi) * lens_xi[..., 1]
    lx = (r * jnp.cos(phi))[..., None]
    ly = (r * jnp.sin(phi))[..., None]
    origin = origin + right * lx + up * ly
    return origin, vm.normalize(focal_pt - origin)


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
