"""Vector math over batched (..., 3) arrays.

TPU-native replacement for the reference's scalar ``Vector3`` struct
(cpp_raytracer/raytracer_core.h:64-105) and ``FastMath`` helpers
(cpp_raytracer/raytracer_core.h:282-333). Everything here is shape-polymorphic:
a "Vector3" is any array whose trailing axis has length 3, so the same code
paths run per-ray, per-pixel, or per-sphere batches on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Epsilon used when guarding normalization of (near-)zero vectors.
_EPS = 1e-20


def dot(a: jnp.ndarray, b: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """Batched dot product over the trailing axis (raytracer_core.h:79)."""
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched cross product (raytracer_core.h:80-84)."""
    return jnp.cross(a, b)


def length_squared(a: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    return jnp.sum(a * a, axis=-1, keepdims=keepdims)


def length(a: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    return jnp.sqrt(length_squared(a, keepdims=keepdims))


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    """Safe normalize.

    Matches the v2 core's convention that a zero-length vector normalizes to
    +Z (raytracer_core.h:88-91) instead of producing NaNs, which keeps the
    whole pipeline NaN-free under jit.
    """
    sq = length_squared(a, keepdims=True)
    safe_sq = jnp.where(sq > _EPS, sq, 1.0)
    out = a * jax.lax.rsqrt(safe_sq)
    fallback = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=out.dtype), out.shape
    )
    return jnp.where(sq > _EPS, out, fallback)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection about normal ``n`` (FastMath::reflect,
    raytracer_core.h:293-295)."""
    return v - n * (2.0 * dot(v, n, keepdims=True))


def refract(v: jnp.ndarray, n: jnp.ndarray, ni_over_nt: jnp.ndarray):
    """Snell refraction (FastMath::refract, raytracer_core.h:297-306).

    Returns ``(can_refract, refracted)`` where ``refracted`` is only
    meaningful where ``can_refract`` is True. The reference declares this but
    never calls it (dead code, SURVEY.md §2.4); we wire it into the
    dielectric branch of the integrator.
    """
    uv = normalize(v)
    dt = dot(uv, n, keepdims=True)
    ni = jnp.asarray(ni_over_nt)
    if ni.ndim < dt.ndim:
        ni = ni[..., None]
    disc = 1.0 - ni * ni * (1.0 - dt * dt)
    can = disc > 0.0
    refracted = (uv - n * dt) * ni - n * jnp.sqrt(jnp.maximum(disc, 0.0))
    return can[..., 0], refracted


def schlick(cosine: jnp.ndarray, ref_idx: jnp.ndarray) -> jnp.ndarray:
    """Schlick Fresnel approximation (FastMath::schlick,
    raytracer_core.h:308-312)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5
