"""Deterministic, counter-based sampling for the path tracer.

Replaces the reference's per-thread PCG32 streams
(cpp_raytracer/raytracer_core.h:11-44, per-thread seeding at
raytracer_core.cpp:377-378) with JAX's stateless threefry keys: every
(frame, bounce, purpose) tuple folds into its own key, giving bit-exact
reproducibility independent of device count or sharding — the property the
reference's thread-count-dependent seeding never had.

Samplers are *distribution-exact* (not procedure-exact) equivalents of the
reference's rejection loops: ``unit_ball`` draws uniformly in the unit ball
analytically (gaussian direction x cbrt-radius) instead of rejection sampling
(FastMath::random_in_unit_sphere, raytracer_core.h:314-322), because
data-dependent rejection loops don't vectorize on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import vecmath as vm


def unit_ball(key: jax.Array, shape: tuple[int, ...]) -> jnp.ndarray:
    """Uniform samples in the unit ball, shape ``shape + (3,)``.

    direction ~ isotropic (normalized gaussian), radius = u^(1/3): the exact
    uniform-in-ball distribution the reference's rejection loop converges to.
    """
    kg, ku = jax.random.split(key)
    g = jax.random.normal(kg, shape + (3,), dtype=jnp.float32)
    d = vm.normalize(g)
    u = jax.random.uniform(ku, shape + (1,), dtype=jnp.float32)
    r = jnp.cbrt(u)
    return d * r


def hemisphere(key: jax.Array, normal: jnp.ndarray) -> jnp.ndarray:
    """Uniform-in-ball sample flipped onto the side of ``normal``.

    Matches FastMath::random_in_hemisphere (raytracer_core.h:324-332): draw in
    the unit ball, negate if it points away from the normal.
    """
    p = unit_ball(key, normal.shape[:-1])
    side = vm.dot(p, normal, keepdims=True) > 0.0
    return jnp.where(side, p, -p)


def uniform(key: jax.Array, shape: tuple[int, ...]) -> jnp.ndarray:
    """U[0, 1) float32 samples (PCG32::random_float equivalent)."""
    return jax.random.uniform(key, shape, dtype=jnp.float32)
