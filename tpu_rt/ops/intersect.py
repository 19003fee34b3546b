"""Ray-sphere intersection, vectorized for the MXU.

Replaces the reference's scalar quadratic hit test
(Sphere::intersect, cpp_raytracer/raytracer_core.h:192-215) and the
brute-force scene loop (SceneIntersector fallback,
cpp_raytracer/raytracer_core.cpp:252-270). Instead of iterating spheres per
ray, the (R rays x N spheres) quadratic decomposes into two (R,3)x(3,N)
matmuls — the dot products d.c and o.c — which XLA tiles onto the MXU, plus
VPU elementwise work. A masked argmin replaces the sequential
closest-so-far update; the result is identical (see tests/test_intersect.py
for the oracle equivalence proof).

This module is simultaneously the production intersector for bucket-sized
scenes and the permanent test oracle the BVH traversal is validated against,
the role the reference's brute-force fallback plays (SURVEY.md §4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.types import SphereScene, T_MIN, T_MAX


class Hit(NamedTuple):
    """SoA hit records for a batch of rays (HitRecord equivalent,
    old/raytracer_core copy.h:121-136, flattened to arrays)."""

    hit: jnp.ndarray        # (R,)   bool
    t: jnp.ndarray          # (R,)   f32 (T_MAX where miss)
    normal: jnp.ndarray     # (R, 3) f32 outward normal
    sphere_index: jnp.ndarray  # (R,) i32 index into scene arrays (0 on miss)


def sphere_ts(
    scene: SphereScene,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min: float = T_MIN,
    t_max: float = T_MAX,
) -> jnp.ndarray:
    """Nearest valid hit parameter per (ray, sphere), T_MAX where none.

    origins/directions: (R, 3). Returns (R, N) f32.

    Quadratic per pair (raytracer_core.h:194-207):
      oc = o - c;  a = d.d;  half_b = oc.d;  cq = oc.oc - r^2
      disc = half_b^2 - a*cq;  roots = (-half_b -/+ sqrt(disc)) / a
    decomposed so the cross terms ride the MXU:
      half_b = (o.d) - D @ C^T
      cq     = |o|^2 - 2 (O @ C^T) + |c|^2 - r^2
    """
    # Precision.HIGHEST forces true-f32 accumulation: the MXU's default
    # bf16 passes introduce O(0.1) error in the dot products, enough to flip
    # hit/miss on near-tangential rays. The K=3 contraction is tiny, so the
    # f32 path costs nothing.
    ct = scene.center.T  # (3, N)
    d_dot_c = jnp.dot(
        directions, ct, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    o_dot_c = jnp.dot(
        origins, ct, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    a = jnp.sum(directions * directions, axis=-1, keepdims=True)      # (R, 1)
    o_dot_d = jnp.sum(origins * directions, axis=-1, keepdims=True)   # (R, 1)
    o_sq = jnp.sum(origins * origins, axis=-1, keepdims=True)         # (R, 1)
    c_sq = jnp.sum(scene.center * scene.center, axis=-1)              # (N,)
    r_sq = scene.radius * scene.radius                                # (N,)

    half_b = o_dot_d - d_dot_c                                        # (R, N)
    cq = o_sq - 2.0 * o_dot_c + (c_sq - r_sq)[None, :]                # (R, N)

    disc = half_b * half_b - a * cq
    feasible = disc >= 0.0
    sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / a
    root0 = (-half_b - sqrtd) * inv_a
    root1 = (-half_b + sqrtd) * inv_a

    in0 = (root0 >= t_min) & (root0 <= t_max)
    in1 = (root1 >= t_min) & (root1 <= t_max)
    root = jnp.where(in0, root0, root1)
    ok = feasible & (in0 | in1) & scene.valid[None, :]
    return jnp.where(ok, root, T_MAX)


def _refine_t(
    center, radius, origins, directions, t_min, t_max, coarse_t
):
    """Re-solve the winning sphere's quadratic in the well-conditioned
    ``oc = o - c`` form (the formulation the reference uses,
    raytracer_core.h:194-207). The MXU sweep's expanded form
    ``|o|^2 - 2 o.c + |c|^2`` cancels catastrophically for grazing rays;
    this per-ray fixup restores full f32 accuracy at O(R) cost."""
    oc = origins - center
    a = jnp.sum(directions * directions, axis=-1)
    half_b = jnp.sum(oc * directions, axis=-1)
    cq = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = half_b * half_b - a * cq
    sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
    root0 = (-half_b - sqrtd) / a
    root1 = (-half_b + sqrtd) / a
    in0 = (root0 >= t_min) & (root0 <= t_max)
    in1 = (root1 >= t_min) & (root1 <= t_max)
    root = jnp.where(in0, root0, root1)
    ok = (disc >= 0.0) & (in0 | in1)
    return jnp.where(ok, root, coarse_t)


def intersect_brute(
    scene: SphereScene,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min: float = T_MIN,
    t_max: float = T_MAX,
) -> Hit:
    """Closest hit over all spheres via masked argmin (R, N) -> (R,)."""
    ts = sphere_ts(scene, origins, directions, t_min, t_max)  # (R, N)
    idx = jnp.argmin(ts, axis=-1).astype(jnp.int32)           # (R,)
    t = jnp.take_along_axis(ts, idx[:, None], axis=-1)[:, 0]
    hit = t < T_MAX

    center = scene.center[idx]                                 # (R, 3)
    radius = scene.radius[idx]
    t = _refine_t(center, radius, origins, directions, t_min, t_max, t)
    inv_r = jnp.where(radius > 0.0, 1.0 / radius, 0.0)
    point = origins + directions * t[:, None]
    normal = (point - center) * inv_r[:, None]                 # (R, 3)
    return Hit(hit=hit, t=jnp.where(hit, t, T_MAX), normal=normal,
               sphere_index=idx)


def closest_object_id(
    scene: SphereScene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    t_min: float = T_MIN,
    t_max: float = 1000.0,
    skip_object_id: int | None = None,
) -> jnp.ndarray:
    """Object id of the nearest sphere along one ray, -1 on miss.

    Equivalent of Scene::cast_ray_for_selection (old/raytracer_core
    copy.cpp:133-146); ``skip_object_id`` reproduces the Python selection
    path's ground-skip (interaction.py:845-861).
    """
    ts = sphere_ts(scene, origin[None, :], direction[None, :], t_min, t_max)
    ts = ts[0]
    if skip_object_id is not None:
        ts = jnp.where(scene.object_id == skip_object_id, T_MAX, ts)
    idx = jnp.argmin(ts)
    return jnp.where(ts[idx] < T_MAX, scene.object_id[idx], -1)
