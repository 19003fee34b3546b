"""Ray-sphere intersection, vectorized for the MXU — gather-free.

Replaces the reference's scalar quadratic hit test
(Sphere::intersect, cpp_raytracer/raytracer_core.h:192-215) and the
brute-force scene loop (SceneIntersector fallback,
cpp_raytracer/raytracer_core.cpp:252-270). Two TPU-native design decisions:

1. **Quadratic as matmuls.** The (R rays x N spheres) quadratic decomposes
   into two (R,3)x(3,N) dot products (d.c and o.c) that ride the MXU, plus
   VPU elementwise work; a masked min replaces the sequential
   closest-so-far update (identical result — tests/test_intersect.py).

2. **One-hot matmul instead of gathers.** ``take_along_axis``/``x[idx]``
   lower to TPU gathers that measure ~50x slower than the whole quadratic
   sweep. Instead, the winner's attributes are fetched with a single
   (R,N)@(N,A) matmul of the first-hit one-hot mask against a packed
   attribute matrix — every material/geometry field of the hit sphere in one
   MXU pass, no gather anywhere on the hot path.

Numerical note: the expanded form |o|^2 - 2 o.c + |c|^2 cancels
catastrophically for grazing rays, so the winner's t is re-solved per-ray in
the reference's well-conditioned oc-form (raytracer_core.h:194-207).

This module is simultaneously the production intersector for bucket-sized
scenes and the permanent oracle the BVH traversal is validated against — the
role the reference's brute-force fallback plays (SURVEY.md §4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.types import SphereScene, T_MIN, T_MAX

HIGHEST = jax.lax.Precision.HIGHEST


class Hit(NamedTuple):
    """SoA hit records for a batch of rays, with the winning sphere's
    attributes pre-fetched (HitRecord equivalent, old/raytracer_core
    copy.h:121-136, flattened to arrays)."""

    hit: jnp.ndarray        # (R,)   bool
    t: jnp.ndarray          # (R,)   f32 (T_MAX where miss)
    normal: jnp.ndarray     # (R, 3) f32 outward normal
    albedo: jnp.ndarray     # (R, 3) f32
    metallic: jnp.ndarray   # (R,)   f32
    roughness: jnp.ndarray  # (R,)   f32
    emission: jnp.ndarray   # (R, 3) f32
    ior: jnp.ndarray        # (R,)   f32
    object_id: jnp.ndarray  # (R,)   f32 (exact for ids < 2^24; -1 on miss)


def attribute_matrix(scene: SphereScene) -> jnp.ndarray:
    """Packed (N, 16) per-sphere attribute matrix for the one-hot fetch.

    Columns: center xyz, radius, albedo rgb, metallic, roughness,
    emission rgb, ior, object_id, inv_radius, pad.
    """
    inv_r = jnp.where(scene.radius > 0.0, 1.0 / scene.radius, 0.0)
    return jnp.concatenate(
        [
            scene.center,                                   # 0:3
            scene.radius[:, None],                          # 3
            scene.albedo,                                   # 4:7
            scene.metallic[:, None],                        # 7
            scene.roughness[:, None],                       # 8
            scene.emission,                                 # 9:12
            scene.ior[:, None],                             # 12
            scene.object_id.astype(jnp.float32)[:, None],   # 13
            inv_r[:, None],                                 # 14
            jnp.zeros_like(inv_r)[:, None],                 # 15 pad
        ],
        axis=-1,
    )


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

    Precision.HIGHEST forces true-f32 accumulation: the MXU's default bf16
    passes introduce O(0.1) error, enough to flip hit/miss near tangents.
    """
    ct = scene.center.T  # (3, N)
    d_dot_c = jnp.dot(directions, ct, preferred_element_type=jnp.float32,
                      precision=HIGHEST)
    o_dot_c = jnp.dot(origins, ct, preferred_element_type=jnp.float32,
                      precision=HIGHEST)

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


def _first_hit_onehot(ts: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, N) f32 one-hot of the first sphere achieving the min t.

    Ties (coincident surfaces) resolve to the lowest index via a cumulative
    mask — matching the reference's first-found-wins scan order. Miss rows
    (t == T_MAX) come out all-zero.
    """
    at_min = (ts <= t[:, None]) & (t[:, None] < T_MAX)
    first = jnp.cumsum(at_min.astype(jnp.int32), axis=-1) == 1
    return (at_min & first).astype(jnp.float32)


def _refine_t(center, inv_radius, radius, origins, directions,
              t_min, t_max, coarse_t):
    """Re-solve the winning sphere's quadratic in the stable oc-form
    (see module docstring)."""
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
    attr: jnp.ndarray | None = None,
) -> Hit:
    """Closest hit over all spheres: masked min + one-hot attribute matmul.

    ``attr`` is the precomputed attribute_matrix(scene); pass it when calling
    in a loop to keep it out of the traced constant pool.
    """
    if attr is None:
        attr = attribute_matrix(scene)
    ts = sphere_ts(scene, origins, directions, t_min, t_max)  # (R, N)
    t = jnp.min(ts, axis=-1)                                   # (R,)
    hit = t < T_MAX

    sel = _first_hit_onehot(ts, t)                             # (R, N)
    fetched = jnp.dot(sel, attr, preferred_element_type=jnp.float32,
                      precision=HIGHEST)                       # (R, 16)

    center = fetched[:, 0:3]
    radius = fetched[:, 3]
    inv_r = fetched[:, 14]
    t = _refine_t(center, inv_r, radius, origins, directions, t_min, t_max, t)
    point = origins + directions * t[:, None]
    normal = (point - center) * inv_r[:, None]

    return Hit(
        hit=hit,
        t=jnp.where(hit, t, T_MAX),
        normal=normal,
        albedo=fetched[:, 4:7],
        metallic=fetched[:, 7],
        roughness=fetched[:, 8],
        emission=fetched[:, 9:12],
        ior=fetched[:, 12],
        object_id=jnp.where(hit, fetched[:, 13], -1.0),
    )


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


def combine_hits(a: Hit, b: Hit) -> Hit:
    """Merge two closest-hit records (e.g. spheres + triangles): the nearer
    surface wins per ray."""
    bw = b.t < a.t
    bw3 = bw[:, None]
    return Hit(
        hit=a.hit | b.hit,
        t=jnp.where(bw, b.t, a.t),
        normal=jnp.where(bw3, b.normal, a.normal),
        albedo=jnp.where(bw3, b.albedo, a.albedo),
        metallic=jnp.where(bw, b.metallic, a.metallic),
        roughness=jnp.where(bw, b.roughness, a.roughness),
        emission=jnp.where(bw3, b.emission, a.emission),
        ior=jnp.where(bw, b.ior, a.ior),
        object_id=jnp.where(bw, b.object_id, a.object_id),
    )
