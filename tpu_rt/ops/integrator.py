"""Wavefront path-tracing integrator.

TPU-native redesign of PathTracer::trace_ray
(cpp_raytracer/raytracer_core.cpp:291-351): the reference traces one ray at a
time through an iterative bounce loop; here the *entire wavefront* of R rays
advances through the bounce loop together as SoA arrays, with a boolean
``active`` mask in place of per-ray control flow. Dead lanes (missed,
Russian-roulette-killed) are masked rather than compacted — on the VPU a
masked lane costs the same as a live one, and for the reference's depth-4
workloads masking beats the bookkeeping cost of compaction (SURVEY.md §7
"ship masked first, compact second").

The loop is a ``lax.while_loop`` that exits as soon as every lane is dead,
so deep ``max_depth`` settings don't pay for bounces nobody reaches.

Estimator modes:
  * ``v2`` (default): the reference's current-core estimator — unbiased RR
    with throughput compensation after 3 bounces, deterministic
    metallic-vs-diffuse branch (raytracer_core.cpp:316-347).
  * ``v1``: the old-core estimator the GUI actually shipped with — fixed
    p=0.8 RR without compensation, probabilistic metal branch
    ``xi < metallic``, face-flipped shading normals
    (old/raytracer_core copy.cpp:211-243, :121-135). Kept for RMSE parity
    against the compiled C++ reference.

``enable_refraction=True`` adds the dielectric branch the reference left as
dead code (ior/refract/schlick defined at raytracer_core.h:297-312 but never
called — SURVEY.md §2.4): spheres with metallic == 0 and roughness == 0 and
ior > 1 refract with Schlick-weighted reflection.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import rng as rngmod
from ..core import vecmath as vm
from ..core.types import SphereScene
from .intersect import attribute_matrix, combine_hits, intersect_brute

# RR activates strictly after this many bounces (raytracer_core.cpp:317).
RR_START_DEPTH = 3
# v2 RR clamp (raytracer_core.cpp:322-323).
RR_P_MIN, RR_P_MAX = 0.1, 0.95
# v1 fixed continue probability (old/raytracer_core copy.cpp:221).
V1_RR_P = 0.8


def _scatter_directions(key, d, normal, roughness):
    """Metal and diffuse scatter directions for the whole wavefront.

    metal:   normalize(reflect(normalize(d), n) + roughness * ball)
             (raytracer_core.cpp:334-339)
    diffuse: normalize(n + hemisphere_ball(n))
             (raytracer_core.cpp:341-346)
    One ball sample serves both: the branches are exclusive per lane, and the
    RNG is stateless so there is no stream to keep aligned.
    """
    ball = rngmod.unit_ball(key, d.shape[:-1])
    refl = vm.reflect(vm.normalize(d), normal)
    metal_dir = vm.normalize(refl + ball * roughness[..., None])
    side = vm.dot(ball, normal, keepdims=True) > 0.0
    hemi = jnp.where(side, ball, -ball)
    diffuse_dir = vm.normalize(normal + hemi)
    return metal_dir, diffuse_dir


def _dielectric_directions(key, d, normal, ior):
    """Glass scatter: refract with Schlick-probability reflection.

    Implements the branch the reference declared but never wired in
    (FastMath::refract/schlick, raytracer_core.h:297-312), with
    front-face handling: entering rays use eta = 1/ior, exiting use ior.
    """
    ud = vm.normalize(d)
    cos_in = vm.dot(ud, normal, keepdims=True)
    front = cos_in < 0.0
    n_eff = jnp.where(front, normal, -normal)
    eta = jnp.where(front[..., 0], 1.0 / ior, ior)

    can_refract, refracted = vm.refract(ud, n_eff, eta)
    cosine = jnp.minimum(-vm.dot(ud, n_eff), 1.0)
    reflect_prob = jnp.where(can_refract, vm.schlick(cosine, ior), 1.0)
    xi = rngmod.uniform(key, d.shape[:-1])
    use_reflect = xi < reflect_prob
    refl = vm.reflect(ud, n_eff)
    return vm.normalize(jnp.where(use_reflect[..., None], refl, refracted))


@partial(
    jax.jit,
    static_argnames=("max_depth", "mode", "enable_refraction", "with_stats",
                     "use_bvh"),
)
def trace(
    scene: SphereScene,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    key: jax.Array,
    max_depth: int = 4,
    mode: str = "v2",
    enable_refraction: bool = False,
    with_stats: bool = False,
    mesh=None,
    use_bvh: bool = False,
):
    """Trace R rays to completion; returns (R, 3) linear radiance.

    ``mesh`` optionally adds a TriangleMesh to the scene: both geometries are
    intersected per bounce and the nearer surface shades (materials work
    identically). ``use_bvh=True`` swaps the dense MXU sweeps for LBVH
    traversal of *both* geometries — spheres and triangles (the scalable
    path for scenes past the brute-force crossover; equivalent results —
    tests/test_bvh.py, tests/test_triangle.py). With ``with_stats=True`` also
    returns the total number of ray segments traced (for Mrays/s accounting,
    SURVEY.md §5 tracing).
    """
    if mode not in ("v1", "v2"):
        raise ValueError(f"unknown integrator mode {mode!r}")
    R = origins.shape[0]
    attr = attribute_matrix(scene)
    if use_bvh:
        from .bvh import intersect_spheres_bvh_hit, scene_lbvh

        bvh = scene_lbvh(scene)
    if mesh is not None:
        if use_bvh:
            from .triangle import intersect_mesh_bvh_hit, mesh_lbvh

            tri_bvh = mesh_lbvh(mesh)
        else:
            from .triangle import intersect_mesh_brute, tri_attribute_matrix

            tri_attr = tri_attribute_matrix(mesh)
    if max_depth < 1:
        # The C++ bounce loop body never runs for max_depth < 1
        # (raytracer_core.cpp:297): the result is black.
        zero = jnp.zeros((R, 3), jnp.float32)
        return (zero, jnp.int32(0)) if with_stats else zero
    bg = scene.background

    def body(state):
        depth, o, d, thr, col, act, k, segs = state
        depth = depth + 1
        k, k_ball, k_rr, k_branch, k_glass = jax.random.split(k, 5)

        segs = segs + jnp.sum(act.astype(jnp.int32))
        if use_bvh:
            h = intersect_spheres_bvh_hit(scene, bvh, o, d)
        else:
            h = intersect_brute(scene, o, d, attr=attr)
        if mesh is not None:
            if use_bvh:
                mh = intersect_mesh_bvh_hit(mesh, tri_bvh, o, d)
            else:
                mh = intersect_mesh_brute(mesh, o, d, attr=tri_attr)
            h = combine_hits(h, mh)

        # Miss: add background through throughput, lane dies
        # (raytracer_core.cpp:306-311; v1 returns background up the chain,
        # old/raytracer_core copy.cpp:242).
        miss = act & ~h.hit
        col = col + jnp.where(miss[:, None], thr * bg[None, :], 0.0)
        act = act & h.hit

        normal = h.normal
        if mode == "v1":
            # v1 flips the shading normal to oppose the ray
            # (HitRecord::set_face_normal, old/raytracer_core copy.h:132-135).
            front = vm.dot(d, normal, keepdims=True) < 0.0
            normal = jnp.where(front, normal, -normal)

        col = col + jnp.where(act[:, None], thr * h.emission, 0.0)

        # Russian roulette (before scatter, after emission).
        xi_rr = rngmod.uniform(k_rr, (R,))
        if mode == "v2":
            # p = clamp(max throughput component, 0.1, 0.95); survivors are
            # compensated (raytracer_core.cpp:317-329).
            rr_on = depth > RR_START_DEPTH
            p = jnp.clip(jnp.max(thr, axis=-1), RR_P_MIN, RR_P_MAX)
            kill = rr_on & (xi_rr >= p)
            act = act & ~kill
            thr = jnp.where((rr_on & act)[:, None], thr / p[:, None], thr)
        else:
            # v1: continue iff remaining depth < 3 or xi < 0.8, *without*
            # compensation — a biased estimator, reproduced verbatim for
            # parity (old/raytracer_core copy.cpp:220-239).
            remaining = max_depth - (depth - 1)
            rr_on = remaining >= RR_START_DEPTH
            kill = rr_on & (xi_rr >= V1_RR_P)
            act = act & ~kill

        hp = o + d * h.t[:, None]

        metallic, roughness, albedo, ior = (
            h.metallic, h.roughness, h.albedo, h.ior)

        metal_dir, diffuse_dir = _scatter_directions(k_ball, d, normal, roughness)
        if mode == "v2":
            # Deterministic branch: metallic > 0 (raytracer_core.cpp:334).
            is_metal = metallic > 0.0
        else:
            # Probabilistic branch: xi < metallic
            # (old/raytracer_core copy.cpp:223).
            is_metal = rngmod.uniform(k_branch, (R,)) < metallic
        new_d = jnp.where(is_metal[:, None], metal_dir, diffuse_dir)

        if enable_refraction:
            glass_dir = _dielectric_directions(k_glass, d, h.normal, ior)
            is_glass = (metallic <= 0.0) & (roughness <= 0.0) & (ior > 1.0)
            new_d = jnp.where(is_glass[:, None], glass_dir, new_d)

        thr = thr * albedo
        o = jnp.where(act[:, None], hp, o)
        d = jnp.where(act[:, None], new_d, d)
        return depth, o, d, thr, col, act, k, segs

    def cond(state):
        depth, _, _, _, _, act, _, _ = state
        return (depth < max_depth) & jnp.any(act)

    # The initial active mask is all-True but derived from ray data rather
    # than a constant: under shard_map's varying-axes type system a constant
    # mask would make the first segment-count replicated while later ones are
    # varying, breaking the while_loop carry type.
    act0 = jnp.isfinite(jnp.sum(directions, axis=-1))
    init = (
        jnp.int32(0),
        origins,
        directions,
        jnp.ones((R, 3), jnp.float32),
        jnp.zeros((R, 3), jnp.float32),
        act0,
        key,
        jnp.sum((directions[:, 0] * 0.0).astype(jnp.int32)),
    )
    # One guaranteed iteration (the C++ loop always runs once for
    # max_depth >= 1), then while_loop exits as soon as all lanes die.
    state = body(init)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, _, color, _, _, segments = state
    if with_stats:
        return color, segments
    return color
