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


def _scatter_directions(key, d, normal, roughness, cosine=False):
    """Metal and diffuse scatter directions for the whole wavefront.

    metal:   normalize(reflect(normalize(d), n) + roughness * ball)
             (raytracer_core.cpp:334-339)
    diffuse: normalize(n + hemisphere_ball(n))
             (raytracer_core.cpp:341-346)
    One ball sample serves both: the branches are exclusive per lane, and the
    RNG is stateless so there is no stream to keep aligned.

    ``cosine=True`` swaps the diffuse branch for EXACT cosine-weighted
    sampling: normalize(n + s) with s uniform ON the unit sphere is
    distributed cos(theta)/pi exactly, so with the Lambertian BRDF
    albedo/pi the pdf cancels to the same ``throughput *= albedo`` update.
    (The reference's in-ball variant is only approximately cosine; the
    exact sampler is what the NEE estimator is defined against.)
    """
    ball = rngmod.unit_ball(key, d.shape[:-1])
    refl = vm.reflect(vm.normalize(d), normal)
    metal_dir = vm.normalize(refl + ball * roughness[..., None])
    if cosine:
        s = vm.normalize(ball)  # ball direction is isotropic -> on-sphere
        cd = normal + s
        degenerate = vm.length_squared(cd, keepdims=True) < 1e-12
        diffuse_dir = jnp.where(degenerate, normal, vm.normalize(cd))
    else:
        side = vm.dot(ball, normal, keepdims=True) > 0.0
        hemi = jnp.where(side, ball, -ball)
        diffuse_dir = vm.normalize(normal + hemi)
    return metal_dir, diffuse_dir


def _sample_light_cone(k_light, k_cone, attr, light_cdf, hp):
    """Pick one emissive sphere per lane and sample its subtended cone.

    Gather-free light fetch: the chosen light's packed attribute row comes
    from a one-hot (R, N) @ (N, 16) matmul against the same attribute
    matrix the intersector uses (ops/intersect.py:attribute_matrix).

    Solid-angle cone sampling of a sphere light (center c, radius r) seen
    from hp: cos_max = sqrt(1 - r^2/|c-hp|^2); direction uniform on the
    cone cap. Returns (dir, weight=2*pi*(1-cos_max), emission, light_id,
    inside) — ``weight`` is 1/pdf of the sampled solid angle, and lanes
    *inside* a light sphere are flagged invalid (cone undefined).
    """
    R = hp.shape[0]
    u_l = rngmod.uniform(k_light, (R,))
    sel_ge = light_cdf[None, :] >= u_l[:, None]
    first = jnp.cumsum(sel_ge.astype(jnp.int32), axis=-1) == 1
    lhot = (sel_ge & first).astype(jnp.float32)
    lat = jnp.dot(lhot, attr, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    lc, lr = lat[:, 0:3], lat[:, 3]
    le, lid = lat[:, 9:12], lat[:, 13]

    to_l = lc - hp
    d2 = jnp.maximum(vm.length_squared(to_l), 1e-12)
    sin2_max = (lr * lr) / d2
    inside = sin2_max >= 1.0
    cos_max = jnp.sqrt(jnp.clip(1.0 - sin2_max, 0.0, 1.0))

    xi = rngmod.uniform(k_cone, (R, 2))
    cos_t = 1.0 - xi[:, 0] * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = (2.0 * jnp.pi) * xi[:, 1]

    w = to_l * jax.lax.rsqrt(d2)[:, None]
    # orthonormal basis around w (branchless pick of the less-aligned axis)
    a = jnp.where((jnp.abs(w[:, 0]) > 0.9)[:, None],
                  jnp.array([0.0, 1.0, 0.0], jnp.float32)[None, :],
                  jnp.array([1.0, 0.0, 0.0], jnp.float32)[None, :])
    t1 = vm.normalize(vm.cross(a, w))
    t2 = vm.cross(w, t1)
    dir_l = (w * cos_t[:, None]
             + t1 * (sin_t * jnp.cos(phi))[:, None]
             + t2 * (sin_t * jnp.sin(phi))[:, None])
    weight = (2.0 * jnp.pi) * (1.0 - cos_max)  # = 1 / pdf_solid_angle
    return dir_l, weight, le, lid, inside


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
                     "use_bvh", "nee", "diffuse_sampling"),
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
    nee: bool = False,
    diffuse_sampling: str = "ball",
):
    """Trace R rays to completion; returns (R, 3) linear radiance.

    ``mesh`` optionally adds a TriangleMesh to the scene: both geometries are
    intersected per bounce and the nearer surface shades (materials work
    identically). ``use_bvh=True`` swaps the dense MXU sweeps for LBVH
    traversal of *both* geometries — spheres and triangles (the scalable
    path for scenes past the brute-force crossover; equivalent results —
    tests/test_bvh.py, tests/test_triangle.py). With ``with_stats=True`` also
    returns the total number of ray segments traced (for Mrays/s accounting,
    SURVEY.md §5 tracing; shadow rays count as segments under ``nee``).

    ``nee=True`` (v2 only) switches diffuse lanes to next-event estimation:
    at every diffuse hit one emissive sphere is sampled by subtended solid
    angle and connected with a shadow ray, and diffuse BSDF-path hits on
    lights no longer add emission (specular lanes still do) — an unbiased
    split that removes the find-the-light-by-chance variance of the
    reference's estimator (raytracer_core.cpp:306-312 adds emission only on
    lucky hits). NEE is defined against the EXACT Lambertian/cosine sampler,
    so it forces ``diffuse_sampling="cosine"``; ``diffuse_sampling="cosine"``
    alone (nee=False) is the matching brute-force path tracer used to verify
    the NEE estimator's mean (tests/test_nee.py).
    """
    if mode not in ("v1", "v2"):
        raise ValueError(f"unknown integrator mode {mode!r}")
    if diffuse_sampling not in ("ball", "cosine"):
        raise ValueError(f"unknown diffuse_sampling {diffuse_sampling!r}")
    if nee and mode != "v2":
        raise ValueError("nee=True requires mode='v2'")
    cosine = nee or diffuse_sampling == "cosine"
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

    if nee:
        # Uniform pick over emissive spheres: a cumulative-mask one-hot
        # (no gather) selects from this scene-constant cdf per lane.
        em_max = jnp.max(scene.emission, axis=-1)
        is_light = scene.valid & (em_max > 0.0) & (scene.radius > 0.0)
        lw = is_light.astype(jnp.float32)
        n_lights = jnp.sum(lw)
        light_cdf = jnp.cumsum(lw) / jnp.maximum(n_lights, 1.0)

    def scene_hit(o_, d_):
        """Closest hit over both geometries; also returns the per-lane
        "winner is a triangle" flag. NEE needs it twice: emissive TRIANGLES
        are not in the sphere-light cdf, so their BSDF-path emission must
        survive the post-diffuse suppression (only sphere emission is
        otherwise double counted), and a triangle winning the shadow ray is
        always an occluder even if its object_id collides with the sampled
        sphere light's id (triangle ids default to 0 — ops/triangle.py:84)."""
        if use_bvh:
            h_ = intersect_spheres_bvh_hit(scene, bvh, o_, d_)
        else:
            h_ = intersect_brute(scene, o_, d_, attr=attr)
        if mesh is None:
            return h_, jnp.zeros(h_.t.shape, bool)
        if use_bvh:
            mh = intersect_mesh_bvh_hit(mesh, tri_bvh, o_, d_)
        else:
            mh = intersect_mesh_brute(mesh, o_, d_, attr=tri_attr)
        return combine_hits(h_, mh), mh.hit & (mh.t < h_.t)

    def body(state):
        depth, o, d, thr, col, act, k, segs, no_emit = state
        depth = depth + 1
        k, k_ball, k_rr, k_branch, k_glass = jax.random.split(k, 5)

        segs = segs + jnp.sum(act.astype(jnp.int32))
        h, is_tri_hit = scene_hit(o, d)

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

        # Under NEE, lanes whose previous scatter was diffuse already
        # accounted for SPHERE-light direct light via their shadow ray —
        # BSDF-path sphere emission would double count it. Two exemptions:
        # triangle emission is NOT in the light cdf, so it must still be
        # added (suppressing it loses that light entirely —
        # tests/test_nee.py); and a sphere hit FROM INSIDE (the shading
        # point sat inside that emissive sphere, e.g. a dome/sky light) is
        # unreachable by any shadow ray — its far-root exit hit, detected
        # by the outward normal pointing along the ray, keeps its BSDF
        # emission on EVERY draw, which is the exact estimator of an
        # enclosing light and independent of which light NEE happened to
        # sample (tests/test_multilight.py quantifies the old gate's
        # pick-probability bias).
        if nee:
            exit_hit = vm.dot(d, h.normal) > 0.0
            emit_ok = act & ~(no_emit & ~is_tri_hit & ~exit_hit)
        else:
            emit_ok = act
        col = col + jnp.where(emit_ok[:, None], thr * h.emission, 0.0)

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

        metal_dir, diffuse_dir = _scatter_directions(
            k_ball, d, normal, roughness, cosine=cosine)
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
            is_specular = is_metal | is_glass
        else:
            is_specular = is_metal

        if nee:
            # Direct-light split for diffuse lanes: one shadow ray to a
            # solid-angle-sampled point on a uniformly chosen light.
            # Lambertian f = albedo/pi; estimator
            #   thr * albedo/pi * cos * Le * (1/pdf_omega) * n_lights.
            diffuse_lane = act & ~is_specular
            k_light = jax.random.fold_in(k, 101)
            k_cone = jax.random.fold_in(k, 102)
            dir_l, weight, le, lid, inside = _sample_light_cone(
                k_light, k_cone, attr, light_cdf, hp)
            sh, sh_is_tri = scene_hit(hp, dir_l)
            # the winner must be the sampled light itself: a triangle can
            # never be (triangle ids may collide with sphere ids)
            visible = sh.hit & ~sh_is_tri & (sh.object_id == lid)
            ndl = vm.dot(normal, dir_l)
            gate = (diffuse_lane & visible & ~inside & (ndl > 0.0)
                    & (n_lights > 0.0))
            contrib = (thr * albedo
                       * (ndl * weight * (n_lights / jnp.pi))[:, None] * le)
            col = col + jnp.where(gate[:, None], contrib, 0.0)
            segs = segs + jnp.sum(diffuse_lane.astype(jnp.int32))
            # Suppression is unconditional for diffuse lanes: the
            # enclosing-light corner (shading point inside an emissive
            # sphere, where the shadow ray contributes nothing) is handled
            # at emission time by the exit-hit exemption above, which
            # fires on every draw instead of only the 1/n_lights draws
            # that happened to sample the containing light — the old
            # `& ~inside` gate under-counted an enclosing dome by the
            # pick probability and over-counted interior lights via the
            # unsuppressed draws (round-4 residual, VERDICT r4 item 7).
            no_emit = diffuse_lane

        thr = thr * albedo
        o = jnp.where(act[:, None], hp, o)
        d = jnp.where(act[:, None], new_d, d)
        return depth, o, d, thr, col, act, k, segs, no_emit

    def cond(state):
        depth = state[0]
        act = state[5]
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
        jnp.zeros((R,), bool) & act0,  # no_emit: camera hits always emit
    )
    # One guaranteed iteration (the C++ loop always runs once for
    # max_depth >= 1), then while_loop exits as soon as all lanes die.
    state = body(init)
    state = jax.lax.while_loop(cond, body, state)
    color, segments = state[4], state[7]
    if with_stats:
        return color, segments
    return color
