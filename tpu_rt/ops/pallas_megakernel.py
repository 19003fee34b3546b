"""Pallas TPU megakernel: the full path-trace loop fused in VMEM.

The lax pipeline (tpu_rt.ops.integrator) is a chain of XLA ops: every bounce
reads and writes the whole wavefront's SoA state through HBM ~dozens of
times. This kernel fuses camera ray generation, the bounce loop (16-sphere
intersection, shading, Russian roulette, scatter sampling), spp accumulation
and gamma into ONE Pallas program per 4096-ray tile: ray state lives
entirely in VMEM registers as (32, 128) component planes, and the only HBM
traffic is the final (3, tile) color store — the speed-of-light memory
profile for this workload.

Layout choices (see /opt/skills/guides/pallas_guide.md):
  * vectors are three separate (SUBLANES, 128) f32 planes — never a
    trailing dim of 3, which would waste 125/128 lanes;
  * the sphere loop is a static unroll over the padded bucket (16): per
    sphere it is pure VPU elementwise work on the planes, with running
    min + select for the winner's attributes (no gathers);
  * randomness is the in-kernel TPU PRNG (pltpu.prng_random_bits), seeded
    per (frame seed, tile, sample) — deterministic and independent per tile;
    directions are sampled sphere-analytically (z = 1-2u, phi = 2 pi u,
    radius = cbrt(u)) so no rejection loops and no Box-Muller transcendental
    pressure beyond sin/cos/cbrt.

Estimator: the v2 reference semantics (PathTracer::trace_ray,
cpp_raytracer/raytracer_core.cpp:291-351): miss adds throughput x
background; emission adds before RR; RR after 3 bounces with
p = clamp(max throughput, 0.1, 0.95) and survivor compensation; metal
(metallic > 0) mirrors with roughness jitter, else diffuse
normalize(normal + hemisphere-ball). Distribution-exact vs the lax path,
stream-different (different PRNG), so images agree statistically — verified
in tests/test_pallas.py.

``nee=True`` fuses next-event estimation into the bounce loop (same
estimator as ops/integrator.py trace(nee=True)): diffuse lanes switch to
the exact cosine sampler, every diffuse hit connects one shadow ray to a
solid-angle-sampled emissive sphere (light pick via a cdf riding the attr
pad column — no gathers), and BSDF-path emission is suppressed on the
following bounce. The shadow sweep re-unrolls the primitive loop, so a
NEE bounce costs ~2x the intersect work of a plain one — bought back
many times over by the 20-30x variance reduction on small-light scenes
(tests/test_nee.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import CameraP, SphereScene, T_MAX
from ..core import camera as cammod

SUBLANES = 32
LANES = 128
TILE = SUBLANES * LANES  # rays per program

# Per-tile all-dead bounce early exit: bounces 2..D are gated on
# any-lane-alive via pl.when + VMEM scratch state, so tiles that went
# fully dark stop paying for the sphere sweep. Measured on chip
# (tools/ab_bounce_early_exit.py, 1080p/4spp/d4, chained x20, 2026-08-20):
#   demo scene: 7.29 ms on / 6.20 ms off  (+17.6% — the 14-plane VMEM
#               spill+reload per bounce costs more than the skips save
#               when most tiles keep at least one live lane)
#   mostly-sky: 3.70 ms on / 6.14 ms off  (-40% — most tiles die at
#               bounce 1)
# Default OFF: the headline/interactive workloads look like the demo
# scene. Sky-heavy callers opt in per render via
# render_pallas(bounce_early_exit=True). Correctness is flag-independent
# (skipped bounces feed only all-dead lanes): bit-identical in interpret
# mode for any spp, and compiled at spp=1 (tests/test_early_exit.py);
# at spp>1 compiled streams shift (the shared per-tile PRNG advances by
# fewer draws) — a different, equally unbiased sample set.
BOUNCE_EARLY_EXIT = False

_INV_U32 = 2.3283064365386963e-10  # 1 / 2^32 (PCG32::random_float scale)
TWO_PI = 6.2831853071795864
# R2 low-discrepancy sequence: (1/p, 1/p^2) for the plastic number p —
# successive spp samples tile the pixel footprint quasi-uniformly instead
# of i.i.d.-uniformly (stratified pixel AA; see render_pallas(stratify=)).
R2_ALPHA_U = 0.7548776662466927
R2_ALPHA_V = 0.5698402909980532


def _uniform(shape):
    """U[0,1) from the in-kernel PRNG.

    Mosaic has no uint32 -> f32 cast; keep the top 24 bits (logical shift on
    the int32 view keeps the value positive) and scale by 2^-24.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    hi24 = jax.lax.shift_right_logical(bits, 8)
    return hi24.astype(jnp.float32) * (1.0 / 16777216.0)


def _hash_uniform(pix, seed, salt):
    """Counter-based integer-hash U[0,1): the interpret-mode RNG.

    ``pltpu.prng_seed`` has no CPU/interpret lowering, so interpreted runs
    (multi-device sharding validation on the virtual CPU mesh) derive
    uniforms from a murmur3-style finalizer over (pixel id, stream seed,
    call salt) — deterministic and distinct per pixel/sample/call site.
    """
    h = pix ^ (seed * jnp.int32(-1640531527))
    h = h + jnp.int32(salt) * jnp.int32(40503)
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * jnp.int32(-2048144789)
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * jnp.int32(-1028477387)
    h = h ^ jax.lax.shift_right_logical(h, 16)
    hi24 = jax.lax.shift_right_logical(h, 8)
    return hi24.astype(jnp.float32) * (1.0 / 16777216.0)


def _rsqrt_safe(x):
    return jax.lax.rsqrt(jnp.maximum(x, 1e-20))


def _unit_ball_from(u1, u2, u3):
    """Uniform in the unit ball from three U[0,1) draws: uniform direction
    x cbrt-radius."""
    z = 1.0 - 2.0 * u1
    r_xy = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = TWO_PI * u2
    x = r_xy * jnp.cos(phi)
    y = r_xy * jnp.sin(phi)
    # cbrt via exp/log (no cbrt primitive in Mosaic); u3 == 0 -> r == 0
    r = jnp.exp(jnp.log(jnp.maximum(u3, 1e-12)) * (1.0 / 3.0))
    return x * r, y * r, z * r


def _normalize3(x, y, z):
    inv = _rsqrt_safe(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _make_kernel(width, height, spp, max_depth, n_spheres, n_tris=0,
                 jitter=True, enable_refraction=False, gamma=True,
                 rr_start=3, hash_rng=False, enable_dof=False, nee=False,
                 stratify=False, adaptive=False, bounce_early_exit=None):
    """Build the kernel body for static (w, h, spp, depth, N).

    ``hash_rng=True`` swaps the hardware PRNG for the counter-hash RNG
    (interpret mode — see _hash_uniform). ``nee=True`` fuses next-event
    estimation into the bounce loop: diffuse lanes switch to the exact
    cosine sampler, connect every hit to one solid-angle-sampled emissive
    sphere with an in-kernel shadow sweep, and suppress BSDF-path emission
    on the following bounce (the same estimator as
    ops/integrator.py trace(nee=True), stream-different)."""

    if bounce_early_exit is None:
        bounce_early_exit = BOUNCE_EARLY_EXIT
    early_exit = bounce_early_exit and max_depth >= 2

    def kernel(cam_ref, attr_ref, tri_geo_ref, tri_mat_ref, bg_ref,
               seed_ref, *rest):
        if early_exit:
            *rest, st_ref, seg_sc = rest
        if adaptive:
            mask_ref, out_ref, segs_ref = rest
        else:
            out_ref, segs_ref = rest
        t = pl.program_id(0)
        # unique, deterministic stream per (frame, tile); params_ref carries
        # [seed, pixel_offset] (offset > 0 when rendering a sharded row
        # block of a larger image)
        seed_scalar = seed_ref[0] + t
        if not hash_rng:
            pltpu.prng_seed(seed_scalar)
        pixel_offset = seed_ref[1]

        # camera scalars (packed by host): pos, forward, right, up, tf*aspect, tf
        cpx, cpy, cpz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
        fwx, fwy, fwz = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
        rix, riy, riz = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
        upx, upy, upz = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]
        tf_aspect, tf = cam_ref[0, 12], cam_ref[0, 13]
        bgx, bgy, bgz = bg_ref[0, 0], bg_ref[0, 1], bg_ref[0, 2]
        n_lights = bg_ref[0, 3]  # emissive-sphere count (0.0 when nee off)

        shape = (SUBLANES, LANES)
        sub = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        flat = pixel_offset + t * TILE + sub * LANES + lane
        px = (flat % width).astype(jnp.float32)
        py = (flat // width).astype(jnp.float32)

        inv_w = 1.0 / width
        inv_h = 1.0 / height

        if jitter and stratify:
            # per-pixel Cranley-Patterson rotation of the shared R2
            # lattice: decorrelates pixels while keeping each pixel's spp
            # samples stratified; drawn once per frame, before the loop
            if hash_rng:
                shift_u = _hash_uniform(flat, seed_scalar, 9001)
                shift_v = _hash_uniform(flat, seed_scalar, 9002)
            else:
                shift_u = _uniform(shape)
                shift_v = _uniform(shape)

        def sample_body(_s, acc):
            acc_r, acc_g, acc_b, seg_count = acc

            if hash_rng:
                # distinct salt per call site (Python counter over the
                # unrolled trace) x per sample (_s folded into the seed)
                _salt = [0]

                def U():
                    _salt[0] += 1
                    return _hash_uniform(flat, seed_scalar + _s * 7919,
                                         _salt[0])
            else:
                def U():
                    return _uniform(shape)

            def unit_ball():
                return _unit_ball_from(U(), U(), U())

            # jittered pixel coords (raytracer_core.cpp:390-392);
            # jitter=False shoots pixel centers (deterministic goldens)
            if jitter and stratify:
                sf = _s.astype(jnp.float32)
                xu = shift_u + sf * R2_ALPHA_U
                xu = xu - jnp.floor(xu)
                xv = shift_v + sf * R2_ALPHA_V
                xv = xv - jnp.floor(xv)
            elif jitter:
                xu = U()
                xv = U()
            else:
                xu = xv = 0.5
            u = (px + xu) * inv_w
            v = (py + xv) * inv_h
            # v1 camera mapping (old/raytracer_core copy.h:160-184)
            vx = (u - 0.5) * 2.0 * tf_aspect
            vy = (0.5 - v) * 2.0 * tf
            dx = fwx + rix * vx + upx * vy
            dy = fwy + riy * vx + upy * vy
            dz = fwz + riz * vx + upz * vy
            dx, dy, dz = _normalize3(dx, dy, dz)
            ox = jnp.full(shape, cpx)
            oy = jnp.full(shape, cpy)
            oz = jnp.full(shape, cpz)

            if enable_dof:
                # thin-lens: jitter the origin on the aperture disk and
                # re-aim at the pinhole ray's focal-plane point
                ap = cam_ref[0, 14]
                fo = cam_ref[0, 15]
                cosf = dx * fwx + dy * fwy + dz * fwz
                tfoc = fo / jnp.maximum(cosf, 1e-6)
                fpx = ox + dx * tfoc
                fpy = oy + dy * tfoc
                fpz = oz + dz * tfoc
                r_l = ap * jnp.sqrt(U())
                ph = TWO_PI * U()
                lx = r_l * jnp.cos(ph)
                ly = r_l * jnp.sin(ph)
                ox = ox + rix * lx + upx * ly
                oy = oy + riy * lx + upy * ly
                oz = oz + riz * lx + upz * ly
                dx, dy, dz = _normalize3(fpx - ox, fpy - oy, fpz - oz)

            thr_r = jnp.ones(shape, jnp.float32)
            thr_g = jnp.ones(shape, jnp.float32)
            thr_b = jnp.ones(shape, jnp.float32)
            col_r = jnp.zeros(shape, jnp.float32)
            col_g = jnp.zeros(shape, jnp.float32)
            col_b = jnp.zeros(shape, jnp.float32)
            active = jnp.ones(shape, jnp.bool_)
            # NEE: lanes whose previous scatter was diffuse already counted
            # direct light via their shadow ray; camera hits always emit.
            no_emit = jnp.zeros(shape, jnp.bool_)

            state = (ox, oy, oz, dx, dy, dz, thr_r, thr_g, thr_b,
                     col_r, col_g, col_b, active, no_emit, seg_count)

            def bounce(rr_on, st):
                (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb, act,
                 no_emit, seg_count) = st
                seg_count = seg_count + jnp.sum(act.astype(jnp.int32))

                # ---- intersect all spheres, unrolled ----
                best_t = jnp.full(shape, T_MAX)
                b_cx = jnp.zeros(shape, jnp.float32)
                b_cy = jnp.zeros(shape, jnp.float32)
                b_cz = jnp.zeros(shape, jnp.float32)
                b_ir = jnp.zeros(shape, jnp.float32)   # 1/r
                b_ar = jnp.zeros(shape, jnp.float32)   # albedo
                b_ag = jnp.zeros(shape, jnp.float32)
                b_ab = jnp.zeros(shape, jnp.float32)
                b_met = jnp.zeros(shape, jnp.float32)
                b_rgh = jnp.zeros(shape, jnp.float32)
                b_er = jnp.zeros(shape, jnp.float32)   # emission
                b_eg = jnp.zeros(shape, jnp.float32)
                b_eb = jnp.zeros(shape, jnp.float32)
                b_ior = jnp.ones(shape, jnp.float32)

                for n in range(n_spheres):
                    # attr row layout matches intersect.attribute_matrix
                    scx, scy, scz = attr_ref[n, 0], attr_ref[n, 1], attr_ref[n, 2]
                    rad = attr_ref[n, 3]
                    inv_rad = attr_ref[n, 14]
                    ocx = ox - scx
                    ocy = oy - scy
                    ocz = oz - scz
                    half_b = ocx * dx + ocy * dy + ocz * dz
                    cq = (ocx * ocx + ocy * ocy + ocz * ocz) - rad * rad
                    # NaN-propagating root selection (round 5): sqrt of a
                    # negative discriminant is NaN, every later compare on
                    # it is False, so the explicit disc >= 0 guard, the
                    # max() clamp, and the double upper-bound checks all
                    # fold away — ~9 fewer VPU ops per sphere with
                    # outcome-identical selection (root <= best_t in the
                    # old in0/in1 was redundant with better's strict <).
                    sqrtd = jnp.sqrt(half_b * half_b - cq)  # a == 1
                    root0 = -half_b - sqrtd
                    root = jnp.where(root0 >= 1e-3, root0, sqrtd - half_b)
                    better = ((root >= 1e-3) & (root < best_t)
                              & (inv_rad > 0.0))
                    best_t = jnp.where(better, root, best_t)
                    b_cx = jnp.where(better, scx, b_cx)
                    b_cy = jnp.where(better, scy, b_cy)
                    b_cz = jnp.where(better, scz, b_cz)
                    b_ir = jnp.where(better, inv_rad, b_ir)
                    b_ar = jnp.where(better, attr_ref[n, 4], b_ar)
                    b_ag = jnp.where(better, attr_ref[n, 5], b_ag)
                    b_ab = jnp.where(better, attr_ref[n, 6], b_ab)
                    b_met = jnp.where(better, attr_ref[n, 7], b_met)
                    b_rgh = jnp.where(better, attr_ref[n, 8], b_rgh)
                    b_er = jnp.where(better, attr_ref[n, 9], b_er)
                    b_eg = jnp.where(better, attr_ref[n, 10], b_eg)
                    b_eb = jnp.where(better, attr_ref[n, 11], b_eb)
                    if enable_refraction:
                        b_ior = jnp.where(better, attr_ref[n, 12], b_ior)

                if n_tris:
                    # triangles have their shading normal ready; spheres
                    # derive theirs from the hit point below
                    b_is_tri = jnp.zeros(shape, jnp.bool_)
                    b_tnx = jnp.zeros(shape, jnp.float32)
                    b_tny = jnp.zeros(shape, jnp.float32)
                    b_tnz = jnp.zeros(shape, jnp.float32)
                for k in range(n_tris):
                    # scalar Moller-Trumbore against tri k (tri_geo row:
                    # v0 xyz, e1 xyz, e2 xyz, normal xyz; tri_mat row:
                    # albedo rgb, metallic, roughness, emission rgb, ior)
                    v0x, v0y, v0z = (tri_geo_ref[k, 0], tri_geo_ref[k, 1],
                                     tri_geo_ref[k, 2])
                    e1x, e1y, e1z = (tri_geo_ref[k, 3], tri_geo_ref[k, 4],
                                     tri_geo_ref[k, 5])
                    e2x, e2y, e2z = (tri_geo_ref[k, 6], tri_geo_ref[k, 7],
                                     tri_geo_ref[k, 8])
                    pvx = dy * e2z - dz * e2y
                    pvy = dz * e2x - dx * e2z
                    pvz = dx * e2y - dy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    okd = jnp.abs(det) > 1e-9
                    inv = 1.0 / jnp.where(okd, det, 1.0)
                    tvx = ox - v0x
                    tvy = oy - v0y
                    tvz = oz - v0z
                    uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    vv = (dx * qvx + dy * qvy + dz * qvz) * inv
                    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
                    okt = (okd & (uu >= 0.0) & (vv >= 0.0)
                           & (uu + vv <= 1.0) & (tt >= 1e-3))
                    better = okt & (tt < best_t)
                    best_t = jnp.where(better, tt, best_t)
                    b_is_tri = b_is_tri | better
                    b_tnx = jnp.where(better, tri_geo_ref[k, 9], b_tnx)
                    b_tny = jnp.where(better, tri_geo_ref[k, 10], b_tny)
                    b_tnz = jnp.where(better, tri_geo_ref[k, 11], b_tnz)
                    b_ar = jnp.where(better, tri_mat_ref[k, 0], b_ar)
                    b_ag = jnp.where(better, tri_mat_ref[k, 1], b_ag)
                    b_ab = jnp.where(better, tri_mat_ref[k, 2], b_ab)
                    b_met = jnp.where(better, tri_mat_ref[k, 3], b_met)
                    b_rgh = jnp.where(better, tri_mat_ref[k, 4], b_rgh)
                    b_er = jnp.where(better, tri_mat_ref[k, 5], b_er)
                    b_eg = jnp.where(better, tri_mat_ref[k, 6], b_eg)
                    b_eb = jnp.where(better, tri_mat_ref[k, 7], b_eb)
                    if enable_refraction:
                        b_ior = jnp.where(better, tri_mat_ref[k, 8], b_ior)

                hit = best_t < T_MAX
                miss = act & ~hit
                missf = miss.astype(jnp.float32)
                cr = cr + missf * tr * bgx
                cg = cg + missf * tg * bgy
                cb = cb + missf * tb * bgz
                act = act & hit
                if nee:
                    # post-diffuse suppression applies to SPHERE emission
                    # only: triangles are not in the NEE light cdf, so
                    # their BSDF-path emission is the sole estimator of
                    # that light (same split as ops/integrator.py). A
                    # sphere hit FROM INSIDE (ray origin inside the
                    # winner: |o-c|^2 * (1/r)^2 < 1 on the carried
                    # best-hit planes) is exempt too — an enclosing
                    # dome/sky light is unreachable by any shadow ray, so
                    # its BSDF emission must survive on every draw
                    # (tests/test_multilight.py; same exemption as
                    # ops/integrator.py's exit-hit test).
                    eocx = ox - b_cx
                    eocy = oy - b_cy
                    eocz = oz - b_cz
                    eoc2 = eocx * eocx + eocy * eocy + eocz * eocz
                    inside_hit = eoc2 * (b_ir * b_ir) < 1.0
                    keep = no_emit & ~inside_hit
                    suppress = (keep & ~b_is_tri) if n_tris else keep
                    emitf = (act & ~suppress).astype(jnp.float32)
                else:
                    emitf = act.astype(jnp.float32)
                cr = cr + emitf * tr * b_er
                cg = cg + emitf * tg * b_eg
                cb = cb + emitf * tb * b_eb

                # ---- Russian roulette (raytracer_core.cpp:317-329) ----
                # rr_on is static: early bounces skip the RR code entirely.
                if rr_on:
                    xi_rr = U()
                    p = jnp.clip(jnp.maximum(tr, jnp.maximum(tg, tb)),
                                 0.1, 0.95)
                    act = act & (xi_rr < p)
                    comp = jnp.where(act, 1.0 / p, 1.0)
                    tr = tr * comp
                    tg = tg * comp
                    tb = tb * comp

                # ---- hit point + normal ----
                hx = ox + dx * best_t
                hy = oy + dy * best_t
                hz = oz + dz * best_t
                nx = (hx - b_cx) * b_ir
                ny = (hy - b_cy) * b_ir
                nz = (hz - b_cz) * b_ir
                if n_tris:
                    # triangles: face normal flipped to oppose the ray
                    # (tpu_rt.ops.triangle semantics)
                    tsgn = jnp.where(
                        _dot3(dx, dy, dz, b_tnx, b_tny, b_tnz) < 0.0,
                        1.0, -1.0)
                    nx = jnp.where(b_is_tri, b_tnx * tsgn, nx)
                    ny = jnp.where(b_is_tri, b_tny * tsgn, ny)
                    nz = jnp.where(b_is_tri, b_tnz * tsgn, nz)

                # ---- scatter (raytracer_core.cpp:334-347) ----
                bx, by, bz = unit_ball()
                d_dot_n = _dot3(dx, dy, dz, nx, ny, nz)
                rfx = dx - 2.0 * d_dot_n * nx
                rfy = dy - 2.0 * d_dot_n * ny
                rfz = dz - 2.0 * d_dot_n * nz
                mx, my, mz = _normalize3(rfx + bx * b_rgh,
                                         rfy + by * b_rgh,
                                         rfz + bz * b_rgh)
                if nee:
                    # exact cosine-weighted diffuse: n + (on-sphere unit)
                    # is distributed cos(theta)/pi (the NEE estimator's
                    # defining sampler — ops/integrator.py
                    # _scatter_directions(cosine=True))
                    sx_, sy_, sz_ = _normalize3(bx, by, bz)
                    cdx_, cdy_, cdz_ = nx + sx_, ny + sy_, nz + sz_
                    l2_ = cdx_ * cdx_ + cdy_ * cdy_ + cdz_ * cdz_
                    deg_ = l2_ < 1e-12
                    inv_ = _rsqrt_safe(l2_)
                    fx = jnp.where(deg_, nx, cdx_ * inv_)
                    fy = jnp.where(deg_, ny, cdy_ * inv_)
                    fz = jnp.where(deg_, nz, cdz_ * inv_)
                else:
                    side = _dot3(bx, by, bz, nx, ny, nz) > 0.0
                    sgn = jnp.where(side, 1.0, -1.0)
                    fx, fy, fz = _normalize3(nx + bx * sgn, ny + by * sgn,
                                             nz + bz * sgn)
                is_metal = b_met > 0.0
                ndx = jnp.where(is_metal, mx, fx)
                ndy = jnp.where(is_metal, my, fy)
                ndz = jnp.where(is_metal, mz, fz)

                if enable_refraction:
                    # dielectric branch (FastMath::refract/schlick,
                    # raytracer_core.h:297-312, front-face aware)
                    cos_in = _dot3(dx, dy, dz, nx, ny, nz)
                    front = cos_in < 0.0
                    sgn_n = jnp.where(front, 1.0, -1.0)
                    nex, ney, nez = nx * sgn_n, ny * sgn_n, nz * sgn_n
                    eta = jnp.where(front, 1.0 / b_ior, b_ior)
                    dt = _dot3(dx, dy, dz, nex, ney, nez)
                    disc_g = 1.0 - eta * eta * (1.0 - dt * dt)
                    can = disc_g > 0.0
                    sq_g = jnp.sqrt(jnp.maximum(disc_g, 0.0))
                    rfrx = (dx - nex * dt) * eta - nex * sq_g
                    rfry = (dy - ney * dt) * eta - ney * sq_g
                    rfrz = (dz - nez * dt) * eta - nez * sq_g
                    cosine = jnp.minimum(-dt, 1.0)
                    r0 = (1.0 - b_ior) / (1.0 + b_ior)
                    r0 = r0 * r0
                    omc = 1.0 - cosine
                    omc2 = omc * omc
                    schlick = r0 + (1.0 - r0) * omc2 * omc2 * omc
                    reflect_prob = jnp.where(can, schlick, 1.0)
                    use_refl = U() < reflect_prob
                    rf2x = dx - 2.0 * dt * nex
                    rf2y = dy - 2.0 * dt * ney
                    rf2z = dz - 2.0 * dt * nez
                    gx = jnp.where(use_refl, rf2x, rfrx)
                    gy = jnp.where(use_refl, rf2y, rfry)
                    gz = jnp.where(use_refl, rf2z, rfrz)
                    gx, gy, gz = _normalize3(gx, gy, gz)
                    is_glass = (b_met <= 0.0) & (b_rgh <= 0.0) & (b_ior > 1.0)
                    ndx = jnp.where(is_glass, gx, ndx)
                    ndy = jnp.where(is_glass, gy, ndy)
                    ndz = jnp.where(is_glass, gz, ndz)

                if nee:
                    # ---- next-event estimation: one shadow ray per
                    # diffuse lane to a solid-angle-sampled point on a
                    # uniformly chosen emissive sphere. Estimator
                    #   thr * albedo/pi * cos * Le * (1/pdf_omega) * n_lights
                    # (ops/integrator.py trace(nee=True)). ----
                    is_spec = is_metal
                    if enable_refraction:
                        is_spec = is_spec | is_glass
                    diffuse_lane = act & ~is_spec

                    # light pick: first attr row whose cdf (col 15, packed
                    # by render_pallas) crosses the draw — the same
                    # cumulative-mask one-hot as the lax path, as a
                    # where-chain over the unrolled bucket
                    u_l = U()
                    found = jnp.zeros(shape, jnp.bool_)
                    l_cx = jnp.zeros(shape, jnp.float32)
                    l_cy = jnp.zeros(shape, jnp.float32)
                    l_cz = jnp.zeros(shape, jnp.float32)
                    l_r = jnp.zeros(shape, jnp.float32)
                    l_er = jnp.zeros(shape, jnp.float32)
                    l_eg = jnp.zeros(shape, jnp.float32)
                    l_eb = jnp.zeros(shape, jnp.float32)
                    for n in range(n_spheres):
                        pick = (~found) & (attr_ref[n, 15] >= u_l)
                        found = found | pick
                        l_cx = jnp.where(pick, attr_ref[n, 0], l_cx)
                        l_cy = jnp.where(pick, attr_ref[n, 1], l_cy)
                        l_cz = jnp.where(pick, attr_ref[n, 2], l_cz)
                        l_r = jnp.where(pick, attr_ref[n, 3], l_r)
                        l_er = jnp.where(pick, attr_ref[n, 9], l_er)
                        l_eg = jnp.where(pick, attr_ref[n, 10], l_eg)
                        l_eb = jnp.where(pick, attr_ref[n, 11], l_eb)

                    # cone subtended by the light from the hit point
                    tlx = l_cx - hx
                    tly = l_cy - hy
                    tlz = l_cz - hz
                    d2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz,
                                     1e-12)
                    sin2 = (l_r * l_r) / d2
                    inside = sin2 >= 1.0
                    cos_max = jnp.sqrt(jnp.clip(1.0 - sin2, 0.0, 1.0))
                    xi1 = U()
                    xi2 = U()
                    cos_t = 1.0 - xi1 * (1.0 - cos_max)
                    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
                    phi_l = TWO_PI * xi2
                    inv_dl = jax.lax.rsqrt(d2)
                    wx_, wy_, wz_ = tlx * inv_dl, tly * inv_dl, tlz * inv_dl
                    # orthonormal basis around w (branchless axis pick)
                    big = jnp.abs(wx_) > 0.9
                    ax_ = jnp.where(big, 0.0, 1.0)
                    ay_ = jnp.where(big, 1.0, 0.0)
                    t1x = ay_ * wz_            # cross(a, w), az == 0
                    t1y = -ax_ * wz_
                    t1z = ax_ * wy_ - ay_ * wx_
                    t1x, t1y, t1z = _normalize3(t1x, t1y, t1z)
                    t2x = wy_ * t1z - wz_ * t1y
                    t2y = wz_ * t1x - wx_ * t1z
                    t2z = wx_ * t1y - wy_ * t1x
                    sc_ = sin_t * jnp.cos(phi_l)
                    ss_ = sin_t * jnp.sin(phi_l)
                    ldx = wx_ * cos_t + t1x * sc_ + t2x * ss_
                    ldy = wy_ * cos_t + t1y * sc_ + t2y * ss_
                    ldz = wz_ * cos_t + t1z * sc_ + t2z * ss_
                    weight = TWO_PI * (1.0 - cos_max)  # 1 / pdf_omega

                    # t to the chosen light along the shadow ray
                    locx = hx - l_cx
                    locy = hy - l_cy
                    locz = hz - l_cz
                    lhb = locx * ldx + locy * ldy + locz * ldz
                    lcq = (locx * locx + locy * locy + locz * locz
                           - l_r * l_r)
                    ldisc = lhb * lhb - lcq
                    lsq = jnp.sqrt(jnp.maximum(ldisc, 0.0))
                    lt0 = -lhb - lsq
                    lt1 = -lhb + lsq
                    t_light = jnp.where(lt0 >= 1e-3, lt0, lt1)
                    light_ok = (ldisc >= 0.0) & (t_light >= 1e-3)

                    # occlusion sweep: any primitive strictly nearer than
                    # the light entry point blocks the connection (the
                    # light's own entry root equals t_light, so it never
                    # self-occludes under the strict margin)
                    t_edge = t_light - 1e-3
                    occ = jnp.zeros(shape, jnp.bool_)
                    for n in range(n_spheres):
                        socx = hx - attr_ref[n, 0]
                        socy = hy - attr_ref[n, 1]
                        socz = hz - attr_ref[n, 2]
                        shb = socx * ldx + socy * ldy + socz * ldz
                        srad = attr_ref[n, 3]
                        scq = (socx * socx + socy * socy + socz * socz
                               - srad * srad)
                        # NaN-propagating root selection (see the primary
                        # sweep): a miss yields NaN roots and every compare
                        # is False
                        ssq = jnp.sqrt(shb * shb - scq)
                        sr0 = -shb - ssq
                        sr = jnp.where(sr0 >= 1e-3, sr0, ssq - shb)
                        occ = occ | ((sr >= 1e-3) & (sr < t_edge)
                                     & (attr_ref[n, 14] > 0.0))
                    for k in range(n_tris):
                        v0x, v0y, v0z = (tri_geo_ref[k, 0],
                                         tri_geo_ref[k, 1],
                                         tri_geo_ref[k, 2])
                        e1x, e1y, e1z = (tri_geo_ref[k, 3],
                                         tri_geo_ref[k, 4],
                                         tri_geo_ref[k, 5])
                        e2x, e2y, e2z = (tri_geo_ref[k, 6],
                                         tri_geo_ref[k, 7],
                                         tri_geo_ref[k, 8])
                        pvx = ldy * e2z - ldz * e2y
                        pvy = ldz * e2x - ldx * e2z
                        pvz = ldx * e2y - ldy * e2x
                        det = e1x * pvx + e1y * pvy + e1z * pvz
                        okd = jnp.abs(det) > 1e-9
                        inv = 1.0 / jnp.where(okd, det, 1.0)
                        tvx = hx - v0x
                        tvy = hy - v0y
                        tvz = hz - v0z
                        uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
                        qvx = tvy * e1z - tvz * e1y
                        qvy = tvz * e1x - tvx * e1z
                        qvz = tvx * e1y - tvy * e1x
                        vv = (ldx * qvx + ldy * qvy + ldz * qvz) * inv
                        tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
                        occ = occ | (okd & (uu >= 0.0) & (vv >= 0.0)
                                     & (uu + vv <= 1.0) & (tt >= 1e-3)
                                     & (tt < t_edge))

                    ndl = nx * ldx + ny * ldy + nz * ldz
                    gate = (diffuse_lane & light_ok & ~occ & ~inside
                            & (ndl > 0.0) & (n_lights > 0.0))
                    gf = gate.astype(jnp.float32)
                    scale = gf * ndl * weight * (n_lights
                                                 * 0.3183098861837907)
                    cr = cr + tr * b_ar * scale * l_er
                    cg = cg + tg * b_ag * scale * l_eg
                    cb = cb + tb * b_ab * scale * l_eb
                    seg_count = seg_count + jnp.sum(
                        diffuse_lane.astype(jnp.int32))
                    # Unconditional suppression: the enclosing-light
                    # corner is handled by the inside-hit exemption at
                    # emission time, which fires on every draw instead of
                    # only the 1/n_lights that sampled the containing
                    # light (exact multi-light gate; ops/integrator.py).
                    no_emit = diffuse_lane

                tr = tr * b_ar
                tg = tg * b_ag
                tb = tb * b_ab
                ox = jnp.where(act, hx, ox)
                oy = jnp.where(act, hy, oy)
                oz = jnp.where(act, hz, oz)
                dx = jnp.where(act, ndx, dx)
                dy = jnp.where(act, ndy, dy)
                dz = jnp.where(act, ndz, dz)
                return (ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb, act,
                        no_emit, seg_count)

            # Full static unroll over bounces: no loop overhead, static RR
            # gating. (A fori_loop here would nest inside the spp fori_loop
            # and a per-tile lax.cond early-exit both fail to legalize in
            # this Mosaic toolchain — measured alternatives, not oversights.)
            # Depth 32 costs ~4 min of one-time, persistently-cached compile;
            # runtime is unaffected.
            if not early_exit:
                for depth_idx in range(1, max_depth + 1):
                    state = bounce(depth_idx > rr_start, state)

                (_, _, _, _, _, _, _, _, _, col_r, col_g, col_b, _, _,
                 seg_count) = state
                return (acc_r + col_r, acc_g + col_g, acc_b + col_b,
                        seg_count)

            # All-dead early exit (lax.cond carries fail to legalize, but
            # pl.when + VMEM scratch carries do): bounce 1 runs in SSA,
            # its state spills to st_ref, and each later bounce is gated
            # on any-lane-alive — a ~130 ns vector->scalar sync buys
            # skipping the full sphere sweep + shading for tiles that went
            # dark (sky tiles die at bounce 1; RR kills most lanes by 3).
            # Skipped draws don't bias the estimator (samples stay
            # independent); with the interpret hash RNG the image is
            # bit-identical since only zero-contribution work is skipped.
            state = bounce(1 > rr_start, state)
            (s_ox, s_oy, s_oz, s_dx, s_dy, s_dz, s_tr, s_tg, s_tb,
             s_cr, s_cg, s_cb, s_act, s_ne, s_seg) = state
            st_ref[0], st_ref[1], st_ref[2] = s_ox, s_oy, s_oz
            st_ref[3], st_ref[4], st_ref[5] = s_dx, s_dy, s_dz
            st_ref[6], st_ref[7], st_ref[8] = s_tr, s_tg, s_tb
            st_ref[9], st_ref[10], st_ref[11] = s_cr, s_cg, s_cb
            st_ref[12] = s_act.astype(jnp.float32)
            st_ref[13] = s_ne.astype(jnp.float32)
            seg_sc[0] = s_seg

            for depth_idx in range(2, max_depth + 1):
                alive = jnp.any(st_ref[12] > 0.0)

                @pl.when(alive)
                def _(depth_idx=depth_idx):
                    st = (st_ref[0], st_ref[1], st_ref[2],
                          st_ref[3], st_ref[4], st_ref[5],
                          st_ref[6], st_ref[7], st_ref[8],
                          st_ref[9], st_ref[10], st_ref[11],
                          st_ref[12] > 0.0, st_ref[13] > 0.0, seg_sc[0])
                    (n_ox, n_oy, n_oz, n_dx, n_dy, n_dz, n_tr, n_tg,
                     n_tb, n_cr, n_cg, n_cb, n_act, n_ne,
                     n_seg) = bounce(depth_idx > rr_start, st)
                    st_ref[0], st_ref[1], st_ref[2] = n_ox, n_oy, n_oz
                    st_ref[3], st_ref[4], st_ref[5] = n_dx, n_dy, n_dz
                    st_ref[6], st_ref[7], st_ref[8] = n_tr, n_tg, n_tb
                    st_ref[9], st_ref[10], st_ref[11] = n_cr, n_cg, n_cb
                    st_ref[12] = n_act.astype(jnp.float32)
                    st_ref[13] = n_ne.astype(jnp.float32)
                    seg_sc[0] = n_seg

            return (acc_r + st_ref[9], acc_g + st_ref[10],
                    acc_b + st_ref[11], seg_sc[0])

        def run_tile():
            zeros = jnp.zeros(shape, jnp.float32)
            acc_r, acc_g, acc_b, segs = jax.lax.fori_loop(
                0, spp, sample_body, (zeros, zeros, zeros, jnp.int32(0)))
            segs_ref[t] = segs

            inv_spp = 1.0 / spp
            if gamma:
                out_ref[0, 0] = jnp.clip(
                    jnp.sqrt(jnp.maximum(acc_r * inv_spp, 0.0)), 0.0, 1.0)
                out_ref[1, 0] = jnp.clip(
                    jnp.sqrt(jnp.maximum(acc_g * inv_spp, 0.0)), 0.0, 1.0)
                out_ref[2, 0] = jnp.clip(
                    jnp.sqrt(jnp.maximum(acc_b * inv_spp, 0.0)), 0.0, 1.0)
            else:
                # linear mean (for cross-device psum merging before gamma)
                out_ref[0, 0] = acc_r * inv_spp
                out_ref[1, 0] = acc_g * inv_spp
                out_ref[2, 0] = acc_b * inv_spp

        if adaptive:
            # per-tile early-exit: converged tiles (mask 0) skip the whole
            # trace — the scalar core branches around all vector work, so a
            # skipped tile costs ~nothing of the frame budget. The zero
            # write keeps the (uninitialized) output block defined; the
            # accumulator ignores masked tiles (render/frame.py
            # accumulate_tiled).
            tile_on = mask_ref[t] > 0

            @pl.when(tile_on)
            def _():
                run_tile()

            @pl.when(jnp.logical_not(tile_on))
            def _():
                z = jnp.zeros(shape, jnp.float32)
                out_ref[0, 0] = z
                out_ref[1, 0] = z
                out_ref[2, 0] = z
                segs_ref[t] = jnp.int32(0)
        else:
            run_tile()

    return kernel


def _pack_camera(cam: CameraP) -> jnp.ndarray:
    """[pos3, fwd3, right3, up3, tf*aspect, tf, aperture, focus] — 16 SMEM
    scalars; focus <= 0 resolves to the look-at distance at pack time."""
    forward, right, up = cammod.basis(cam)
    tf = cammod.tan_half_fov(cam)
    ap = cam.aperture if cam.aperture is not None else jnp.float32(0.0)
    fd = cam.focus_dist if cam.focus_dist is not None else jnp.float32(0.0)
    look = jnp.linalg.norm(cam.target - cam.position)
    focus = jnp.where(fd > 0.0, fd, look)
    return jnp.concatenate([
        cam.position, forward, right, up,
        jnp.stack([tf * cam.aspect, tf,
                   jnp.asarray(ap, jnp.float32),
                   jnp.asarray(focus, jnp.float32)]),
    ]).reshape(1, 16).astype(jnp.float32)


@partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_depth", "jitter",
                     "enable_refraction", "gamma", "with_stats", "interpret",
                     "n_active", "rows", "n_tri_active", "enable_dof", "vma",
                     "nee", "stratify", "bounce_early_exit"),
)
def render_pallas(
    scene: SphereScene,
    cam: CameraP,
    seed: jnp.ndarray,
    width: int = 1920,
    height: int = 1080,
    spp: int = 4,
    max_depth: int = 4,
    jitter: bool = True,
    enable_refraction: bool = False,
    gamma: bool = True,
    with_stats: bool = False,
    interpret: bool = False,
    n_active: int | None = None,
    rows: int | None = None,
    row_offset=0,
    mesh=None,
    n_tri_active: int | None = None,
    enable_dof: bool = False,
    vma: tuple[str, ...] | None = None,
    nee: bool = False,
    stratify: bool = False,
    tile_mask: jnp.ndarray | None = None,
    bounce_early_exit: bool | None = None,
):
    """Fused single-chip render; returns (height, width, 3) f32 in [0, 1].

    v2 estimator, sphere scenes (bucket <= a few hundred unrolls), sqrt
    gamma. ``seed`` is an int32 scalar; frames advance it for progressive
    accumulation. ``n_active``: static count of real spheres (valid rows are
    packed first in the bucket) — the unrolled loop skips padding rows, a
    ~40% intersect saving on the 9-in-16 demo scene.

    Sharded use (tpu_rt.parallel): pass ``rows`` (static block height) and
    ``row_offset`` (dynamic global first row) to render a horizontal band of
    the full image, and ``gamma=False`` for a linear mean mergeable with
    psum across a sample axis.
    """
    from .intersect import attribute_matrix

    out_rows = height if rows is None else rows
    n_pix = width * out_rows
    n_tiles = pl.cdiv(n_pix, TILE)
    n_spheres = scene.capacity if n_active is None else max(1, n_active)
    if mesh is None:
        n_tris = 0
        tri_geo = jnp.zeros((1, 16), jnp.float32)
        tri_mat = jnp.zeros((1, 16), jnp.float32)
    else:
        n_tris = mesh.capacity if n_tri_active is None else max(1, n_tri_active)
        zero = jnp.zeros_like(mesh.ior)[:, None]
        tri_geo = jnp.concatenate(
            [mesh.v0, mesh.e1, mesh.e2, mesh.normal, zero, zero, zero, zero],
            axis=-1)
        tri_mat = jnp.concatenate(
            [mesh.albedo, mesh.metallic[:, None], mesh.roughness[:, None],
             mesh.emission, mesh.ior[:, None],
             zero, zero, zero, zero, zero, zero, zero], axis=-1)

    attr = attribute_matrix(scene)
    if nee:
        # Uniform pick over emissive spheres: per-row cdf rides the attr
        # pad column (15); the count rides the bg row. Scene edits change
        # only these VALUES — no recompile (same as every other attribute).
        em_max = jnp.max(scene.emission, axis=-1)
        is_light = scene.valid & (em_max > 0.0) & (scene.radius > 0.0)
        lw = is_light.astype(jnp.float32)
        n_lights = jnp.sum(lw)
        light_cdf = jnp.cumsum(lw) / jnp.maximum(n_lights, 1.0)
        attr = attr.at[:, 15].set(light_cdf)
    else:
        n_lights = jnp.float32(0.0)
    cam_packed = _pack_camera(cam)
    bg = jnp.concatenate(
        [scene.background, jnp.asarray(n_lights, jnp.float32)[None]]
    ).reshape(1, 4)
    pix_offset = jnp.asarray(row_offset, jnp.int32) * width
    seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32),
                          pix_offset]).reshape(2)

    adaptive = tile_mask is not None
    if bounce_early_exit is None:
        bounce_early_exit = BOUNCE_EARLY_EXIT
    kernel = _make_kernel(width, height, spp, max_depth, n_spheres,
                          n_tris=n_tris, jitter=jitter,
                          enable_refraction=enable_refraction, gamma=gamma,
                          hash_rng=interpret, enable_dof=enable_dof, nee=nee,
                          stratify=stratify, adaptive=adaptive,
                          bounce_early_exit=bounce_early_exit)
    inputs = [cam_packed, attr, tri_geo, tri_mat, bg, seed_arr]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # camera scalars
        pl.BlockSpec(memory_space=pltpu.SMEM),   # sphere attributes
        pl.BlockSpec(memory_space=pltpu.SMEM),   # triangle geometry
        pl.BlockSpec(memory_space=pltpu.SMEM),   # triangle materials
        pl.BlockSpec(memory_space=pltpu.SMEM),   # background
        pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
    ]
    if adaptive:
        # per-tile render mask (adaptive sampling): 0 = converged, skip
        inputs.append(jnp.asarray(tile_mask, jnp.int32).reshape(n_tiles))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    scratch_shapes = []
    if bounce_early_exit and max_depth >= 2:
        # bounce-state spill planes + segment counter for the per-tile
        # all-dead early exit (act/no_emit ride as 0/1 f32)
        scratch_shapes = [pltpu.VMEM((14, SUBLANES, LANES), jnp.float32),
                          pltpu.SMEM((1,), jnp.int32)]
    out, segs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        scratch_shapes=scratch_shapes,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (3, 1, SUBLANES, LANES), lambda t: (0, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # full-array SMEM block: grid steps run sequentially on TPU,
            # each program writes its own slot
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        # ``vma``: when called per-shard inside shard_map(check_vma=True),
        # the caller names the mesh axes the output varies over so the
        # sharding type checker can stay on (parallel/mesh.py).
        out_shape=(
            jax.ShapeDtypeStruct((3, n_tiles, SUBLANES, LANES), jnp.float32,
                                 vma=None if vma is None else frozenset(vma)),
            jax.ShapeDtypeStruct((n_tiles,), jnp.int32,
                                 vma=None if vma is None else frozenset(vma)),
        ),
        interpret=interpret,
    )(*inputs)

    img = out.reshape(3, n_tiles * TILE)[:, :n_pix]
    img = jnp.moveaxis(img, 0, -1).reshape(out_rows, width, 3)
    if with_stats:
        # padding-tile lanes trace rays too; report real-pixel segments by
        # scaling (bounded correction, exact when n_pix % TILE == 0)
        total = jnp.sum(segs)
        scale = n_pix / (n_tiles * TILE)
        return img, (total.astype(jnp.float32) * scale).astype(jnp.int32)
    return img
