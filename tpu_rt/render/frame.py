"""Frame rendering: pixel grid -> jittered rays -> integrator -> image.

TPU-native replacement for PathTracer::render
(cpp_raytracer/raytracer_core.cpp:354-416) and the v1 tiled renderer
(old/raytracer_core copy.cpp:257-318). The reference fans pixels out over
OpenMP threads; here the whole image is one wavefront per sample pass and
``lax.scan`` iterates samples-per-pixel, so arbitrary spp never holds more
than one wavefront of state (the same O(1)-memory trick the reference plays
with ``samples_per_batch``, interaction.py:589).

Outputs match the reference contract: per-batch image is the sample mean,
sqrt-gamma'd and clamped to [0, 1] (raytracer_core.cpp:398-409). A linear
(pre-gamma, unclamped) output is also available for the mathematically
correct progressive-accumulation mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cammod
from ..core.types import CameraP, SphereScene
from ..ops.integrator import trace


def _is_tpu_device(d) -> bool:
    # platform is the canonical field; the repr check additionally covers
    # plugin platforms whose .platform is the plugin name (e.g. the axon
    # tunnel registers devices printing "TPU v5 ..." under platform "axon")
    return (getattr(d, "platform", "") == "tpu"
            or "tpu" in str(d).lower())


def _on_tpu(scene) -> bool:
    """True when the scene's arrays live (or will live) on a TPU device."""
    try:
        devs = getattr(scene.center, "devices", None)
        if devs is not None:
            return any(_is_tpu_device(d) for d in devs())
    except Exception:
        pass
    dev = jax.config.jax_default_device
    if dev is not None:
        return _is_tpu_device(dev)
    return jax.default_backend() == "tpu"


_warned_lax_fallback = False


def _warn_lax_fallback(scene) -> None:
    """Auto-dispatch picked the general lax path for a Pallas-sized
    workload because the scene is not on a TPU — that is a ~19x slowdown
    at reference scale, so say it once instead of failing silently
    (VERDICT r2 weak #8)."""
    global _warned_lax_fallback
    if _warned_lax_fallback:
        return
    _warned_lax_fallback = True
    import warnings

    try:
        where = {d.platform for d in scene.center.devices()}
    except Exception:
        where = {jax.default_backend()}
    warnings.warn(
        "tpu_rt: engine='auto' resolved to the general lax pipeline "
        f"because the scene arrays live on {sorted(where)!r}, not a TPU. "
        "The fused Pallas engines are ~19x faster at reference scale; "
        "jax.device_put the scene on a TPU or pass engine= explicitly to "
        "silence this.",
        RuntimeWarning, stacklevel=3)


def _pallas_eligible(scene, mode, enable_refraction, gamma, mesh) -> bool:
    """The fused megakernel covers the production configuration: v2
    estimator, sphere scenes up to a modest bucket (the sphere loop is
    unrolled), sqrt-gamma output, on a TPU backend."""
    return (
        mode == "v2"
        and gamma
        and scene.capacity <= 64
        and (mesh is None or mesh.capacity <= 256)
        and _on_tpu(scene)
    )


def select_engine(scene, mode="v2", enable_refraction=False, gamma=True,
                  mesh=None, engine="auto") -> str:
    """Resolve the engine ``render`` will use for this configuration:
    "pallas" (fused megakernel, <= 64 spheres / 256 triangles), "cluster"
    (large-scene Pallas engine: Morton clusters + compacted box traversal,
    spheres and/or triangle meshes), or "lax" (general XLA pipeline)."""
    if engine not in ("auto", "pallas", "lax", "cluster"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine != "auto":
        return engine
    if _pallas_eligible(scene, mode, enable_refraction, gamma, mesh):
        return "pallas"
    if (mode == "v2" and gamma and _on_tpu(scene)
            and (scene.capacity > 64
                 or (mesh is not None and mesh.capacity > 256))):
        return "cluster"
    return "lax"


# Cluster-build memo: the Morton clustering is camera-independent and
# costs ~35 ms/frame at 10k primitives if redone per batch. JAX arrays are
# immutable, so identity of the scene's anchor array is a sound cache key —
# any scene edit produces new arrays and misses naturally. Weakrefs keep
# dead scenes from pinning device memory; capacity bounds the live set.
_CLUSTER_CACHE: list = []
_CLUSTER_CACHE_CAP = 4


def _cached_clusters(builder, obj, anchor, key):
    import weakref

    for ref, k, cl in _CLUSTER_CACHE:
        if k == key and ref() is anchor:
            return cl
    cl = builder(obj)
    try:
        _CLUSTER_CACHE.append((weakref.ref(anchor), key, cl))
        del _CLUSTER_CACHE[:-_CLUSTER_CACHE_CAP]
    except TypeError:
        pass  # anchor not weakref-able: skip caching
    return cl


# Ordered-prebuilt memo: the camera-dependent near-to-far permutation
# (pallas_cluster.order_clusters) must run EAGERLY, once per (prebuilt,
# camera-position) pair — in-graph it re-executes three argsorts plus
# full-table gathers every frame behind the miscompile-shield barrier
# (BENCH_r04: 7.2x on the 10k-sphere chained bench). Keyed first by array
# IDENTITY (prebuilt table + position array — zero device pulls when the
# interactive loop reuses its CameraP), falling back to the position's
# 12-byte value (one tiny D2H per new position array).
_ORDERED_CACHE: list = []
_ORDERED_CACHE_CAP = 8


def _cached_ordered(prebuilt, cam_pos):
    import weakref

    from ..ops.pallas_cluster import order_clusters

    anchor = prebuilt.attr
    for pre_ref, pos_ref, pos_bytes, ordered in _ORDERED_CACHE:
        if pre_ref() is anchor and pos_ref() is cam_pos:
            return ordered
    key = np.asarray(cam_pos).tobytes()
    for pre_ref, pos_ref, pos_bytes, ordered in _ORDERED_CACHE:
        if pre_ref() is anchor and pos_bytes == key:
            return ordered
    ordered = order_clusters(prebuilt, cam_pos)
    try:
        _ORDERED_CACHE.append(
            (weakref.ref(anchor), weakref.ref(cam_pos), key, ordered))
        del _ORDERED_CACHE[:-_ORDERED_CACHE_CAP]
    except TypeError:
        pass  # position not weakref-able: skip caching
    return ordered


def quantize_count(n: int, capacity: int) -> int:
    """Quantize an active-primitive count to the static kernel bucket.

    n_active is a STATIC kernel parameter: a new value means a fresh
    Mosaic compile. Small counts quantize to multiples of 4 (megakernel
    unroll groups); 65-256 to multiples of 16 (still megakernel range for
    triangles — a 512 quantum here would inflate the unrolled sweep to the
    full bucket); larger counts to multiples of 512 (cluster-engine scale,
    where n_active only bounds the table slice), so interactive add/remove
    only recompiles at group boundaries.
    """
    if not n:
        return 1
    n = int(n)
    if n > 256:
        return min(capacity, -512 * (-n // 512))
    if n > 64:
        return min(capacity, -16 * (-n // 16))
    return min(capacity, -4 * (-n // 4))


def render(
    scene: SphereScene,
    cam: CameraP,
    key: jax.Array,
    width: int = 640,
    height: int = 480,
    spp: int = 8,
    max_depth: int = 4,
    mode: str = "v2",
    enable_refraction: bool = False,
    gamma: bool = True,
    jitter: bool = True,
    with_stats: bool = False,
    mesh=None,
    engine: str = "auto",
    seed: int | None = None,
    use_bvh: bool = False,
    n_active: int | None = None,
    n_tri_active: int | None = None,
    enable_dof: bool | None = None,
    nee: bool = False,
    diffuse_sampling: str = "ball",
    stratify: bool = False,
    tile_mask=None,
):
    """Render one batch of ``spp`` samples; returns (height, width, 3) f32.

    ``jitter=False`` shoots rays through pixel centers — the deterministic
    mode used for golden-image parity tests against the C++ reference.
    ``with_stats=True`` additionally returns traced ray-segment count.
    ``mesh`` optionally adds a TriangleMesh to the scene (nearer surface
    wins per bounce). ``engine``: "auto" picks the fused Pallas megakernel
    when the configuration allows (v2 / spheres / gamma / TPU, <= 64
    primitives), the Pallas cluster engine past the megakernel bucket
    (large sphere scenes and triangle meshes), else the XLA lax pipeline;
    "pallas"/"cluster"/"lax" force one. ``seed``: optional host
    integer used by the pallas engine instead of deriving one from ``key``
    (saves device round-trips in interactive loops). ``use_bvh`` swaps the
    lax engine's dense sweeps for LBVH traversal of both geometries (the
    megakernel's fused unroll *is* the accelerated path at its scene sizes,
    so it ignores the flag). ``n_active``/``n_tri_active``: quantized active
    counts (quantize_count) cached by the caller — passing them avoids a
    device->host pull of scene.valid on every interactive batch.
    ``nee=True`` (v2 only) renders with next-event estimation — direct
    light via shadow rays at every diffuse hit — a much lower-variance
    estimator for the same scene. All three engines: the lax pipeline
    (ops/integrator.py), the fused megakernel (ops/pallas_megakernel.py),
    and the cluster engine (ops/pallas_cluster.py, shadow rays through a
    second pass of the compacted traversal), so large scenes keep their
    fast path.

    ``stratify=True`` replaces i.i.d. pixel jitter with the R2
    low-discrepancy lattice under a per-pixel Cranley-Patterson shift:
    each pixel's spp samples tile its footprint quasi-uniformly (lower AA
    variance at equal cost; same mean — each sample's marginal stays
    uniform). All three engines.

    ``tile_mask``: (n_tiles,) int32 adaptive-sampling mask — tiles with 0
    are skipped at ~zero cost and return zeros. Tile geometry is
    engine-specific: the megakernel uses linear 4096-pixel runs (merge
    with :func:`accumulate_tiled`), the cluster engine 32x128 screen
    blocks (:func:`cluster_tile_map` + :func:`accumulate_tiled_mapped`).
    Not available on the lax engine.
    """
    if enable_dof is None:
        # Auto-detect thin-lens DOF from the camera. The aperture is host
        # data in every interactive path (Camera.to_params builds CameraP
        # from floats), so this costs no device round-trip there; passing
        # a committed device camera with enable_dof unset pulls one scalar.
        ap = getattr(cam, "aperture", None)
        try:
            enable_dof = ap is not None and float(np.asarray(ap)) > 0.0
        except Exception:
            enable_dof = False

    resolved = select_engine(scene, mode, enable_refraction, gamma, mesh,
                             engine)
    if tile_mask is not None and resolved == "lax":
        raise ValueError(
            "tile_mask (adaptive sampling) is a Pallas-engine capability "
            "(megakernel: linear 4096-pixel tiles; cluster: 32x128 screen "
            f"blocks); this configuration resolves to engine={resolved!r}")
    # Warn (once) only when actually rendering: querying select_engine is
    # side-effect free, and forced engine= choices are deliberate.
    if (resolved == "lax" and engine == "auto" and mode == "v2" and gamma
            and not _on_tpu(scene)):
        _warn_lax_fallback(scene)
    if resolved in ("pallas", "cluster"):
        if seed is None:
            seed = jax.random.key_data(key).ravel()[-1].astype(jnp.int32)

        def _quantized_count(valid, capacity):
            # Fallback for direct library calls: one host pull per call.
            # Interactive callers cache the count at scene-build time.
            try:
                n = int(np.asarray(valid).sum())
            except Exception:
                return None
            return quantize_count(n, capacity)

        if n_active is None:
            n_active = _quantized_count(scene.valid, scene.capacity)
        if mesh is not None and n_tri_active is None:
            n_tri_active = _quantized_count(mesh.valid, mesh.capacity)

    if resolved == "cluster":
        from ..ops.pallas_cluster import (
            build_clusters, build_tri_clusters, ensure_distinct_tables,
            render_cluster)

        prebuilt = _cached_clusters(
            lambda s: build_clusters(s, n_active=n_active),
            scene, scene.center, ("sph", scene.capacity, n_active))
        tri_prebuilt = None
        if mesh is not None:
            # the pad must happen at this (eager, memoized) layer: a
            # same-shaped tri table costs ~12x in the kernel, and an
            # in-trace pad does not reach the fast path (see
            # ensure_distinct_tables)
            tri_prebuilt = _cached_clusters(
                lambda m: ensure_distinct_tables(
                    prebuilt, build_tri_clusters(m, n_active=n_tri_active)),
                mesh, mesh.v0,
                ("tri", mesh.capacity, n_tri_active,
                 prebuilt.attr.shape))
        # Hoist the camera-dependent near-to-far ordering out of the frame
        # (see _cached_ordered). Under an enclosing jit the camera position
        # is a tracer — fall back to in-graph ordering there (correct, but
        # per-frame; production interactive/bench callers are eager).
        pre_ordered = not isinstance(cam.position, jax.core.Tracer)
        if pre_ordered:
            prebuilt = _cached_ordered(prebuilt, cam.position)
            if tri_prebuilt is not None:
                tri_prebuilt = _cached_ordered(tri_prebuilt, cam.position)
        return render_cluster(
            scene, cam, seed, width=width, height=height, spp=spp,
            max_depth=max_depth, jitter=jitter,
            enable_refraction=enable_refraction, gamma=gamma,
            with_stats=with_stats, n_active=n_active,
            mesh=mesh, n_tri_active=n_tri_active, enable_dof=enable_dof,
            prebuilt=prebuilt, tri_prebuilt=tri_prebuilt,
            nee=nee, stratify=stratify, tile_mask=tile_mask,
            pre_ordered=pre_ordered,
        )
    if resolved == "pallas":
        from ..ops.pallas_megakernel import render_pallas
        return render_pallas(
            scene, cam, seed, width=width, height=height, spp=spp,
            max_depth=max_depth, jitter=jitter,
            enable_refraction=enable_refraction, with_stats=with_stats,
            n_active=n_active, mesh=mesh, n_tri_active=n_tri_active,
            enable_dof=enable_dof, nee=nee, stratify=stratify,
            tile_mask=tile_mask,
        )
    return _render_lax(
        scene, cam, key, width=width, height=height, spp=spp,
        max_depth=max_depth, mode=mode, enable_refraction=enable_refraction,
        gamma=gamma, jitter=jitter, with_stats=with_stats, mesh=mesh,
        use_bvh=use_bvh, enable_dof=enable_dof, nee=nee,
        diffuse_sampling=diffuse_sampling, stratify=stratify,
    )


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_depth", "mode",
        "enable_refraction", "gamma", "jitter", "with_stats", "use_bvh",
        "enable_dof", "nee", "diffuse_sampling", "stratify",
    ),
)
def _render_lax(
    scene, cam, key, *, width, height, spp, max_depth, mode,
    enable_refraction, gamma, jitter, with_stats, mesh, use_bvh=False,
    enable_dof=False, nee=False, diffuse_sampling="ball", stratify=False,
):
    """XLA lax render pipeline (general path: any estimator mode, meshes,
    linear output, CPU backends)."""
    R = height * width

    if jitter and stratify:
        # R2 lattice + per-pixel Cranley-Patterson shift (same scheme as
        # the megakernel — ops/pallas_megakernel.py R2_ALPHA_*)
        cp_shift = jax.random.uniform(jax.random.fold_in(key, 0x7FFFABCD),
                                      (height, width, 2), dtype=jnp.float32)
        r2_alpha = jnp.array([0.7548776662466927, 0.5698402909980532],
                             jnp.float32)

    def sample_pass(carry, s):
        acc, segs = carry
        k_s = jax.random.fold_in(key, s)
        k_jit, k_trace = jax.random.split(k_s)
        if jitter and stratify:
            xi = cp_shift + s.astype(jnp.float32) * r2_alpha
            xi = xi - jnp.floor(xi)
        elif jitter:
            xi = jax.random.uniform(k_jit, (height, width, 2), dtype=jnp.float32)
        else:
            xi = None
        u, v = cammod.pixel_uv(width, height, xi)
        if enable_dof:
            lens = jax.random.uniform(jax.random.fold_in(k_s, 7),
                                      (R, 2), dtype=jnp.float32)
        else:
            lens = None
        o, d = cammod.generate_rays(cam, u.reshape(R), v.reshape(R),
                                    lens_xi=lens)
        color, nseg = trace(
            scene, o, d, k_trace,
            max_depth=max_depth, mode=mode,
            enable_refraction=enable_refraction, with_stats=True,
            mesh=mesh, use_bvh=use_bvh, nee=nee,
            diffuse_sampling=diffuse_sampling,
        )
        return (acc + color, segs + nseg), None

    (acc, segments), _ = jax.lax.scan(
        sample_pass,
        (jnp.zeros((R, 3), jnp.float32), jnp.int32(0)),
        jnp.arange(spp, dtype=jnp.int32),
    )
    img = acc.reshape(height, width, 3) / spp
    if gamma:
        # Fast sqrt gamma + clamp (raytracer_core.cpp:400-409).
        img = jnp.clip(jnp.sqrt(jnp.maximum(img, 0.0)), 0.0, 1.0)
    if with_stats:
        return img, segments
    return img


def tone_map(image: jnp.ndarray, exposure: float) -> jnp.ndarray:
    """Reinhard tone map x*e / (1 + x*e), clamped
    (RayTracerInteraction._tone_map, interaction.py:1435-1439)."""
    image = image * exposure
    image = image / (1.0 + image)
    return jnp.clip(image, 0.0, 1.0)


def enhance_contrast(image: jnp.ndarray) -> jnp.ndarray:
    """Percentile 2-98 contrast stretch
    (RayTracerInteraction._enhance_display, interaction.py:1441-1449)."""
    lo = jnp.percentile(image, 2.0)
    hi = jnp.percentile(image, 98.0)
    stretched = jnp.clip((image - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
    return jnp.where(hi > lo, stretched, image)


@jax.jit
def _weighted_merge(acc, batch, w_old, w_new):
    # one fused device op; weights are traced scalars (no retrace per batch)
    return acc * w_old + batch * w_new


# ---- adaptive tile sampling (beyond-reference) -----------------------------
# The megakernel renders in 4096-ray tiles (ops/pallas_megakernel.TILE); the
# progressive loop can stop sampling tiles whose accumulated image has
# converged (render_pallas(tile_mask=...) skips them at ~zero cost). These
# helpers keep the per-tile bookkeeping on device: a weighted merge with
# PER-TILE sample counts, and the per-tile change metric the controller
# thresholds on. One small (n_tiles,) pull per batch.

def _pixel_weights(tile_vals, n_pix, shape3):
    """(n_tiles,) per-tile values -> (h, w, 1) per-pixel plane (tiles are
    contiguous runs of TILE pixels in scan order)."""
    from ..ops.pallas_megakernel import TILE

    per_pix = jnp.repeat(tile_vals, TILE)[:n_pix]
    return per_pix.reshape(shape3[0], shape3[1], 1)


@partial(jax.jit, static_argnames=("tile_px",))
def accumulate_tiled(acc, counts, batch, tile_mask, n_new, tile_px):
    """Per-tile progressive merge: active tiles blend batch in by their
    sample counts, converged tiles keep their accumulated value.

    acc: (h, w, 3); counts: (n_tiles,) f32 samples accumulated per tile;
    batch: (h, w, 3) from render_pallas(tile_mask=...) (zeros in masked
    tiles); tile_mask: (n_tiles,) int32. Returns (acc', counts',
    tile_change) where tile_change is the mean |batch - acc| per ACTIVE
    tile (the convergence metric, matching the app's noise_target scale).
    """
    h, w, _ = acc.shape
    n_pix = h * w
    on = tile_mask.astype(jnp.float32)
    new_counts = counts + on * n_new
    w_new = jnp.where(new_counts > 0, n_new / jnp.maximum(new_counts, 1.0),
                      0.0) * on
    w_px = _pixel_weights(w_new, n_pix, (h, w))
    acc_new = acc + (batch - acc) * w_px

    diff = jnp.mean(jnp.abs(batch - acc), axis=-1).reshape(-1)
    pad = counts.shape[0] * tile_px - n_pix
    diff = jnp.concatenate([diff, jnp.zeros((pad,), diff.dtype)])
    tile_change = diff.reshape(counts.shape[0], tile_px).mean(axis=-1)
    return acc_new, new_counts, tile_change * on


def cluster_tile_map(width: int, height: int):
    """Pixel -> tile-id map for the CLUSTER engine's adaptive masks.

    The cluster engine renders 32x128-pixel screen blocks (row-major over
    ceil(h/32) x ceil(w/128) blocks — ops/pallas_cluster.py), unlike the
    megakernel's linear 4096-pixel runs. Returns ((h, w) int32 map,
    n_tiles); pair with :func:`accumulate_tiled_mapped`.
    """
    from ..ops.pallas_cluster import LANES, SUBLANES

    bx = -(-width // LANES)
    by = -(-height // SUBLANES)
    ys = jnp.arange(height, dtype=jnp.int32) // SUBLANES
    xs = jnp.arange(width, dtype=jnp.int32) // LANES
    return ys[:, None] * bx + xs[None, :], bx * by


@partial(jax.jit, static_argnames=("n_tiles",))
def accumulate_tiled_mapped(acc, counts, batch, tile_mask, n_new, tile_map,
                            n_tiles):
    """Per-tile progressive merge for an arbitrary pixel->tile map — the
    cluster-engine counterpart of :func:`accumulate_tiled` (whose tiles
    are linear pixel runs). Same contract: returns (acc', counts',
    tile_change) with tile_change the mean |batch - acc| per ACTIVE tile.
    """
    on = tile_mask.astype(jnp.float32)
    new_counts = counts + on * n_new
    w_new = jnp.where(new_counts > 0, n_new / jnp.maximum(new_counts, 1.0),
                      0.0) * on
    w_px = w_new[tile_map][..., None]
    acc_new = acc + (batch - acc) * w_px

    diff = jnp.mean(jnp.abs(batch - acc), axis=-1)
    flat_map = tile_map.reshape(-1)
    sums = jnp.zeros((n_tiles,), jnp.float32).at[flat_map].add(
        diff.reshape(-1))
    cnts = jnp.zeros((n_tiles,), jnp.float32).at[flat_map].add(1.0)
    tile_change = sums / jnp.maximum(cnts, 1.0)
    return acc_new, new_counts, tile_change * on


def accumulate(
    accumulated: jnp.ndarray | None,
    total_samples: int,
    batch: jnp.ndarray,
    batch_samples: int,
):
    """Progressive weighted merge old*w0 + new*w1.

    Exactly the reference's accumulation (interaction.py:1311-1325) —
    including its quirk of averaging *post-gamma* batches, which is the
    behavioral contract the GUI expects. The single device-side merge for
    the interactive loop (the accumulator never visits the host).
    """
    if accumulated is None or total_samples == 0:
        return batch, batch_samples
    total_new = total_samples + batch_samples
    return _weighted_merge(accumulated, batch, total_samples / total_new,
                           batch_samples / total_new), total_new
