"""Pallas TPU cluster engine: the scalable large-scene path tracer.

The fused megakernel (tpu_rt.ops.pallas_megakernel) unrolls every primitive
into the instruction stream — unbeatable below ~64 primitives, impossible at
10k. This engine is the TPU-native answer to the reference's BVH traversal
(SceneIntersector::intersect, cpp_raytracer/raytracer_core.cpp:191-273) for
large scenes, designed around what the hardware can and cannot do:

  * Per-ray pointer-chasing traversal is hostile to a vector machine: each
    step is a dependent gather. Instead, primitives are **Morton-sorted and
    grouped into clusters of C** with precomputed AABBs — a two-level wide
    "BVH" whose topology is implicit (dense cluster list), so traversal is
    a data-independent loop the compiler can schedule.
  * Rays are tiled into (32, 128)-pixel **screen blocks** (not row runs):
    a compact frustum means a tile's rays cross few cluster boxes, and
    bounce rays originate from a compact footprint, keeping the per-tile
    crossing union small for the thin scenes path tracing actually renders.
  * Traversal is two compacted phases, sized by measured scalar-core costs
    (a fori_loop iteration is ~86 ns, a vector->scalar any() sync ~130 ns):
    phase A slab-tests only the S super-boxes (unions of FANOUT children)
    and compacts the crossed ones into an SMEM list; phase B's dynamic trip
    count is crossed_supers x FANOUT, each visit child-slab-testing before
    the `pl.when`-guarded sweep. Supers and children are stored near-to-far
    from the camera, so early sweeps shrink best_t and the running-t slab
    bound prunes the far boxes — the reference's closest-t stack pruning
    (raytracer_core.cpp:212-217), amortized to storage order.
  * Each crossed cluster's attribute block is DMA'd (double-buffered, one
    lane-aligned (rows, 128) tile) into SMEM scratch so the unrolled
    C-primitive sweep reads at STATIC offsets — dynamic-index VMEM scalar
    loads measure ~45 ns each and dominate everything if used instead.
  * Shading attributes are packed as bf16 pairs (5 words instead of 9
    floats): fewer winner selects per primitive and 10 instead of 14
    best-state planes.
  * A handful of **global primitives** (the largest spheres — e.g. the
    ground sphere, whose box would cover the whole scene and defeat
    culling) are swept densely for every ray, exactly like the megakernel.
  * Best-hit state lives in VMEM scratch planes so the `pl.when` bodies can
    mutate it in place (fori carries cannot cross a `when`).
  * spp is a **revisited grid dimension** (out block accumulates across the
    innermost grid axis) rather than an in-kernel loop — Mosaic rejects
    nested fori_loops, and the traversal needs the loop level.

Estimator: v2 reference semantics, identical to the megakernel
(PathTracer::trace_ray, raytracer_core.cpp:291-351). Measured (TPU v5e,
1080p @ 4 spp depth 4, random-spheres field, cluster build cached across
frames — the ``prebuilt`` path render/frame.py uses — and the bounce-1
primary-cone scalar scan): 761 traced Mrays/s at N=1k, 434 at N=10k,
123 at N=100k — vs ~3 Mrays/s for the dense megakernel sweep
extrapolated to 10k.

Triangle meshes cluster the same way (build_tri_clusters): their own
two-level box hierarchy traversed after the sphere phase, a Moller-Trumbore
sweep at static SMEM offsets, and the largest-AREA triangles (ground quads)
in the dense global sweep. The winning triangle's ray-opposing normal is
encoded into the sphere best-hit planes (c = hit - n, ir = +/-1) so the
shared shading path needs no extra state. Measured (same workload, terrain
heightfield): 177 traced Mrays/s at 1k tris, 238 at 10k, 105 at 100k — the
general lax mesh path needs 1.4 s for a 14-triangle Cornell box.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import CameraP, SphereScene, T_MAX
from .bvh import morton_codes
from .pallas_megakernel import (
    R2_ALPHA_U,
    R2_ALPHA_V,
    TWO_PI,
    _hash_uniform,
    _normalize3,
    _dot3,
    _pack_camera,
    _rsqrt_safe,
    _uniform,
    _unit_ball_from,
)

SUBLANES = 32
LANES = 128
TILE = SUBLANES * LANES  # rays per program (one 32x128 pixel block)

# Defaults chosen by crossover measurement (benchmarks/bench_scenes.py).
DEFAULT_CLUSTER = 64
DEFAULT_GLOBAL = 4
# Children per super-cluster: the traversal loop iterates supers only (a
# fori_loop iteration costs ~150-300 ns of scalar-core overhead — measured —
# so iterations must shrink 8x; children are a static unroll inside the
# super's pl.when).
FANOUT = 8

BIG = jnp.float32(3.0e38)


class ClusteredScene(NamedTuple):
    """Morton-clustered sphere scene, ready for the cluster kernel.

    Three implicit hierarchy levels (VERDICT r2 item 2 — the next scale
    decade): K clusters of C primitives, S = K/FANOUT super-boxes, and
    S2 = S/FANOUT super-super boxes, so the per-bounce scan is
    O(S2 + crossed) instead of O(S) — at 1M primitives S ~ 2000 would
    otherwise dominate every frame (the reference's O(log N) stack walk,
    raytracer_core.cpp:191-273, amortized to three data-independent
    levels a vector machine can schedule).

    glob_attr: (G, 16) the G largest spheres (dense sweep, SMEM)
    boxes:     (K, 8) cluster AABBs [minx,miny,minz,maxx,maxy,maxz,pad,pad]
               (host-side companion for ordering/tests; the kernel reads
               each cluster's box from the LAST ROW of its attr block)
    attr:      (K, C*16/128 + 1, 128) field-major blocks; the extra row
               carries the cluster AABB in lanes 0-5 so phase B needs no
               SMEM-resident child-box table; padding rows have
               inv_r == 0 (never hit)

    glob_attr and attr are INT32 word tables (f32/bf16-pair bits): the
    packed words include f32 denormals that float handling could flush
    (see _pack_bf16_pair); the kernel reads them via Ref.bitcast views.
    """

    glob_attr: jnp.ndarray
    boxes: jnp.ndarray        # (S*FANOUT, 8) child cluster AABBs
    super_boxes: jnp.ndarray  # (S, 8) super-cluster AABBs (union of children)
    ss_boxes: jnp.ndarray     # (S/FANOUT, 8) super-super AABBs
    attr: jnp.ndarray         # (S*FANOUT, C*16/128 + 1, 128) blocks + box row
    background: jnp.ndarray

    @property
    def n_global(self) -> int:
        return self.glob_attr.shape[0]

    @property
    def n_supers(self) -> int:
        return self.super_boxes.shape[0]

    @property
    def n_ss(self) -> int:
        return self.ss_boxes.shape[0]

    @property
    def n_clusters(self) -> int:
        return self.boxes.shape[0]

    @property
    def cluster_size(self) -> int:
        return (self.attr.shape[1] - 1) * LANES // 16


def _pack_bf16_pair(a, b):
    """Pack two f32 arrays into one INT32 word as bf16 halves (round to
    nearest). Shading attributes tolerate bf16 (~0.4% rel); halving the
    attribute columns cuts per-primitive winner selects and best-state
    planes from 14 to 10 — a measured ~15% sweep saving.

    The word lives in the INTEGER domain for the table's whole lifetime:
    a pair whose high half is zero (e.g. (eb, -) for an emissive sphere,
    (ab, met) for any diffuse one) bitcasts to an f32 DENORMAL, and any
    XLA stage that handles the table as float can flush it — arithmetic-
    lowered concatenates (measured: jnp.stack of such a word returns 0x0
    on XLA:CPU), and f32 literal embedding when a caller closure-captures
    a prebuilt table inside jit (measured on TPU: every denormal word
    zeroed). int32 tables are immune; the kernel reads them through
    zero-cost Ref.bitcast(f32) views (_finish_hierarchy)."""
    def to_bf16_bits(x):
        bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
        rounded = bits + 0x7FFF + ((bits >> 16) & 1)
        return rounded >> 16

    word = (to_bf16_bits(b) << 16) | to_bf16_bits(a)
    return word.astype(jnp.uint32).astype(jnp.int32)


def _f32_bits(x):
    """Bitcast f32 -> int32 (geometry columns join the packed words in the
    integer domain during table assembly; see _pack_bf16_pair)."""
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _bits_f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _pack_attr_cols(attr):
    """(N, 16) full-precision attribute rows -> packed layout AS INT32
    WORDS: cols 0-2 center, 3 radius, 4 inv_r, 5 (ar,ag), 6 (ab,met),
    7 (rgh,ior), 8 (er,eg), 9 (eb,-), 10-15 pad. Tables stay int32 at
    rest (see _pack_bf16_pair); the kernel reads f32 views."""
    zeros = jnp.zeros_like(attr[:, 0])
    zbits = _f32_bits(zeros)
    packed = jnp.stack([
        _f32_bits(attr[:, 0]), _f32_bits(attr[:, 1]), _f32_bits(attr[:, 2]),
        _f32_bits(attr[:, 3]), _f32_bits(attr[:, 14]),
        _pack_bf16_pair(attr[:, 4], attr[:, 5]),
        _pack_bf16_pair(attr[:, 6], attr[:, 7]),
        _pack_bf16_pair(attr[:, 8], attr[:, 12]),
        _pack_bf16_pair(attr[:, 9], attr[:, 10]),
        _pack_bf16_pair(attr[:, 11], zeros),
        zbits, zbits, zbits, zbits, zbits, zbits,
    ], axis=-1)
    return packed


@partial(jax.jit, static_argnames=("cluster_size", "n_global", "n_active"))
def build_clusters(
    scene: SphereScene,
    cluster_size: int = DEFAULT_CLUSTER,
    n_global: int = DEFAULT_GLOBAL,
    n_active: int | None = None,
) -> ClusteredScene:
    """On-device preprocessing: sort by radius (largest G go global), Morton-
    order the rest into clusters of C, compute cluster AABBs.

    Pure XLA — scene edits re-cluster without host round-trips (the same
    contract as the LBVH build, SURVEY.md §7 step 5). ``n_active`` bounds
    the padded bucket to a static count (quantized by the caller).
    """
    from .intersect import attribute_matrix

    # keep the argsort->gather chain out of the TPU constant folder, which
    # mis-folds multi-dim gathers (see _order_near_to_far); no-op when the
    # scene arrives as a computation parameter (every eager call)
    scene = jax.lax.optimization_barrier(scene)
    n = scene.capacity if n_active is None else n_active
    scene = jax.tree.map(lambda a: a[:n] if a.ndim >= 1 and
                         a.shape[0] == scene.capacity else a, scene)
    C = cluster_size
    if (C * 16) % LANES != 0:
        raise ValueError("cluster_size must be a multiple of 8")
    G = min(n_global, n)

    valid = scene.valid
    # Global set: the G largest valid spheres (ground etc. — boxes that
    # would span the scene). argsort on (-radius, invalid-last).
    radius_key = jnp.where(valid, scene.radius, -1.0)
    order_by_r = jnp.argsort(-radius_key)
    glob_idx = order_by_r[:G]
    attr_full = attribute_matrix(scene)  # (n, 16)
    glob_attr = attr_full[glob_idx]
    # Invalid rows in the global set must never hit: zero their inv_r col.
    glob_ok = valid[glob_idx]
    glob_attr = glob_attr.at[:, 14].set(
        jnp.where(glob_ok, glob_attr[:, 14], 0.0))
    glob_attr = _pack_attr_cols(glob_attr)

    # Rest: mask out the globals, Morton-sort the remainder.
    is_global = jnp.zeros((n,), bool).at[glob_idx].set(True)
    rest = valid & ~is_global
    code = morton_codes(scene.center, rest)  # invalid -> max code (tail)
    order = jnp.argsort(code)

    m = n  # sorted list length (tail is padding)
    K = max(1, -(-m // C))
    # pad cluster count to full super-supers (FANOUT^2 clusters)
    K = -(-K // (FANOUT * FANOUT)) * (FANOUT * FANOUT)
    pad = K * C - m
    order_p = jnp.pad(order, (0, pad))  # padded rows point anywhere...
    rest_p = jnp.pad(rest[order], (0, pad))  # ...but are masked here

    rows_f = attr_full[order_p]
    # padding/non-rest rows: inv_r = 0 -> the sweep's `ok` test fails
    rows_f = rows_f.at[:, 14].set(jnp.where(rest_p, rows_f[:, 14], 0.0))
    attr = _pack_attr_cols(rows_f)  # int32 words until _finish_hierarchy

    c = rows_f[:, 0:3].reshape(K, C, 3)
    r = rows_f[:, 3].reshape(K, C, 1)
    ok = rest_p.reshape(K, C, 1)
    lo = jnp.min(jnp.where(ok, c - r, BIG), axis=1)
    hi = jnp.max(jnp.where(ok, c + r, -BIG), axis=1)
    return _finish_hierarchy(glob_attr, attr, lo, hi, K, C,
                             scene.background)


def _finish_hierarchy(glob_attr, attr, lo, hi, K, C, background):
    """Shared builder tail: child/super/super-super boxes from per-cluster
    bounds, and field-major DMA blocks with the cluster box appended as a
    final row.

    Field-major (K, C*16/128 + 1, 128) DMA blocks: one lane-aligned tile
    per cluster, copied whole into SMEM scratch so the sweep reads at
    STATIC offsets (dynamic-index VMEM scalar loads measure ~45 ns each
    and dominate everything; static SMEM reads are near-free). The last
    row carries this cluster's AABB in lanes 0-5: phase B tests the child
    box from the just-DMA'd block, so no O(K) box table rides in SMEM —
    at 1M primitives K ~ 15k would need ~500 KB of SMEM otherwise.
    """
    # Col 6 of every box row is a VALIDITY flag (1 = non-empty). Empty
    # padding boxes are inverted sentinels (lo=BIG, hi=-BIG) which the
    # vector slab test treats as ALWAYS CROSSED (min/max of the two slab
    # t's is corner-order-blind, so every axis yields (-inf, +inf)) — at
    # small N, where K pads up to a full super-super (FANOUT^2 clusters),
    # the junk sweeps dominated whole frames (measured 48x on a 1k-tri
    # terrain at depth 4). Every traversal test ANDs this flag.
    def _flag(lo_a, hi_a):
        return (lo_a[:, 0] <= hi_a[:, 0]).astype(jnp.float32)[:, None]

    boxes = jnp.concatenate(
        [lo, hi, _flag(lo, hi), jnp.zeros((K, 1), jnp.float32)], axis=-1)
    # Super boxes: union over each FANOUT-group of children; empty children
    # carry inverted boxes (lo=BIG, hi=-BIG), so min/max unions stay
    # correct. Same one level up for the super-supers.
    S = K // FANOUT
    s_lo = jnp.min(lo.reshape(S, FANOUT, 3), axis=1)
    s_hi = jnp.max(hi.reshape(S, FANOUT, 3), axis=1)
    super_boxes = jnp.concatenate(
        [s_lo, s_hi, _flag(s_lo, s_hi), jnp.zeros((S, 1), jnp.float32)],
        axis=-1)
    S2 = S // FANOUT
    ss_lo = jnp.min(s_lo.reshape(S2, FANOUT, 3), axis=1)
    ss_hi = jnp.max(s_hi.reshape(S2, FANOUT, 3), axis=1)
    ss_boxes = jnp.concatenate(
        [ss_lo, ss_hi, _flag(ss_lo, ss_hi), jnp.zeros((S2, 1), jnp.float32)],
        axis=-1)

    # attr and glob_attr arrive as INT32 word tables (_pack_attr_cols /
    # _tri_attr_rows) and STAY int32 at rest: bf16-pair words with a zero
    # high half (met=0, the (eb,-) column, ...) are f32 DENORMALS, and any
    # XLA stage that treats the table as float data can flush them —
    # arithmetic-lowered concatenates during the build (the round-2
    # "emissive loses eb" bug), and, worse, LITERAL EMBEDDING: a caller
    # that closure-captures a prebuilt ClusteredScene inside an outer jit
    # turns the table into a compile-time constant, and the f32 literal
    # path flushes every denormal word (measured: -25% image mean on the
    # demo scene — all emission lost). Integer tables are immune; the
    # kernel reinterprets them with zero-cost Ref.bitcast views.
    attr_blocks = attr.reshape(K, C, 16)
    attr_blocks = jnp.transpose(attr_blocks, (0, 2, 1))  # (K, 16, C)
    attr_blocks = attr_blocks.reshape(K, (C * 16) // LANES, LANES)
    box_row = jnp.zeros((K, 1, LANES), jnp.float32)
    box_row = box_row.at[:, 0, 0:7].set(boxes[:, 0:7])
    attr_blocks = jnp.concatenate([attr_blocks, _f32_bits(box_row)], axis=1)
    return ClusteredScene(glob_attr=glob_attr,
                          attr=attr_blocks, boxes=boxes,
                          super_boxes=super_boxes, ss_boxes=ss_boxes,
                          background=background)


def _tri_attr_rows(mesh) -> jnp.ndarray:
    """Packed (T, 16) triangle rows for the cluster sweep.

    Cols 0-8: v0, e1, e2 in full f32 (geometry precision matters for the
    Moller-Trumbore determinant); 9-15 bf16 pairs: (nx,ny), (nz,-),
    (ar,ag), (ab,met), (rgh,ior), (er,eg), (eb,-). Invalid rows get
    e1 = e2 = 0, which forces det == 0 in the sweep — triangles need no
    explicit validity column.
    """
    okf = mesh.valid[:, None]
    e1 = jnp.where(okf, mesh.e1, 0.0)
    e2 = jnp.where(okf, mesh.e2, 0.0)
    z = jnp.zeros_like(mesh.ior)

    def pair(a, b):
        return _pack_bf16_pair(a, b)[:, None]

    # int32 assembly, int32 at rest (see _pack_bf16_pair on FTZ vs
    # denormal packed words)
    return jnp.concatenate([
        _f32_bits(mesh.v0), _f32_bits(e1), _f32_bits(e2),
        pair(mesh.normal[:, 0], mesh.normal[:, 1]),
        pair(mesh.normal[:, 2], z),
        pair(mesh.albedo[:, 0], mesh.albedo[:, 1]),
        pair(mesh.albedo[:, 2], mesh.metallic),
        pair(mesh.roughness, mesh.ior),
        pair(mesh.emission[:, 0], mesh.emission[:, 1]),
        pair(mesh.emission[:, 2], z),
    ], axis=-1)


@partial(jax.jit, static_argnames=("cluster_size", "n_global", "n_active"))
def build_tri_clusters(
    mesh,
    cluster_size: int = DEFAULT_CLUSTER,
    n_global: int = 2,
    n_active: int | None = None,
) -> ClusteredScene:
    """Morton-cluster a TriangleMesh for the cluster kernel (the triangle
    analogue of build_clusters; same two-level box hierarchy and field-major
    DMA blocks). The ``n_global`` largest-AREA triangles (ground quads etc.,
    whose boxes would span the scene and defeat culling) go to the dense
    per-ray global sweep."""
    # same constant-folder shield as build_clusters (see _order_near_to_far)
    mesh = jax.lax.optimization_barrier(mesh)
    n = mesh.capacity if n_active is None else n_active
    mesh = jax.tree.map(lambda a: a[:n] if a.ndim >= 1 and
                        a.shape[0] == mesh.capacity else a, mesh)
    C = cluster_size
    if (C * 16) % LANES != 0:
        raise ValueError("cluster_size must be a multiple of 8")
    G = min(n_global, n)

    valid = mesh.valid
    rows_full = _tri_attr_rows(mesh)  # (n, 16)
    v1 = mesh.v0 + mesh.e1
    v2 = mesh.v0 + mesh.e2
    tri_min = jnp.minimum(mesh.v0, jnp.minimum(v1, v2))
    tri_max = jnp.maximum(mesh.v0, jnp.maximum(v1, v2))

    area = jnp.linalg.norm(jnp.cross(mesh.e1, mesh.e2), axis=-1)
    area_key = jnp.where(valid, area, -1.0)
    glob_idx = jnp.argsort(-area_key)[:G]
    glob_attr = rows_full[glob_idx]
    # invalid rows in the global set must never hit: zero their edges
    # (rows are int32 words; int 0 bitcasts to f32 0.0)
    glob_ok = valid[glob_idx][:, None]
    glob_attr = glob_attr.at[:, 3:9].set(
        jnp.where(glob_ok, glob_attr[:, 3:9], 0))

    is_global = jnp.zeros((n,), bool).at[glob_idx].set(True)
    rest = valid & ~is_global
    centroid = (tri_min + tri_max) * 0.5
    code = morton_codes(centroid, rest)
    order = jnp.argsort(code)

    m = n
    K = max(1, -(-m // C))
    K = -(-K // (FANOUT * FANOUT)) * (FANOUT * FANOUT)
    pad = K * C - m
    order_p = jnp.pad(order, (0, pad))
    rest_p = jnp.pad(rest[order], (0, pad))

    attr = rows_full[order_p]
    attr = attr.at[:, 3:9].set(
        jnp.where(rest_p[:, None], attr[:, 3:9], 0))

    lo_rows = tri_min[order_p]
    hi_rows = tri_max[order_p]
    ok = rest_p.reshape(K, C, 1)
    lo = jnp.min(jnp.where(ok, lo_rows.reshape(K, C, 3), BIG), axis=1)
    hi = jnp.max(jnp.where(ok, hi_rows.reshape(K, C, 3), -BIG), axis=1)
    return _finish_hierarchy(glob_attr, attr, lo, hi, K, C,
                             jnp.zeros((3,), jnp.float32))


def _pad_empty_block(cl: ClusteredScene) -> ClusteredScene:
    """Append one FANOUT^2 block of EMPTY clusters (inverted boxes, flag 0,
    all-zero attr rows) to a clustered scene. Shifts every table shape by
    one super-super while changing no render output: empty supers fail
    every phase-A test, so the padding is never visited. Used to keep the
    sphere and triangle attr tables differently shaped (see render_cluster;
    identically-shaped tables defeat DMA disambiguation and serialize the
    visit loop ~12x)."""
    F2 = FANOUT * FANOUT
    rows, lanes = cl.attr.shape[1], cl.attr.shape[2]
    empty_box = jnp.concatenate([
        jnp.full((3,), BIG, jnp.float32),
        jnp.full((3,), -BIG, jnp.float32),
        jnp.zeros((2,), jnp.float32)])
    return cl._replace(
        attr=jnp.concatenate(
            [cl.attr, jnp.zeros((F2, rows, lanes), cl.attr.dtype)]),
        boxes=jnp.concatenate(
            [cl.boxes, jnp.broadcast_to(empty_box, (F2, 8))]),
        super_boxes=jnp.concatenate(
            [cl.super_boxes, jnp.broadcast_to(empty_box, (FANOUT, 8))]),
        ss_boxes=jnp.concatenate([cl.ss_boxes, empty_box[None, :]]),
    )


def ensure_distinct_tables(sph: ClusteredScene,
                           tri: ClusteredScene) -> ClusteredScene:
    """Return ``tri``, padded by one empty super-super block iff its attr
    table shape equals the sphere scene's.

    MEASURED PATHOLOGY (TPU v5e, 2026-08): when the sphere and triangle
    attribute tables reach the cluster kernel with IDENTICAL shapes, the
    compiler can no longer disambiguate the two dynamic-index DMA streams
    into the shared SMEM scratch and the cluster-visit loop slows ~12x
    (1058-tri terrain + demo spheres, both tables (64, 9, 128): 215
    ms/frame vs 18 ms with any differing cluster count; bit-identical
    output). Padding one table with a FANOUT^2 block of empty (flag-0)
    clusters breaks the tie at ~zero cost: empty supers never pass phase
    A, so the padding is never DMA'd or swept.

    Call this EAGERLY (concrete arrays) on prebuilt tables before passing
    them into a jit-wrapped render: a traced in-graph pad keeps the slow
    path (measured 220 ms) — the distinct shape must exist at the
    compiled computation's parameter level.
    """
    if tri.attr.shape == sph.attr.shape:
        return _pad_empty_block(tri)
    return tri


def _order_near_to_far(cl: ClusteredScene, cam_pos) -> ClusteredScene:
    """Permute supers (and children within each super) by distance from the
    camera. The traversal visits the compacted crossed list in storage
    order, so near-to-far storage gives approximate front-to-back traversal:
    early sweeps shrink best_t and the running-t slab bound prunes the far
    boxes — the same closest-t pruning the reference's stack walk does
    per-node (raytracer_core.cpp:212-217), amortized to the frame level.
    Camera distance is exact for primary rays and a good proxy for bounce
    rays (their origins lie on primary hit points).

    PERF: run this EAGERLY, once per (prebuilt, camera) pair, and pass the
    result to render_cluster(pre_ordered=True). Inside an enclosing jit the
    optimization_barrier below (a real miscompile shield) stops the folder
    from amortizing the three-level argsort + full-table gathers, so the
    ordering would otherwise execute per frame — measured 7.2x on the 10k-
    sphere chained bench (BENCH_r04.json: 622 -> 86 traced Mrays/s).
    render/frame.py memoizes the ordered tables next to the cluster-build
    memo; order_clusters (the public alias) is the entry point.
    """
    # MEASURED MISCOMPILE (TPU v5e / axon, jax 0.9.0, 2026-08-19): the TPU
    # compile path CONSTANT-FOLDS jnp.take_along_axis on >=3D operands
    # incorrectly — minimal repro: take_along_axis on a closure-captured
    # (1,8,8,8) f32 constant inside jit returns rows with zeroed tails
    # (CPU folds the same graph correctly). A caller that closure-captures
    # a prebuilt ClusteredScene inside an outer jit therefore got boxes and
    # attr blocks with whole regions zeroed: -25% image mean on the demo
    # scene (all emission lost) — exactly the cluster parity-golden failure.
    # The barrier keeps the tables (and everything derived from them) out
    # of the folder; on the eager production path the tables are computation
    # PARAMETERS already, so this is a zero-cost identity there.
    # Regression: tests/test_cluster.py::test_cluster_closure_capture_in_jit.
    cl, cam_pos = jax.lax.optimization_barrier((cl, cam_pos))

    def dist(boxes):
        center = (boxes[:, 0:3] + boxes[:, 3:6]) * 0.5
        d = jnp.linalg.norm(center - cam_pos[None, :], axis=-1)
        # empty boxes (inverted: lo=BIG) sort to the tail
        return jnp.where(boxes[:, 0] >= BIG, jnp.float32(1e30), d)

    # Hierarchical: super-super groups stay contiguous (their box is the
    # union of their 8 supers), so each level sorts within its parent —
    # ss groups by distance, supers within each ss, children within each
    # super. The attr blocks carry their own box row, so permuting blocks
    # keeps the kernel's child boxes consistent for free.
    S = cl.n_supers
    S2 = cl.n_ss
    F = FANOUT
    ss_order = jnp.argsort(dist(cl.ss_boxes))
    sup_g = cl.super_boxes.reshape(S2, F, 8)[ss_order]
    boxes_g = cl.boxes.reshape(S2, F, F, 8)[ss_order]
    # attr blocks live in the integer domain at rest (_finish_hierarchy):
    # the gathers below permute int32 words, immune to f32 FTZ
    attr_i = cl.attr
    attr_g = attr_i.reshape(S2, F, F, *attr_i.shape[1:])[ss_order]
    sup_d = jax.vmap(dist)(sup_g)
    s_order = jnp.argsort(sup_d, axis=-1)
    sup_g = jnp.take_along_axis(sup_g, s_order[..., None], axis=1)
    boxes_g = jnp.take_along_axis(boxes_g, s_order[..., None, None], axis=1)
    attr_g = jnp.take_along_axis(
        attr_g, s_order[..., None, None, None], axis=1)
    child_d = jax.vmap(jax.vmap(dist))(boxes_g)
    c_order = jnp.argsort(child_d, axis=-1)
    boxes_g = jnp.take_along_axis(boxes_g, c_order[..., None], axis=2)
    attr_g = jnp.take_along_axis(
        attr_g, c_order[..., None, None], axis=2)
    return cl._replace(
        ss_boxes=cl.ss_boxes[ss_order],
        super_boxes=sup_g.reshape(S, 8),
        boxes=boxes_g.reshape(-1, 8),
        attr=attr_g.reshape(-1, *attr_i.shape[1:]),
    )


# Public name for the eager once-per-camera ordering pass (see the PERF
# note in _order_near_to_far; memoized by render/frame.py).
order_clusters = _order_near_to_far


def _make_kernel(width, height, n_spp, max_depth, n_global, n_supers,
                 cluster_size, jitter=True, enable_refraction=False,
                 gamma=True, rr_start=3, hash_rng=False, fast_sweep=False,
                 n_tri_global=0, n_tri_supers=0, square_blocks=False,
                 enable_dof=False, reach_scan=False, n_ss=0, n_tri_ss=0,
                 cone_scan=True, direct_sph=False, direct_tri=False,
                 nee=False, n_lights_max=8, stratify=False, adaptive=False):
    C = cluster_size
    G = n_global
    S = n_supers
    GT = n_tri_global
    ST = n_tri_supers
    # Best-hit planes: t, cx, cy, cz, ir, p0..p4, plus an is_tri flag when
    # the NEE suppression must tell triangle winners apart (triangles are
    # not in the light cdf, so their BSDF-path emission is never
    # suppressed — the same split as the megakernel and the lax path).
    HAS_TRI = bool(GT or ST)
    NB = 11 if (nee and HAS_TRI) else 10
    # Third hierarchy level (VERDICT r2 item 2): when n_ss > 0, phase A
    # scans the S2 super-super boxes and expands only the crossed ones
    # into super tests — O(S2 + crossed*FANOUT) scalar work instead of
    # O(S), which at 1M primitives (S ~ 2000) dominated every frame.
    S2 = n_ss
    ST2 = n_tri_ss
    # direct_* (small scenes, K <= 512 clusters): the child-box table fits
    # SMEM, so phase A compacts crossed supers AND then crossed CHILDREN —
    # phase B DMAs exactly the crossed clusters (test-before-DMA). The big
    # path instead DMAs every child of a crossed super and tests the box
    # row after the copy (no O(K) SMEM table at 1M primitives); at small K
    # those unconditional DMAs cost more than the sweeps they guard
    # (measured 7x on a 1k-tri terrain at depth 4).
    BR = (C * 16) // LANES  # block row carrying the cluster's own AABB
    # Screen-block geometry: the same 4096 lanes can cover a 64x64 pixel
    # square instead of a 32x128 strip (square_blocks=True). Measured on
    # ground-plane scenes the square is ~20% SLOWER (10k spheres: 141 vs
    # 110 ms): screen y maps to scene depth for a horizon camera, so 64
    # rows span more depth than 32 and the tile frustum crosses MORE
    # cluster boxes despite the shorter pixel diagonal. Strips stay the
    # default; the option remains for depth-light cameras (top-down,
    # interiors) where the square's tighter x-extent can win.
    blk_w, blk_h = (64, 64) if square_blocks else (LANES, SUBLANES)
    blocks_x = -(-width // blk_w)

    def kernel(cam_ref, glob_ref, ssboxes_ref, sboxes_ref, cboxes_ref,
               bg_ref, seed_ref, attr_ref, tglob_ref, tssboxes_ref,
               tsboxes_ref, tcboxes_ref, tattr_ref, *rest):
        rest = list(rest)
        lights_ref = rest.pop(0) if nee else None
        mask_ref = rest.pop(0) if adaptive else None
        (out_ref, segs_ref, best_ref, attr_scratch,
         slist_ref, slist2_ref, count_ref, dma_sem) = rest
        t = pl.program_id(0)
        s = pl.program_id(1)
        # The attribute tables are int32 words at rest (denormal-safe, see
        # _pack_bf16_pair); all reads go through zero-cost f32 reinterpret
        # views. The packed bf16-pair columns are *themselves* consumed as
        # f32 bit patterns (unpacked by plane-level shifts at shading).
        glob_f = glob_ref.bitcast(jnp.float32)
        tglob_f = tglob_ref.bitcast(jnp.float32)
        scratch_f = attr_scratch.bitcast(jnp.float32)
        # seed_ref carries [frame seed, first band row] (row_offset > 0 when
        # rendering a sharded horizontal band of a larger image). Streams
        # are keyed by the GLOBAL tile id so a sharded frame and a
        # single-device frame draw identical per-tile sequences.
        row0 = seed_ref[1]
        t_global = (row0 // blk_h) * blocks_x + t
        seed_scalar = seed_ref[0] + t_global * n_spp + s
        if not hash_rng:
            pltpu.prng_seed(seed_scalar)

        cpx, cpy, cpz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
        fwx, fwy, fwz = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
        rix, riy, riz = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
        upx, upy, upz = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]
        tf_aspect, tf = cam_ref[0, 12], cam_ref[0, 13]
        bgx, bgy, bgz = bg_ref[0, 0], bg_ref[0, 1], bg_ref[0, 2]
        if nee:
            n_lights = bg_ref[0, 3]  # selected emissive-sphere count

        shape = (SUBLANES, LANES)
        sub = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        # screen-block pixel mapping: tile t covers blk_h rows x blk_w cols
        bi = t // blocks_x
        bj = t % blocks_x
        if square_blocks:
            # lane = l2*64 + c; block-local row = sub*2 + l2, col = c
            pxi = bj * blk_w + lane % 64
            pyi = row0 + bi * blk_h + sub * 2 + lane // 64
        else:
            pxi = bj * blk_w + lane
            pyi = row0 + bi * blk_h + sub
        px = pxi.astype(jnp.float32)
        py = pyi.astype(jnp.float32)
        flat = pyi * width + pxi  # hash-RNG stream id

        inv_w = 1.0 / width
        inv_h = 1.0 / height

        if hash_rng:
            _salt = [0]

            def U():
                _salt[0] += 1
                return _hash_uniform(flat, seed_scalar, _salt[0])
        else:
            def U():
                return _uniform(shape)

        def unit_ball():
            return _unit_ball_from(U(), U(), U())

        # ---- primary-cone hulls (scalar) ----
        # The tile's PRIMARY rays all leave one origin (or a lens disk)
        # through one pixel rectangle, so their direction set has a tight
        # componentwise hull computable from camera scalars alone —
        # including every sub-pixel jitter position and, under DOF, every
        # lens sample. The bounce-1 super scan uses a conservative
        # interval-arithmetic cone-vs-box test on these hulls: pure scalar
        # SMEM work, no per-box vector slab and no vector->scalar sync —
        # measured ~5x cheaper per super, and phase A dominates large-N
        # primary traversal (100k spheres: 32.7 of 47.3 ms at spp 1).
        u_l = (bj * blk_w) * inv_w
        u_h = (bj * blk_w + blk_w) * inv_w
        v_l = (row0 + bi * blk_h).astype(jnp.float32) * inv_h
        v_h = (row0 + bi * blk_h + blk_h).astype(jnp.float32) * inv_h
        vx_l = (u_l - 0.5) * 2.0 * tf_aspect
        vx_h = (u_h - 0.5) * 2.0 * tf_aspect
        vy_l = (0.5 - v_h) * 2.0 * tf
        vy_h = (0.5 - v_l) * 2.0 * tf
        cone_dlo, cone_dhi, cone_inv_lo, cone_inv_hi = [], [], [], []
        cone_olo, cone_ohi = [], []
        for fw_c, r_c, up_c, cp_c in ((fwx, rix, upx, cpx),
                                      (fwy, riy, upy, cpy),
                                      (fwz, riz, upz, cpz)):
            a0 = r_c * vx_l
            a1 = r_c * vx_h
            b0_ = up_c * vy_l
            b1_ = up_c * vy_h
            lo_c = fw_c + jnp.minimum(a0, a1) + jnp.minimum(b0_, b1_)
            hi_c = fw_c + jnp.maximum(a0, a1) + jnp.maximum(b0_, b1_)
            cone_dlo.append(lo_c)
            cone_dhi.append(hi_c)
            cone_inv_lo.append(
                1.0 / jnp.where(jnp.abs(lo_c) > 1e-30, lo_c, 1.0))
            cone_inv_hi.append(
                1.0 / jnp.where(jnp.abs(hi_c) > 1e-30, hi_c, 1.0))
            if enable_dof:
                widen = cam_ref[0, 14] * (jnp.abs(r_c) + jnp.abs(up_c))
            else:
                widen = jnp.float32(0.0)
            cone_olo.append(cp_c - widen)
            cone_ohi.append(cp_c + widen)

        def _reach_box_ok(sb_ref, ssc, t_cap, o_lo3, o_hi3):
            """Bounce>=2 scalar test via origin-bounds reachability: a box
            is skippable iff its Chebyshev distance from the tile's active-
            origin box exceeds the max running best_t — conservative for
            any direction (|d_i| <= 1 for unit d). MEASURED 2.8-6x SLOWER
            than the per-ray vector scan (10k spheres: 83 vs 30 ms; 100k:
            641 vs 108) — scatter rays are far from isotropic per tile,
            and the per-ray slab + per-ray best_t bound prunes supers the
            reach test cannot. Kept behind reach_scan=False as a recorded
            negative result."""
            lo = jnp.float32(1e-3)
            for ax in range(3):
                p0 = sb_ref[ssc * 8 + ax] - o_hi3[ax]
                p1 = sb_ref[ssc * 8 + 3 + ax] - o_lo3[ax]
                # reach needs t >= p0 (box above origin range) or
                # t >= -p1 (box below); inside the slab -> 0
                lo = jnp.maximum(lo, jnp.maximum(p0, -p1))
            return (lo <= t_cap) & (sb_ref[ssc * 8 + 6] > 0)

        def _cone_box_ok(sb_ref, ssc, t_cap):
            """Bounce-1 scalar interval cone-vs-box test. Conservative:
            accepts every box any primary ray of this tile could cross,
            for every jitter/lens sample."""
            lo = jnp.float32(1e-3)
            hi = t_cap
            for ax in range(3):
                p0 = sb_ref[ssc * 8 + ax] - cone_ohi[ax]
                p1 = sb_ref[ssc * 8 + 3 + ax] - cone_olo[ax]
                dl = cone_dlo[ax]
                dh = cone_dhi[ax]
                # t-interval where SOME direction in [dl, dh]
                # stays inside the axis slab [p0, p1]
                big = 3.0e38  # python literal: the kernel must
                # not close over host jax arrays (module BIG)
                l1 = jnp.where(dl < 0, p1 * cone_inv_lo[ax], -big)
                u1 = jnp.where(
                    dl > 0, p1 * cone_inv_lo[ax],
                    jnp.where((dl < 0) | (p1 >= 0), big, -big))
                l2 = jnp.where(dh > 0, p0 * cone_inv_hi[ax], -big)
                u2 = jnp.where(
                    dh < 0, p0 * cone_inv_hi[ax],
                    jnp.where((dh > 0) | (p0 <= 0), big, -big))
                lo = jnp.maximum(lo, jnp.maximum(l1, l2))
                hi = jnp.minimum(hi, jnp.minimum(u1, u2))
            return (hi >= lo) & (sb_ref[ssc * 8 + 6] > 0)

        def _read_glob(j, field):
            return glob_f[j, field]

        def _read_tglob(j, field):
            return tglob_f[j, field]

        def _make_read_cluster(buf):
            def _read_cluster(j, field):
                # field-major block layout (build_clusters)
                idx = field * C + j
                return scratch_f[buf, idx // LANES, idx % LANES]
            return _read_cluster

        def _visit_kk(i, direct):
            # direct: slist holds crossed CHILD indices; big path: slist
            # holds crossed supers, expanded to children here
            if direct:
                return slist_ref[i]
            return slist_ref[i // FANOUT] * FANOUT + i % FANOUT

        def _dma(i, buf):
            return pltpu.make_async_copy(
                attr_ref.at[_visit_kk(i, direct_sph)], attr_scratch.at[buf],
                dma_sem.at[buf])

        def _dma_tri(i, buf):
            return pltpu.make_async_copy(
                tattr_ref.at[_visit_kk(i, direct_tri)], attr_scratch.at[buf],
                dma_sem.at[buf])

        def traverse(ox_b, oy_b, oz_b, dx_b, dy_b, dz_b, act_b, t_init,
                     phase):
            """Nearest-hit traversal for one wavefront: dense global
            sweeps, then the compacted cluster phases; parks the NB
            best-hit planes in best_ref. ``t_init`` bounds the search per
            lane — T_MAX for camera/bounce rays, the light-entry t for NEE
            shadow rays (a best_t that ends strictly below it means
            occluded). ``phase`` picks the phase-A scalar test: "cone"
            (primary-ray direction hulls), "reach" (origin bounds),
            "vector" (per-ray slab). Factored out so the NEE shadow
            wavefront rides the same machinery (VERDICT r3 item 2): in the
            reference any extra ray is one cheap recursive call
            (raytracer_core.cpp:291-351); here the traversal IS the
            program, so shadow rays must reuse its compacted phases."""

            def sweep(read, count, best, fast=False):
                """Unrolled sphere sweep updating the best-hit tuple (packed
                attribute layout, _pack_attr_cols); ``read(j, field)``
                fetches attribute scalars at STATIC offsets (globals: SMEM
                input; clusters: the DMA'd SMEM scratch block).
                ``fast=True`` skips the far root (origin-inside-sphere
                case). CAVEAT: only sound when no ray origin can sit
                inside a clustered sphere — untrue with refraction AND
                with enclosing emitters (a dome/sky light contains every
                shading point and is only ever hit via its far root, so
                fast=True would delete the dome). Off by default; the
                measured -19% sweep win is not worth a soundness flag
                keyed on scene content."""
                (best_t, b_cx, b_cy, b_cz, b_ir, b_p0, b_p1, b_p2, b_p3,
                 b_p4) = best[:10]
                extra = list(best[10:])  # optional is_tri plane (NEE+mesh)
                for j in range(count):
                    row = j
                    scx, scy, scz = read(row, 0), read(row, 1), read(row, 2)
                    rad = read(row, 3)
                    inv_rad = read(row, 4)
                    ocx = ox_b - scx
                    ocy = oy_b - scy
                    ocz = oz_b - scz
                    half_b = ocx * dx_b + ocy * dy_b + ocz * dz_b
                    cq = (ocx * ocx + ocy * ocy + ocz * ocz) - rad * rad
                    # NaN-propagating root selection (round 5, shared with
                    # the megakernel): sqrt of a negative discriminant is
                    # NaN and every later compare on it is False, so the
                    # disc >= 0 guard, the max() clamp, and the redundant
                    # upper-bound checks fold away — ~9 fewer VPU ops per
                    # sphere, outcome-identical selection.
                    sqrtd = jnp.sqrt(half_b * half_b - cq)  # a == 1
                    root0 = -half_b - sqrtd
                    if fast and not enable_refraction:
                        root = root0
                    else:
                        root = jnp.where(root0 >= 1e-3, root0,
                                         sqrtd - half_b)
                    better = ((root >= 1e-3) & (root < best_t)
                              & (inv_rad > 0.0))
                    best_t = jnp.where(better, root, best_t)
                    b_cx = jnp.where(better, scx, b_cx)
                    b_cy = jnp.where(better, scy, b_cy)
                    b_cz = jnp.where(better, scz, b_cz)
                    b_ir = jnp.where(better, inv_rad, b_ir)
                    b_p0 = jnp.where(better, read(row, 5), b_p0)
                    b_p1 = jnp.where(better, read(row, 6), b_p1)
                    b_p2 = jnp.where(better, read(row, 7), b_p2)
                    b_p3 = jnp.where(better, read(row, 8), b_p3)
                    b_p4 = jnp.where(better, read(row, 9), b_p4)
                    if extra:
                        extra[0] = jnp.where(better, 0.0, extra[0])
                return (best_t, b_cx, b_cy, b_cz, b_ir, b_p0, b_p1, b_p2,
                        b_p3, b_p4, *extra)

            def tri_sweep(read, count, best, fast=False):
                """Unrolled Moller-Trumbore sweep over packed triangle rows
                (_tri_attr_rows layout). The winner's ray-opposing face
                normal is ENCODED into the sphere best-hit planes: store
                c = hit - n and ir = sign, so the shading path's
                (h - c) * ir reproduces the flipped normal with zero extra
                state planes. ``fast`` is accepted for signature parity
                (no far root to skip)."""
                del fast
                (best_t, b_cx, b_cy, b_cz, b_ir, b_p0, b_p1, b_p2, b_p3,
                 b_p4) = best[:10]
                extra = list(best[10:])
                for j in range(count):
                    v0x, v0y, v0z = read(j, 0), read(j, 1), read(j, 2)
                    e1x, e1y, e1z = read(j, 3), read(j, 4), read(j, 5)
                    e2x, e2y, e2z = read(j, 6), read(j, 7), read(j, 8)
                    pvx = dy_b * e2z - dz_b * e2y
                    pvy = dz_b * e2x - dx_b * e2z
                    pvz = dx_b * e2y - dy_b * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    okd = jnp.abs(det) > 1e-9
                    inv = 1.0 / jnp.where(okd, det, 1.0)
                    tvx = ox_b - v0x
                    tvy = oy_b - v0y
                    tvz = oz_b - v0z
                    uu = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    vv = (dx_b * qvx + dy_b * qvy + dz_b * qvz) * inv
                    tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
                    better = (okd & (uu >= 0.0) & (vv >= 0.0)
                              & (uu + vv <= 1.0) & (tt >= 1e-3)
                              & (tt < best_t))
                    # bf16-packed face normal; flip sign to oppose the ray.
                    # (pltpu.bitcast has no scalar lowering: broadcast the
                    # packed word to a plane, then do plane-level bit ops)
                    nbits = pltpu.bitcast(
                        jnp.full(shape, read(j, 9)), jnp.int32)
                    nx = pltpu.bitcast(
                        jax.lax.shift_left(nbits, 16), jnp.float32)
                    ny = pltpu.bitcast(nbits & jnp.int32(-65536), jnp.float32)
                    nz = pltpu.bitcast(
                        jax.lax.shift_left(
                            pltpu.bitcast(jnp.full(shape, read(j, 10)),
                                          jnp.int32), 16),
                        jnp.float32)
                    sgn_t = jnp.where(
                        dx_b * nx + dy_b * ny + dz_b * nz < 0.0, 1.0, -1.0)
                    hx_t = ox_b + dx_b * tt
                    hy_t = oy_b + dy_b * tt
                    hz_t = oz_b + dz_b * tt
                    best_t = jnp.where(better, tt, best_t)
                    b_cx = jnp.where(better, hx_t - nx, b_cx)
                    b_cy = jnp.where(better, hy_t - ny, b_cy)
                    b_cz = jnp.where(better, hz_t - nz, b_cz)
                    b_ir = jnp.where(better, sgn_t, b_ir)
                    b_p0 = jnp.where(better, read(j, 11), b_p0)
                    b_p1 = jnp.where(better, read(j, 12), b_p1)
                    b_p2 = jnp.where(better, read(j, 13), b_p2)
                    b_p3 = jnp.where(better, read(j, 14), b_p3)
                    b_p4 = jnp.where(better, read(j, 15), b_p4)
                    if extra:
                        extra[0] = jnp.where(better, 1.0, extra[0])
                return (best_t, b_cx, b_cy, b_cz, b_ir, b_p0, b_p1, b_p2,
                        b_p3, b_p4, *extra)

            # global sweep in registers
            zero = jnp.zeros(shape, jnp.float32)
            best = (t_init,) + (zero,) * (NB - 1)
            if G:
                best = sweep(_read_glob, G, best)
            if GT:
                best = tri_sweep(_read_tglob, GT, best)
            # park the running best in scratch so pl.when bodies can update
            for i, plane in enumerate(best):
                best_ref[i] = plane

            # cluster loop with tile-level culling
            inv_dx = 1.0 / jnp.where(jnp.abs(dx_b) > 1e-20, dx_b,
                                     jnp.where(dx_b >= 0, 1e-20, -1e-20))
            inv_dy = 1.0 / jnp.where(jnp.abs(dy_b) > 1e-20, dy_b,
                                     jnp.where(dy_b >= 0, 1e-20, -1e-20))
            inv_dz = 1.0 / jnp.where(jnp.abs(dz_b) > 1e-20, dz_b,
                                     jnp.where(dz_b >= 0, 1e-20, -1e-20))

            def slab6(x0, y0, z0, x1, y1, z1):
                """Per-ray box crossing mask from six scalar bounds, bounded
                by the running best_t (AABB::intersect,
                raytracer_core.h:132-153)."""
                tx0 = (x0 - ox_b) * inv_dx
                tx1 = (x1 - ox_b) * inv_dx
                ty0 = (y0 - oy_b) * inv_dy
                ty1 = (y1 - oy_b) * inv_dy
                tz0 = (z0 - oz_b) * inv_dz
                tz1 = (z1 - oz_b) * inv_dz
                enter = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), 1e-3))
                exit_ = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1), best_ref[0]))
                return (exit_ >= enter) & act_b

            def slab(box_ref, row):
                # box tables ride SMEM FLATTENED: Mosaic pads each row of a
                # 2D SMEM array to 512 B (measured: f32[1960,8] allocated
                # 980 KB of the 1 MB SMEM), while 1D arrays pack tight.
                return slab6(box_ref[row * 8 + 0], box_ref[row * 8 + 1],
                             box_ref[row * 8 + 2], box_ref[row * 8 + 3],
                             box_ref[row * 8 + 4], box_ref[row * 8 + 5])

            # Multi-phase traversal. A fori_loop iteration costs ~86 ns of
            # scalar-core overhead plus ~130 ns per vector->scalar any()
            # sync (measured), so visiting all K clusters per bounce is the
            # floor that killed the flat loop. Phase A COMPACTS the crossed
            # super-boxes into an SMEM list — scanning the S2 super-supers
            # first and expanding only crossed ones when the third level is
            # on (n_ss > 0), else scanning all S supers; phase B's trip
            # count is crossed_supers * FANOUT — typically a handful — with
            # the (single-copy) sweep behind a per-cluster child-box test
            # read from the just-DMA'd block (row BR). Register pressure
            # stays low because the sweep body exists exactly once.
            def _make_cluster_visit(dma, sweep_fn, direct):
                def cluster_visit(i, visits):
                    buf = jax.lax.rem(i, 2)
                    # consume this buffer's in-flight prefetch, then
                    # immediately prefetch visit i+1 into the other buffer:
                    # the next DMA overlaps this visit's test + sweep
                    dma(i, buf).wait()

                    @pl.when(i + 1 < visits)
                    def _():
                        dma(i + 1, 1 - buf).start()

                    if direct:
                        # phase A already tested this child's box
                        # (test-before-DMA): sweep unconditionally
                        best_s = tuple(best_ref[i2] for i2 in range(NB))
                        best_s = sweep_fn(_make_read_cluster(buf), C, best_s,
                                          fast=fast_sweep)
                        for i2, plane in enumerate(best_s):
                            best_ref[i2] = plane
                        return visits

                    crossed = slab6(
                        scratch_f[buf, BR, 0], scratch_f[buf, BR, 1],
                        scratch_f[buf, BR, 2], scratch_f[buf, BR, 3],
                        scratch_f[buf, BR, 4], scratch_f[buf, BR, 5])
                    # lane 6 = validity: padding clusters (inverted box)
                    # must not sweep — the slab test crosses them always
                    real = scratch_f[buf, BR, 6] > 0

                    @pl.when(real & jnp.any(crossed))
                    def _():
                        best_s = tuple(best_ref[i2] for i2 in range(NB))
                        best_s = sweep_fn(_make_read_cluster(buf), C, best_s,
                                          fast=fast_sweep)
                        for i2, plane in enumerate(best_s):
                            best_ref[i2] = plane

                    return visits

                return cluster_visit

            # The bounce-1 scan uses the scalar primary-cone test (the
            # direction hull is only known for primary rays); later
            # bounces scatter over the sphere, so the scalar scan falls
            # back to origin-bounds reachability (reach_scan) or the
            # per-ray vector slab scan. t_cap (max best_t after the
            # preceding sweeps) keeps the ground-sphere pruning the vector
            # scan gets from its running-t bound.
            use_cone = phase == "cone"
            use_reach = phase == "reach"

            def _scan(ssb_ref, n_ss_g, sb_ref, n_s_g, cb_ref, direct):
                """Phase A: compact crossed indices into slist_ref.
                With the third level (n_ss_g > 0): scan super-supers into
                slist2_ref, then test only crossed parents' FANOUT supers
                (slist holds SUPER indices). With ``direct``: scan supers
                into slist2_ref, then test crossed parents' FANOUT child
                boxes from the SMEM table (slist holds CHILD indices)."""
                if use_cone:
                    t_cap = jnp.max(best_ref[0])

                    def test(ref, i):
                        return _cone_box_ok(ref, i, t_cap)
                elif use_reach:
                    # masked bounds of the ACTIVE rays' origins (scatter
                    # origins = previous bounce's hit points)
                    def _mm(v, lo_side):
                        fill = 3.0e38 if lo_side else -3.0e38
                        masked = jnp.where(act_b, v, fill)
                        return (jnp.min(masked) if lo_side
                                else jnp.max(masked))

                    r_olo = [_mm(ox_b, True), _mm(oy_b, True),
                             _mm(oz_b, True)]
                    r_ohi = [_mm(ox_b, False), _mm(oy_b, False),
                             _mm(oz_b, False)]
                    r_tcap = jnp.max(jnp.where(act_b, best_ref[0], 0.0))

                    def test(ref, i):
                        return _reach_box_ok(ref, i, r_tcap, r_olo, r_ohi)
                else:
                    def test(ref, i):
                        # the flag guards the corner-order-blind vector slab
                        # against empty (inverted) padding boxes, which it
                        # would otherwise report as crossed by every ray
                        return jnp.any(slab(ref, i)) & (ref[i * 8 + 6] > 0)

                # Sync batching: with the vector slab test, every
                # ``pl.when(test(...))`` is a vector->scalar round trip
                # (~130 ns measured) — the dominant phase-A cost once
                # bounce rays scatter and most boxes need testing. Pack a
                # GROUP of boxes' any-lane-crossed bits into one int32
                # word (bit k = box k), park it in the SMEM mailbox
                # (count_ref[2]) — ONE sync per group — and unpack with
                # scalar shifts. For the scalar cone/reach tests the word
                # arithmetic is already scalar and the mailbox is free.
                def _pack_test_word(test_k, n_k):
                    word = jnp.int32(0)
                    for k in range(n_k):
                        ok = test_k(k)
                        word = word + jnp.where(ok, jnp.int32(1 << k),
                                                jnp.int32(0))
                    count_ref[2] = word
                    return count_ref[2]

                def _compact(box_ref, n_boxes, out_ref, slot):
                    group = 8

                    def body(q, _):
                        def test_k(k):
                            ss = q * group + k
                            ssc = jnp.minimum(ss, n_boxes - 1)
                            return test(box_ref, ssc) & (ss < n_boxes)

                        w = _pack_test_word(test_k, group)

                        for k in range(group):
                            bit = jax.lax.shift_right_logical(
                                w, k) & jnp.int32(1)

                            @pl.when(bit != 0)
                            def _(k=k):
                                idx = count_ref[slot]
                                out_ref[idx] = q * group + k
                                count_ref[slot] = idx + 1

                        return 0

                    jax.lax.fori_loop(0, -(-n_boxes // group), body, 0)

                def _expand_into_slist(upper_ref):
                    """Test crossed parents' FANOUT children of
                    ``upper_ref`` into slist_ref (one sync per parent)."""
                    def expand(i, _):
                        parent = slist2_ref[i]
                        w = _pack_test_word(
                            lambda k: test(upper_ref, parent * FANOUT + k),
                            FANOUT)

                        for k in range(FANOUT):
                            bit = jax.lax.shift_right_logical(
                                w, k) & jnp.int32(1)

                            @pl.when(bit != 0)
                            def _(k=k):
                                idx = count_ref[0]
                                slist_ref[idx] = parent * FANOUT + k
                                count_ref[0] = idx + 1

                        return 0

                    jax.lax.fori_loop(0, count_ref[1], expand, 0)

                count_ref[0] = 0
                # (A 3-level test-before-DMA variant — ss -> supers ->
                # compacted crossed children — was built and measured
                # slower at every scale: 10k 169 vs 117 ms, 100k 895 vs
                # 461. Pre-testing children buys nothing because the
                # prefetched DMA already overlaps the previous visit's
                # sweep; the extra vector slab tests are pure cost.)
                if direct:
                    count_ref[1] = 0
                    _compact(sb_ref, n_s_g, slist2_ref, 1)
                    _expand_into_slist(cb_ref)
                elif n_ss_g:
                    count_ref[1] = 0
                    _compact(ssb_ref, n_ss_g, slist2_ref, 1)
                    _expand_into_slist(sb_ref)
                else:
                    _compact(sb_ref, n_s_g, slist_ref, 0)

            @pl.when(jnp.any(act_b))
            def _():
                # sphere clusters, then triangle clusters: phases share the
                # SMEM visit lists, DMA scratch and the running best planes
                # (the sphere phase's best_t prunes triangle boxes too)
                if S:
                    _scan(ssboxes_ref, S2, sboxes_ref, S, cboxes_ref,
                          direct_sph)
                    visits = (count_ref[0] if direct_sph
                              else count_ref[0] * FANOUT)

                    @pl.when(visits > 0)
                    def _():
                        _dma(0, 0).start()

                    jax.lax.fori_loop(
                        0, visits,
                        _make_cluster_visit(_dma, sweep, direct_sph),
                        visits)
                if ST:
                    _scan(tssboxes_ref, ST2, tsboxes_ref, ST, tcboxes_ref,
                          direct_tri)
                    tvisits = (count_ref[0] if direct_tri
                               else count_ref[0] * FANOUT)

                    @pl.when(tvisits > 0)
                    def _():
                        _dma_tri(0, 0).start()

                    jax.lax.fori_loop(
                        0, tvisits,
                        _make_cluster_visit(_dma_tri, tri_sweep, direct_tri),
                        tvisits)

        def run_tile():
            # ---- primary ray ----
            if jitter and stratify:
                # R2 lattice under a per-pixel Cranley-Patterson rotation
                # (same estimator as the megakernel's stratify). The shift
                # must be IDENTICAL across this frame's spp grid steps, so
                # it comes from the counter hash keyed WITHOUT s — the
                # hardware PRNG reseeds per (tile, s) and cannot reproduce
                # a per-tile draw across s.
                base = seed_ref[0] + t_global * n_spp
                shift_u = _hash_uniform(flat, base, 9001)
                shift_v = _hash_uniform(flat, base, 9002)
                sf = s.astype(jnp.float32)
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
                # thin-lens DOF (same math as the megakernel)
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

            tr = jnp.ones(shape, jnp.float32)
            tg = jnp.ones(shape, jnp.float32)
            tb = jnp.ones(shape, jnp.float32)
            cr = jnp.zeros(shape, jnp.float32)
            cg = jnp.zeros(shape, jnp.float32)
            cb = jnp.zeros(shape, jnp.float32)
            act = jnp.ones(shape, jnp.bool_)
            seg_count = jnp.int32(0)
            if nee:
                # lanes whose previous scatter was diffuse already counted
                # direct light via their shadow ray; camera hits always emit
                no_emit = jnp.zeros(shape, jnp.bool_)

            # ---- bounce loop (unrolled; one fori level stays free for the
            # cluster loop) ----
            for depth_idx in range(1, max_depth + 1):
                rr_on = depth_idx > rr_start
                seg_count = seg_count + jnp.sum(act.astype(jnp.int32))

                if cone_scan and depth_idx == 1:
                    scan_phase = "cone"
                elif reach_scan and depth_idx > 1:
                    scan_phase = "reach"
                else:
                    scan_phase = "vector"
                traverse(ox, oy, oz, dx, dy, dz, act,
                         jnp.full(shape, T_MAX), scan_phase)

                vals = tuple(best_ref[i] for i in range(NB))
                (best_t, b_cx, b_cy, b_cz, b_ir, b_p0, b_p1, b_p2, b_p3,
                 b_p4) = vals[:10]
                if NB == 11:
                    b_is_tri = vals[10] > 0.0

                def unpack(p):
                    bits = pltpu.bitcast(p, jnp.int32)
                    lo = pltpu.bitcast(
                        jax.lax.shift_left(bits, 16), jnp.float32)
                    hi = pltpu.bitcast(bits & jnp.int32(-65536), jnp.float32)
                    return lo, hi

                b_ar, b_ag = unpack(b_p0)
                b_ab, b_met = unpack(b_p1)
                b_rgh, b_ior = unpack(b_p2)
                b_er, b_eg = unpack(b_p3)
                b_eb, _unused = unpack(b_p4)

                # ---- shading (identical to the megakernel) ----
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
                    # sphere hit FROM INSIDE (|o-c|^2 * (1/r)^2 < 1 on the
                    # best-hit planes) is exempt: an enclosing dome light
                    # is unreachable by any shadow ray, so its BSDF
                    # emission survives on every draw (exact multi-light
                    # gate — ops/integrator.py, tests/test_multilight.py).
                    eocx = ox - b_cx
                    eocy = oy - b_cy
                    eocz = oz - b_cz
                    eoc2 = eocx * eocx + eocy * eocy + eocz * eocz
                    inside_hit = eoc2 * (b_ir * b_ir) < 1.0
                    keep = no_emit & ~inside_hit
                    suppress = (keep & ~b_is_tri) if NB == 11 else keep
                    emitf = (act & ~suppress).astype(jnp.float32)
                else:
                    emitf = act.astype(jnp.float32)
                cr = cr + emitf * tr * b_er
                cg = cg + emitf * tg * b_eg
                cb = cb + emitf * tb * b_eb

                if rr_on:
                    xi_rr = U()
                    p = jnp.clip(jnp.maximum(tr, jnp.maximum(tg, tb)),
                                 0.1, 0.95)
                    act = act & (xi_rr < p)
                    comp = jnp.where(act, 1.0 / p, 1.0)
                    tr = tr * comp
                    tg = tg * comp
                    tb = tb * comp

                hx = ox + dx * best_t
                hy = oy + dy * best_t
                hz = oz + dz * best_t
                nx = (hx - b_cx) * b_ir
                ny = (hy - b_cy) * b_ir
                nz = (hz - b_cz) * b_ir

                bx, by, bz = unit_ball()
                d_dot_n = _dot3(dx, dy, dz, nx, ny, nz)
                rfx = dx - 2.0 * d_dot_n * nx
                rfy = dy - 2.0 * d_dot_n * ny
                rfz = dz - 2.0 * d_dot_n * nz
                mx, my, mz = _normalize3(rfx + bx * b_rgh, rfy + by * b_rgh,
                                         rfz + bz * b_rgh)
                if nee:
                    # exact cosine-weighted diffuse: n + (on-sphere unit)
                    # is distributed cos(theta)/pi (the NEE estimator's
                    # defining sampler — same as the megakernel and
                    # ops/integrator.py _scatter_directions(cosine=True))
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
                    # ---- next-event estimation (VERDICT r3 item 2): one
                    # shadow ray per diffuse lane to a solid-angle-sampled
                    # point on a uniformly chosen emissive sphere; occlusion
                    # is a second pass of the SAME compacted traversal with
                    # best_t seeded at the light-entry t. Estimator
                    #   thr * albedo/pi * cos * Le * (1/pdf_omega) * n_lights
                    # — identical to the megakernel and the lax path,
                    # stream-different. ----
                    is_spec = is_metal
                    if enable_refraction:
                        is_spec = is_spec | is_glass
                    diffuse_lane = act & ~is_spec

                    # light pick: first SMEM light row whose cdf crosses
                    # the draw (uniform over the table's emissive spheres)
                    u_l2 = U()
                    found = jnp.zeros(shape, jnp.bool_)
                    l_cx = jnp.zeros(shape, jnp.float32)
                    l_cy = jnp.zeros(shape, jnp.float32)
                    l_cz = jnp.zeros(shape, jnp.float32)
                    l_r = jnp.zeros(shape, jnp.float32)
                    l_er = jnp.zeros(shape, jnp.float32)
                    l_eg = jnp.zeros(shape, jnp.float32)
                    l_eb = jnp.zeros(shape, jnp.float32)
                    for n in range(n_lights_max):
                        pick = (~found) & (lights_ref[n * 8 + 7] >= u_l2)
                        found = found | pick
                        l_cx = jnp.where(pick, lights_ref[n * 8 + 0], l_cx)
                        l_cy = jnp.where(pick, lights_ref[n * 8 + 1], l_cy)
                        l_cz = jnp.where(pick, lights_ref[n * 8 + 2], l_cz)
                        l_r = jnp.where(pick, lights_ref[n * 8 + 3], l_r)
                        l_er = jnp.where(pick, lights_ref[n * 8 + 4], l_er)
                        l_eg = jnp.where(pick, lights_ref[n * 8 + 5], l_eg)
                        l_eb = jnp.where(pick, lights_ref[n * 8 + 6], l_eb)

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
                    big_ = jnp.abs(wx_) > 0.9
                    ax_ = jnp.where(big_, 0.0, 1.0)
                    ay_ = jnp.where(big_, 1.0, 0.0)
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
                    # strict margin: the light's own entry root equals
                    # t_light, so it never self-occludes
                    t_edge = t_light - 1e-3

                    ndl = nx * ldx + ny * ldy + nz * ldz
                    gate_pre = (diffuse_lane & light_ok & ~inside
                                & (ndl > 0.0) & (n_lights > 0.0))
                    # occlusion: shadow wavefront through the same
                    # traversal; the per-lane t_init doubles as the
                    # running-t slab bound, pruning clusters beyond the
                    # light for free
                    t_sh = jnp.where(gate_pre, t_edge, jnp.float32(1e-3))
                    traverse(hx, hy, hz, ldx, ldy, ldz, gate_pre, t_sh,
                             "vector")
                    occ = best_ref[0] < t_edge
                    gate = gate_pre & ~occ
                    gf = gate.astype(jnp.float32)
                    scale = gf * ndl * weight * (n_lights
                                                 * 0.3183098861837907)
                    cr = cr + tr * b_ar * scale * l_er
                    cg = cg + tg * b_ag * scale * l_eg
                    cb = cb + tb * b_ab * scale * l_eb
                    seg_count = seg_count + jnp.sum(
                        diffuse_lane.astype(jnp.int32))
                    # Unconditional suppression: the enclosing-light corner
                    # is handled by the inside-hit exemption at emission
                    # time, which fires on every draw instead of only the
                    # 1/n_lights that sampled the containing light (exact
                    # multi-light gate; ops/integrator.py).
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

            # ---- spp accumulation across the (revisited) s grid axis ----
            @pl.when(s == 0)
            def _():
                out_ref[0, 0] = cr
                out_ref[1, 0] = cg
                out_ref[2, 0] = cb
                segs_ref[t] = seg_count

            @pl.when(s > 0)
            def _():
                out_ref[0, 0] = out_ref[0, 0] + cr
                out_ref[1, 0] = out_ref[1, 0] + cg
                out_ref[2, 0] = out_ref[2, 0] + cb
                segs_ref[t] = segs_ref[t] + seg_count

            @pl.when(s == n_spp - 1)
            def _():
                inv_spp = 1.0 / n_spp
                if gamma:
                    out_ref[0, 0] = jnp.clip(
                        jnp.sqrt(jnp.maximum(out_ref[0, 0] * inv_spp, 0.0)),
                        0.0, 1.0)
                    out_ref[1, 0] = jnp.clip(
                        jnp.sqrt(jnp.maximum(out_ref[1, 0] * inv_spp, 0.0)),
                        0.0, 1.0)
                    out_ref[2, 0] = jnp.clip(
                        jnp.sqrt(jnp.maximum(out_ref[2, 0] * inv_spp, 0.0)),
                        0.0, 1.0)
                else:
                    out_ref[0, 0] = out_ref[0, 0] * inv_spp
                    out_ref[1, 0] = out_ref[1, 0] * inv_spp
                    out_ref[2, 0] = out_ref[2, 0] * inv_spp

        if adaptive:
            # per-tile early-exit (adaptive sampling): converged tiles
            # (mask 0) skip the whole trace — the scalar core branches
            # around all vector work. The s==0 zero write keeps the
            # revisited output block defined; the accumulator ignores
            # masked tiles (render/frame.py accumulate_tiled).
            tile_on = mask_ref[t] > 0

            @pl.when(tile_on)
            def _():
                run_tile()

            @pl.when(jnp.logical_not(tile_on) & (s == 0))
            def _():
                z = jnp.zeros(shape, jnp.float32)
                out_ref[0, 0] = z
                out_ref[1, 0] = z
                out_ref[2, 0] = z
                segs_ref[t] = jnp.int32(0)
        else:
            run_tile()

    return kernel


@partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_depth", "jitter",
                     "enable_refraction", "gamma", "with_stats", "interpret",
                     "cluster_size", "n_global", "n_active", "fast_sweep",
                     "n_tri_global", "n_tri_active", "rows",
                     "square_blocks", "enable_dof", "reach_scan", "vma",
                     "use_third_level", "cone_scan", "nee", "stratify",
                     "n_lights_max", "pre_ordered"),
)
def render_cluster(
    scene: SphereScene,
    cam: CameraP,
    seed,
    width: int = 1920,
    height: int = 1080,
    spp: int = 4,
    max_depth: int = 4,
    jitter: bool = True,
    enable_refraction: bool = False,
    gamma: bool = True,
    with_stats: bool = False,
    interpret: bool = False,
    cluster_size: int = DEFAULT_CLUSTER,
    n_global: int = DEFAULT_GLOBAL,
    n_active: int | None = None,
    fast_sweep: bool = False,
    mesh=None,
    n_tri_global: int = 2,
    n_tri_active: int | None = None,
    rows: int | None = None,
    row_offset=0,
    square_blocks: bool = False,
    enable_dof: bool = False,
    reach_scan: bool = False,
    cone_scan: bool = True,
    prebuilt: ClusteredScene | None = None,
    tri_prebuilt: ClusteredScene | None = None,
    vma: tuple[str, ...] | None = None,
    use_third_level: bool | None = None,
    nee: bool = False,
    stratify: bool = False,
    n_lights_max: int = 8,
    tile_mask: jnp.ndarray | None = None,
    pre_ordered: bool = False,
):
    """Large-scene fused render; returns (height, width, 3) f32 in [0, 1].

    Same contract as render_pallas but scales to thousands of primitives:
    work per segment is O(global + crossed clusters * C), not O(N).
    ``n_active`` (quantized active count) bounds the cluster table.
    ``fast_sweep=True`` skips the far quadratic root in SPHERE cluster
    sweeps (~10% faster; exact for non-overlapping opaque scenes with the
    camera outside every primitive, unlike the reference's
    always-both-roots test, raytracer_core.h:194-215 — off by default).
    ``mesh`` adds a TriangleMesh, clustered into its own two-level box
    hierarchy and swept with Moller-Trumbore after the sphere phase — the
    large-mesh fast path the reference's templated BVHTraversal::intersect
    (cpp_raytracer/bvh.cpp:133-195) was aiming at.

    Sharded use (tpu_rt.parallel): pass ``rows`` (static band height, a
    multiple of 32) and ``row_offset`` (dynamic global first row, a multiple
    of 32) to render a horizontal band of the full image, and
    ``gamma=False`` for a linear mean mergeable with psum across a sample
    axis. RNG streams key off the global tile id, so a sharded frame equals
    the single-device frame stream-for-stream.
    """
    # The cluster build is camera-independent; callers rendering the same
    # scene repeatedly (progressive accumulation) pass ``prebuilt`` to skip
    # it — measured 35 ms/frame at 10k spheres, ~1/3 of the frame. The
    # camera-dependent near-to-far ordering is hoisted the same way:
    # ``pre_ordered=True`` promises the prebuilt tables (sphere AND
    # triangle) were already passed through order_clusters for THIS camera
    # position — under an enclosing jit the in-graph ordering re-executes
    # its full-table gathers every frame (see _order_near_to_far's PERF
    # note), so production callers (render/frame.py, bench.py) order
    # eagerly once per camera and cache.
    clustered = prebuilt if prebuilt is not None else build_clusters(
        scene, cluster_size=cluster_size, n_global=n_global,
        n_active=n_active)
    if not (pre_ordered and prebuilt is not None):
        clustered = _order_near_to_far(clustered, cam.position)
    S = clustered.n_supers
    G = clustered.n_global
    C = clustered.cluster_size

    # Third hierarchy level: DEFAULT ON at every scale. Re-measured with
    # honest (non-constant-folded) tables, 1080p/4spp/d4 on the v5e,
    # 2026-08-20: third-level beats the direct test-before-DMA path at
    # 1024 spheres (53.5 vs 59.1 ms), 4096 (82.4 vs 110.6), and 10k
    # (115.0 vs 174.3) — the old S > 64 threshold and the direct path's
    # "wins below ~32k" note were tuned against the r03 harness whose
    # closure-captured tables the TPU constant folder had zeroed (fast
    # because rays hit nothing — see BASELINE.md "round-5 correction").
    # ``use_third_level=False`` keeps the two-level/direct paths reachable
    # for benchmarks and regression comparison.
    third = True if use_third_level is None else use_third_level
    S2 = clustered.n_ss if third else 0
    # Direct (test-before-DMA) paths: phase A compacts crossed CHILDREN
    # and phase B DMAs + sweeps exactly those. Measured SLOWER than
    # DMA-then-test at every scale on honest tables (3-level direct at
    # 10k: 169 vs 117 ms; at 100k: 895 vs 461 — the per-child vector slab
    # tests cost more than the skipped prefetched DMAs save, since a
    # prefetched DMA that overlaps the previous sweep is nearly free).
    # Kept reachable via use_third_level=False for regression comparison.
    K = clustered.n_clusters
    direct_sph = (not third) and K <= 512

    if mesh is not None or tri_prebuilt is not None:
        tri = tri_prebuilt if tri_prebuilt is not None else (
            build_tri_clusters(mesh, cluster_size=cluster_size,
                               n_global=n_tri_global,
                               n_active=n_tri_active))
        if not (pre_ordered and tri_prebuilt is not None):
            tri = _order_near_to_far(tri, cam.position)
        ST = tri.n_supers
        GT = tri.n_global
        tri_third = (True if use_third_level is None
                     else use_third_level)
        ST2 = tri.n_ss if tri_third else 0
        KT = tri.n_clusters
        direct_tri = (not tri_third) and KT <= 512
        tglob, tssboxes, tsboxes, tattr = (tri.glob_attr, tri.ss_boxes,
                                           tri.super_boxes, tri.attr)
        tcboxes = tri.boxes if direct_tri else jnp.zeros((1, 8), jnp.float32)
    else:
        ST = GT = ST2 = KT = 0
        direct_tri = False
        tglob = jnp.zeros((1, 16), jnp.int32)
        tssboxes = jnp.zeros((1, 8), jnp.float32)
        tsboxes = jnp.zeros((1, 8), jnp.float32)
        tcboxes = jnp.zeros((1, 8), jnp.float32)
        tattr = jnp.zeros((1, (C * 16) // LANES + 1, LANES), jnp.int32)
    cboxes = (clustered.boxes if direct_sph
              else jnp.zeros((1, 8), jnp.float32))

    out_rows = height if rows is None else rows
    blk_w, blk_h = (64, 64) if square_blocks else (LANES, SUBLANES)
    if rows is not None and rows % blk_h != 0:
        raise ValueError(f"band rows {rows} must be a multiple of {blk_h}")
    blocks_x = -(-width // blk_w)
    blocks_y = -(-out_rows // blk_h)
    n_tiles = blocks_x * blocks_y

    cam_packed = _pack_camera(cam)
    if nee:
        # Emissive-sphere light table for the in-kernel NEE pick: the first
        # n_lights_max lights (by scene index, stable) as flattened SMEM
        # rows [cx cy cz r er eg eb cdf]. Scene-edit-hot VALUES only — no
        # recompile. Scenes with more emissive spheres than the static cap
        # should raise n_lights_max: overflow lights are neither sampled
        # nor exempted from the post-diffuse suppression, so their diffuse
        # direct light is lost (the megakernel has no such cap because its
        # cdf rides the <=64-row attr bucket itself).
        sc = jax.lax.optimization_barrier(scene)  # gather-folder shield
        em_max = jnp.max(sc.emission, axis=-1)
        is_light = sc.valid & (em_max > 0.0) & (sc.radius > 0.0)
        order = jnp.argsort(~is_light, stable=True)  # lights first
        idx = order[:n_lights_max]
        lw = is_light[idx].astype(jnp.float32)
        n_lights = jnp.sum(lw)
        cdf = jnp.cumsum(lw) / jnp.maximum(n_lights, 1.0)
        lights = jnp.concatenate(
            [sc.center[idx], sc.radius[idx, None] * lw[:, None],
             sc.emission[idx], cdf[:, None]], axis=-1).reshape(-1)
    else:
        n_lights = jnp.float32(0.0)
        lights = None
    bg = jnp.concatenate(
        [clustered.background,
         jnp.asarray(n_lights, jnp.float32)[None]]).reshape(1, 4)
    seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32),
                          jnp.asarray(row_offset, jnp.int32)]).reshape(2)

    adaptive = tile_mask is not None
    NB = 11 if (nee and (GT or ST)) else 10
    kernel = _make_kernel(width, height, spp, max_depth, G, S, C,
                          jitter=jitter, enable_refraction=enable_refraction,
                          gamma=gamma, hash_rng=interpret,
                          fast_sweep=fast_sweep,
                          n_tri_global=GT, n_tri_supers=ST,
                          square_blocks=square_blocks,
                          enable_dof=enable_dof, reach_scan=reach_scan,
                          n_ss=S2, n_tri_ss=ST2, cone_scan=cone_scan,
                          direct_sph=direct_sph, direct_tri=direct_tri,
                          nee=nee, n_lights_max=n_lights_max,
                          stratify=stratify, adaptive=adaptive)

    # The attribute tables are DMA'd per cluster into SMEM scratch, so they
    # need not be VMEM-resident: past ~8 MB (>~100k primitives) they live
    # in HBM/compiler-chosen memory and the double-buffered per-cluster
    # copies ride the same async-DMA path with higher (hidden) latency.
    def _table_space(t):
        return (pltpu.VMEM if t.size * 4 <= 8 * 2 ** 20 else pl.ANY)

    inputs = [cam_packed, clustered.glob_attr,
              clustered.ss_boxes.reshape(-1),
              clustered.super_boxes.reshape(-1), cboxes.reshape(-1), bg,
              seed_arr, clustered.attr, tglob, tssboxes.reshape(-1),
              tsboxes.reshape(-1), tcboxes.reshape(-1), tattr]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # camera
        pl.BlockSpec(memory_space=pltpu.SMEM),   # global attrs
        pl.BlockSpec(memory_space=pltpu.SMEM),   # super-super boxes
        pl.BlockSpec(memory_space=pltpu.SMEM),   # super boxes
        pl.BlockSpec(memory_space=pltpu.SMEM),   # child boxes (direct)
        pl.BlockSpec(memory_space=pltpu.SMEM),   # background
        pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
        pl.BlockSpec(memory_space=_table_space(clustered.attr)),
        pl.BlockSpec(memory_space=pltpu.SMEM),   # tri global attrs
        pl.BlockSpec(memory_space=pltpu.SMEM),   # tri super-super boxes
        pl.BlockSpec(memory_space=pltpu.SMEM),   # tri super boxes
        pl.BlockSpec(memory_space=pltpu.SMEM),   # tri child boxes
        pl.BlockSpec(memory_space=_table_space(tattr)),
    ]
    if nee:
        inputs.append(lights)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # light rows
    if adaptive:
        # per-tile render mask (adaptive sampling): 0 = converged, skip.
        # Tiles are this engine's SCREEN BLOCKS (blk_h x blk_w pixels),
        # not the megakernel's linear TILE runs.
        inputs.append(jnp.asarray(tile_mask, jnp.int32).reshape(n_tiles))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    out, segs = pl.pallas_call(
        kernel,
        grid=(n_tiles, spp),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((3, 1, SUBLANES, LANES), lambda t, s: (0, t, 0, 0),
                         memory_space=pltpu.VMEM),
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
        scratch_shapes=[
            pltpu.VMEM((NB, SUBLANES, LANES), jnp.float32),
            # attr DMA double-buffer: int32 words like the tables
            pltpu.SMEM((2, (C * 16) // LANES + 1, LANES), jnp.int32),
            # slist: crossed CHILDREN on the direct path, else supers
            pltpu.SMEM((max(K if direct_sph else S,
                            KT if direct_tri else ST, 1),), jnp.int32),
            # slist2: crossed supers (direct) or super-supers (third level)
            pltpu.SMEM((max(S2, ST2, S if direct_sph else 1,
                            ST if direct_tri else 1, 1),), jnp.int32),
            # [0]=slist count, [1]=slist2 count, [2]=packed-test mailbox
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        # box tables flattened to 1D: 2D SMEM arrays pad rows to 512 B
    )(*inputs)

    # reassemble screen blocks -> image (band)
    if square_blocks:
        # lane = l2*64 + c; block-local row = sub*2 + l2
        img = out.reshape(3, blocks_y, blocks_x, SUBLANES, 2, 64)
        img = jnp.transpose(img, (0, 1, 3, 4, 2, 5))
        img = img.reshape(3, blocks_y * blk_h, blocks_x * blk_w)
    else:
        img = out.reshape(3, blocks_y, blocks_x, SUBLANES, LANES)
        img = jnp.transpose(img, (0, 1, 3, 2, 4))
        img = img.reshape(3, blocks_y * blk_h, blocks_x * blk_w)
    img = jnp.moveaxis(img[:, :out_rows, :width], 0, -1)
    if with_stats:
        total = jnp.sum(segs)
        scale = (width * out_rows) / (n_tiles * TILE)
        return img, (total.astype(jnp.float32) * scale).astype(jnp.int32)
    return img
