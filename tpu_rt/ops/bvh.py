"""On-device LBVH: Morton-ordered complete binary tree + skip-link traversal.

Replaces the reference's host-side builders and stack traversals — the v2
median-split flat builder whose two-pass child indexing is buggy
(BVHBuilder, cpp_raytracer/raytracer_core.cpp:26-145; bug analysis SURVEY.md
§2.4), the v1 recursive pointer tree (old/bvh copy.cpp:111-174), and the
64-deep TraversalNode stack walk (cpp_raytracer/raytracer_core.cpp:196-251)
— with a TPU-native design:

**Build (all on device, O(log N) fused kernels — no host round-trip):**
  1. Morton codes of primitive centroids (30-bit, 10/axis) — bit
     interleaving is pure VPU integer work.
  2. ``argsort`` by code: spatially-local primitives become adjacent.
  3. A *complete binary tree* over the sorted order: level k's node bboxes
     are pairwise unions of level k+1 — a reshape + min/max reduction per
     level, no pointers, no atomics. (Equivalent to recursive median split
     on the Morton curve — an LBVH variant chosen because every build step
     is a dense lane-parallel op.)

**Traversal (stackless):** nodes laid out in DFS preorder with precomputed
*skip links* (where to jump when a subtree is culled). Per-ray state is one
node cursor — no 64-entry stack per lane. The DFS order and skip links of a
complete tree depend only on the (static, bucketed) primitive count, so they
are compile-time constants; only bboxes are data. Like the reference's
traversal, children are visited in fixed order with closest-t pruning
(raytracer_core.cpp:212-217) rather than near-child ordering.

Scene edits re-run the build kernels on device (BASELINE.json north star:
"scene edits never round-trip through host rebuilds").

Brute force (tpu_rt.ops.intersect) remains both the oracle these kernels are
validated against and the fast path for bucket-sized scenes: dense
(R, N) MXU sweeps beat pointer-ish traversal until N is in the thousands.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import T_MAX


class LBVH(NamedTuple):
    """Complete-binary-tree BVH in DFS preorder.

    n_leaves is a power of two; node count = 2 * n_leaves - 1. ``prim_index``
    maps leaf slot -> original primitive index (padding slots map to -1 and
    carry empty boxes).
    """

    bbox_min: jnp.ndarray    # (n_nodes, 3) f32, DFS order
    bbox_max: jnp.ndarray    # (n_nodes, 3) f32
    prim_index: jnp.ndarray  # (n_leaves,) i32, leaf order (DFS = sorted order)


# ---------------------------------------------------------------------------
# static tree topology (compile-time constants per bucketed leaf count)
# ---------------------------------------------------------------------------

def _dfs_layout(n_leaves: int):
    """DFS preorder layout of a complete binary tree.

    Returns (heap_to_dfs, skip_link, is_leaf, leaf_slot):
      heap_to_dfs[h] = DFS position of heap node h (heap: children 2h+1/2h+2)
      skip_link[d]   = DFS index to jump to when node d is culled
                       (n_nodes = terminate)
      is_leaf[d]     = 1 for leaf nodes
      leaf_slot[d]   = sorted-primitive slot for leaves, -1 otherwise
    """
    n_nodes = 2 * n_leaves - 1
    heap_to_dfs = np.zeros(n_nodes, np.int32)
    skip = np.zeros(n_nodes, np.int32)
    is_leaf = np.zeros(n_nodes, np.int32)
    leaf_slot = np.full(n_nodes, -1, np.int32)

    counter = 0
    # iterative preorder: (heap_index, skip_target) stack
    stack = [(0, n_nodes)]
    while stack:
        h, skip_to = stack.pop()
        d = counter
        counter += 1
        heap_to_dfs[h] = d
        skip[d] = skip_to
        if 2 * h + 1 >= n_nodes:  # leaf
            is_leaf[d] = 1
            leaf_slot[d] = h - (n_leaves - 1)
        else:
            # right child is entered after the left subtree; its skip target
            # is ours. Left child skips to the right child = d + left_size.
            left_size = 2 * _subtree_leaves(h * 2 + 1, n_leaves) - 1
            stack.append((2 * h + 2, skip_to))
            stack.append((2 * h + 1, d + 1 + left_size))
    return heap_to_dfs, skip, is_leaf, leaf_slot


def _subtree_leaves(h: int, n_leaves: int) -> int:
    """Leaves under heap node h of a complete tree with n_leaves leaves."""
    size = 1
    while 2 * h + 1 < 2 * n_leaves - 1:
        h = 2 * h + 1
        size *= 2
    return size


_LAYOUT_CACHE: dict[int, tuple] = {}


def dfs_layout(n_leaves: int):
    if n_leaves not in _LAYOUT_CACHE:
        _LAYOUT_CACHE[n_leaves] = _dfs_layout(n_leaves)
    return _LAYOUT_CACHE[n_leaves]


# ---------------------------------------------------------------------------
# Morton codes
# ---------------------------------------------------------------------------

def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so consecutive bits are 3 apart
    (the standard 30-bit Morton interleave, in uint32 VPU ops)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes(centroids: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton code per centroid, normalized to the scene's bbox.

    Invalid (padding) primitives get the maximum code so the sort pushes
    them to the tail.
    """
    big = jnp.where(valid[:, None], centroids, jnp.nan)
    lo = jnp.nanmin(big, axis=0)
    hi = jnp.nanmax(big, axis=0)
    span = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((centroids - lo) / span * 1023.0, 0.0, 1023.0)
    q = q.astype(jnp.uint32)
    code = (
        (_expand_bits(q[:, 0]) << 2)
        | (_expand_bits(q[:, 1]) << 1)
        | _expand_bits(q[:, 2])
    )
    return jnp.where(valid, code, jnp.uint32(0xFFFFFFFF))


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------

def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@partial(jax.jit, static_argnames=())
def _build_impl(centroids, bb_min, bb_max, valid, heap_to_dfs):
    n = centroids.shape[0]  # static == n_leaves
    code = morton_codes(centroids, valid)
    order = jnp.argsort(code).astype(jnp.int32)

    # leaf boxes in sorted order; padding leaves are empty (inverted) boxes
    leaf_min = jnp.where(valid[order][:, None], bb_min[order], T_MAX)
    leaf_max = jnp.where(valid[order][:, None], bb_max[order], -T_MAX)

    # bottom-up pairwise unions: level k has n / 2^k nodes (heap order)
    levels_min = [leaf_min]
    levels_max = [leaf_max]
    m = n
    while m > 1:
        cur_min, cur_max = levels_min[-1], levels_max[-1]
        levels_min.append(
            jnp.minimum(cur_min[0::2], cur_min[1::2]))
        levels_max.append(
            jnp.maximum(cur_max[0::2], cur_max[1::2]))
        m //= 2

    # heap order = root level last; concatenate root..leaves
    heap_min = jnp.concatenate(levels_min[::-1], axis=0)
    heap_max = jnp.concatenate(levels_max[::-1], axis=0)

    # permute heap -> DFS (static permutation; scatter of n_nodes rows)
    n_nodes = 2 * n - 1
    dfs_min = jnp.zeros((n_nodes, 3), jnp.float32).at[heap_to_dfs].set(heap_min)
    dfs_max = jnp.zeros((n_nodes, 3), jnp.float32).at[heap_to_dfs].set(heap_max)
    prim_index = jnp.where(valid[order], order, -1)
    return dfs_min, dfs_max, prim_index


def build_lbvh(centroids, bb_min, bb_max, valid) -> LBVH:
    """Build the LBVH on device from per-primitive centroids and boxes.

    Inputs are padded to the scene bucket; ``valid`` masks real primitives.
    The leaf count is the bucket size (already a power of two ≥ 16).
    """
    n = centroids.shape[0]
    n_leaves = _next_pow2(n)
    if n_leaves != n:
        pad = n_leaves - n
        centroids = jnp.pad(centroids, ((0, pad), (0, 0)))
        bb_min = jnp.pad(bb_min, ((0, pad), (0, 0)))
        bb_max = jnp.pad(bb_max, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    heap_to_dfs, _, _, _ = dfs_layout(n_leaves)
    dfs_min, dfs_max, prim_index = _build_impl(
        centroids, bb_min, bb_max, valid, jnp.asarray(heap_to_dfs))
    return LBVH(bbox_min=dfs_min, bbox_max=dfs_max, prim_index=prim_index)


# ---------------------------------------------------------------------------
# traversal
# ---------------------------------------------------------------------------

def traverse(
    bvh: LBVH,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    leaf_t_fn,
    t_min: float,
    t_max: float,
):
    """Stackless skip-link traversal; returns (t, leaf_slot) per ray.

    ``leaf_t_fn(slot, o, d, cur_t) -> t`` evaluates one sorted-leaf
    primitive for one ray (T_MAX on miss). Per-ray dynamic control flow is a
    ``lax.while_loop`` under ``vmap``: lanes advance in lockstep with masked
    cursors — divergence costs the wavefront's max path length, which the
    closest-t pruning keeps short (same pruning as the reference,
    raytracer_core.cpp:212-217).

    Correct but gather-bound: each step dynamically indexes the node arrays.
    Production uses this only past the brute-force crossover (N in the
    thousands); below it the dense MXU sweep wins.
    """
    n_leaves = bvh.prim_index.shape[0]
    n_nodes = 2 * n_leaves - 1
    _, skip, is_leaf, leaf_slot = dfs_layout(n_leaves)
    skip = jnp.asarray(skip)
    is_leaf = jnp.asarray(is_leaf)
    leaf_slot_arr = jnp.asarray(leaf_slot)

    # Under shard_map(check_vma=True) the while_loop's init carry must
    # carry the rays' varying-manual-axes type (the body output varies with
    # the ray; literals type as invariant). Primary-ray origins are the
    # broadcast camera position — INVARIANT — while directions vary, so take
    # the union of both and pcast the init scalars outside the vmap.
    ray_vma = tuple(
        getattr(jax.typeof(origins), "vma", frozenset())
        | getattr(jax.typeof(directions), "vma", frozenset()))
    node_init = jnp.int32(0)
    t_init = jnp.float32(t_max)
    slot_init = jnp.int32(-1)
    if ray_vma:
        node_init, t_init, slot_init = jax.lax.pcast(
            (node_init, t_init, slot_init), ray_vma, to="varying")

    def one_ray(o, d):
        inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d,
                                jnp.where(d >= 0, 1e-20, -1e-20))

        def cond(state):
            node, _t, _slot = state
            return node < n_nodes

        def body(state):
            node, cur_t, best_slot = state
            nmin = bvh.bbox_min[node]
            nmax = bvh.bbox_max[node]
            # slab test with running interval (AABB::intersect,
            # raytracer_core.h:132-153)
            t0 = (nmin - o) * inv_d
            t1 = (nmax - o) * inv_d
            tlo = jnp.minimum(t0, t1)
            thi = jnp.maximum(t0, t1)
            enter = jnp.maximum(jnp.max(tlo), t_min)
            exit_ = jnp.minimum(jnp.min(thi), cur_t)
            hit_box = exit_ > enter

            leaf = is_leaf[node] == 1
            slot = leaf_slot_arr[node]
            t_leaf = jnp.where(
                leaf & hit_box,
                leaf_t_fn(slot, o, d, cur_t),
                T_MAX,
            )
            better = t_leaf < cur_t
            cur_t = jnp.where(better, t_leaf, cur_t)
            best_slot = jnp.where(better, slot, best_slot)

            nxt = jnp.where(hit_box & ~leaf, node + 1, skip[node])
            return nxt, cur_t, best_slot

        _, t, slot = jax.lax.while_loop(
            cond, body, (node_init, t_init, slot_init))
        return t, slot

    return jax.vmap(one_ray)(origins, directions)


def sphere_leaf_fn(scene):
    """Per-leaf sphere intersection closure for ``traverse``.

    slot -> sorted primitive; quadratic in the stable oc-form
    (raytracer_core.h:194-207).
    """
    def leaf_t(slot, o, d, cur_t, *, prim_index, t_min=1e-3):
        idx = prim_index[slot]
        ok_idx = idx >= 0
        center = scene.center[jnp.maximum(idx, 0)]
        radius = scene.radius[jnp.maximum(idx, 0)]
        oc = o - center
        a = jnp.sum(d * d)
        half_b = jnp.sum(oc * d)
        cq = jnp.sum(oc * oc) - radius * radius
        disc = half_b * half_b - a * cq
        sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
        root0 = (-half_b - sqrtd) / a
        root1 = (-half_b + sqrtd) / a
        in0 = (root0 >= t_min) & (root0 <= cur_t)
        in1 = (root1 >= t_min) & (root1 <= cur_t)
        root = jnp.where(in0, root0, root1)
        ok = ok_idx & (disc >= 0.0) & (in0 | in1)
        return jnp.where(ok, root, T_MAX)

    return leaf_t


def intersect_spheres_bvh(scene, bvh: LBVH, origins, directions):
    """BVH-accelerated closest sphere hit: (t, original_prim_index) per ray.

    prim index is -1 on miss. Validated against intersect_brute
    (tests/test_bvh.py) — the same oracle relationship the reference keeps
    between its BVH and brute-force paths (SURVEY.md §4).
    """
    leaf_fn = sphere_leaf_fn(scene)

    def leaf_t(slot, o, d, cur_t):
        return leaf_fn(slot, o, d, cur_t, prim_index=bvh.prim_index)

    t, slot = traverse(bvh, origins, directions, leaf_t, 1e-3, T_MAX)
    prim = jnp.where(slot >= 0, bvh.prim_index[jnp.maximum(slot, 0)], -1)
    hit = (t < T_MAX) & (prim >= 0)
    return jnp.where(hit, t, T_MAX), jnp.where(hit, prim, -1)


def scene_lbvh(scene) -> LBVH:
    """Build the LBVH for a sphere scene (bbox = center ± r,
    Sphere::update_bbox, raytracer_core.h:187-190)."""
    r = scene.radius[:, None]
    return build_lbvh(scene.center, scene.center - r, scene.center + r,
                      scene.valid)


def intersect_spheres_bvh_hit(scene, bvh: LBVH, origins, directions):
    """BVH-accelerated closest hit returning the same Hit SoA as
    intersect_brute — the drop-in intersector for the integrator's
    ``use_bvh`` path (large scenes, where the dense (R, N) sweep no longer
    fits the MXU budget).

    Attribute fetch here is a per-ray gather on the winning primitive index:
    O(1) per ray, appropriate past the brute-force crossover where a one-hot
    (R, N) matmul would dominate.
    """
    from .intersect import Hit

    t, prim = intersect_spheres_bvh(scene, bvh, origins, directions)
    hit = prim >= 0
    idx = jnp.maximum(prim, 0)
    center = scene.center[idx]
    radius = scene.radius[idx]
    inv_r = jnp.where(radius > 0.0, 1.0 / radius, 0.0)
    point = origins + directions * t[:, None]
    normal = (point - center) * inv_r[:, None]
    return Hit(
        hit=hit,
        t=jnp.where(hit, t, T_MAX),
        normal=normal,
        albedo=scene.albedo[idx],
        metallic=scene.metallic[idx],
        roughness=scene.roughness[idx],
        emission=scene.emission[idx],
        ior=scene.ior[idx],
        object_id=jnp.where(hit, scene.object_id[idx].astype(jnp.float32),
                            -1.0),
    )
