"""LBVH build + traversal vs brute-force oracle (randomized scenes).

The BVH-vs-brute-force equivalence is the same implicit harness the
reference keeps via its use_bvh flag (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_rt.core import types as T
from tpu_rt.ops import bvh as B
from tpu_rt.ops import intersect as I


def random_scene(rng, n, spread=10.0):
    centers = rng.uniform(-spread, spread, size=(n, 3))
    radii = rng.uniform(0.1, 1.0, size=(n,))
    return T.make_scene(
        centers=centers, radii=radii,
        albedos=np.full((n, 3), 0.5), metallics=np.zeros(n),
        roughnesses=np.full(n, 0.5), emissions=np.zeros((n, 3)),
    )


def random_rays(rng, R, spread=12.0):
    o = rng.uniform(-spread, spread, size=(R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3))
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def test_dfs_layout_topology():
    # 4-leaf tree: preorder = root, L, LL, LR, R, RL, RR
    heap_to_dfs, skip, is_leaf, leaf_slot = B.dfs_layout(4)
    assert list(heap_to_dfs) == [0, 1, 4, 2, 3, 5, 6]
    assert list(is_leaf) == [0, 0, 1, 1, 0, 1, 1]
    # culling the root exits; culling L jumps to R
    assert skip[0] == 7
    assert skip[1] == 4
    assert list(leaf_slot[is_leaf == 1]) == [0, 1, 2, 3]


def test_morton_orders_spatially(rng_np):
    pts = jnp.asarray(np.array([[0, 0, 0], [10, 10, 10], [0.1, 0, 0],
                                [9.9, 10, 10]], np.float32))
    codes = B.morton_codes(pts, jnp.ones(4, bool))
    order = np.argsort(np.asarray(codes))
    # near-origin points adjacent, far points adjacent
    assert {tuple(order[:2]), tuple(order[2:])} == {(0, 2), (1, 3)} or \
           {tuple(sorted(order[:2])), tuple(sorted(order[2:]))} == {(0, 2), (1, 3)}


def test_build_root_covers_scene(rng_np):
    scene = random_scene(rng_np, 33)
    bvh = B.scene_lbvh(scene)
    root_min = np.asarray(bvh.bbox_min[0])
    root_max = np.asarray(bvh.bbox_max[0])
    c = np.asarray(scene.center)[np.asarray(scene.valid)]
    r = np.asarray(scene.radius)[np.asarray(scene.valid)]
    assert (root_min <= (c - r[:, None]).min(0) + 1e-5).all()
    assert (root_max >= (c + r[:, None]).max(0) - 1e-5).all()


@pytest.mark.parametrize("n", [2, 9, 33, 100])
def test_bvh_matches_brute_force(rng_np, n):
    scene = random_scene(rng_np, n)
    bvh = B.scene_lbvh(scene)
    o, d = random_rays(rng_np, 512)
    t_bvh, prim_bvh = B.intersect_spheres_bvh(scene, bvh, o, d)
    brute = I.intersect_brute(scene, o, d)

    t_bvh = np.asarray(t_bvh)
    prim_bvh = np.asarray(prim_bvh)
    bt = np.asarray(brute.t)
    bid = np.asarray(brute.object_id).astype(int)  # id == index here
    hit_b = np.asarray(brute.hit)

    hit_v = t_bvh < T.T_MAX
    agree = hit_v == hit_b
    assert agree.mean() > 0.998, f"hit/miss disagreement {1-agree.mean():.4%}"
    both = hit_v & hit_b
    # same primitive (or same t for coincident surfaces)
    same = (prim_bvh[both] == bid[both]) | (
        np.abs(t_bvh[both] - bt[both]) < 1e-3)
    assert same.mean() > 0.998
    np.testing.assert_allclose(t_bvh[both], bt[both], rtol=1e-3, atol=1e-3)


def test_bvh_rebuild_after_edit(rng_np):
    scene = random_scene(rng_np, 9)
    bvh1 = B.scene_lbvh(scene)
    # move a sphere: rebuilding must change the tree, and traversal must
    # track the move
    moved = scene._replace(
        center=scene.center.at[3].set(jnp.array([50.0, 0.0, 0.0])))
    bvh2 = B.scene_lbvh(moved)
    o = jnp.array([[50.0, 0.0, -20.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t_new, prim_new = B.intersect_spheres_bvh(moved, bvh2, o, d)
    assert int(prim_new[0]) == 3
    t_old, prim_old = B.intersect_spheres_bvh(scene, bvh1, o, d)
    assert int(prim_old[0]) != 3


def test_render_with_bvh_matches_brute(rng_np):
    """The integrator's use_bvh path produces the same image as the dense
    sweep (same RNG stream, same estimator — only the intersector differs)."""
    import jax
    from tpu_rt.core import types as T
    from tpu_rt.render.frame import render

    scene = random_scene(rng_np, 100, spread=6.0)
    cam = T.make_camera(position=(0, 3, 18), target=(0, 0, 0), aspect=1.0)
    a = np.asarray(render(scene, cam, jax.random.key(0), width=24, height=24,
                          spp=2, max_depth=3, engine="lax", use_bvh=True))
    b = np.asarray(render(scene, cam, jax.random.key(0), width=24, height=24,
                          spp=2, max_depth=3, engine="lax", use_bvh=False))
    # identical RNG; only near-tangential f32 differences possible
    assert (np.abs(a - b) < 1e-3).mean() > 0.995
