"""Every capability x every engine: the dispatch-level contract
(VERDICT r3 item 3).

The reference exposes ONE render() that does everything
(cpp_raytracer/binding.cpp:99-101); tpu-rt resolves an engine per call, so
this matrix pins the plumbing: every feature-flag combination must reach
the resolved engine's entry point with the flags intact — no ValueError,
no silently dropped flag, no downgrade to a slower engine. Estimator-level
equivalence per feature is covered elsewhere (test_nee, test_stratify,
test_adaptive, test_dof, test_cluster); executing every combination
through the compiled kernels would be hours of Mosaic compiles, so the
engines are stubbed and their received kwargs asserted.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_rt
from tpu_rt.core.scenes import random_spheres
from tpu_rt.ops.triangle import make_mesh
from tpu_rt.render import frame as fr

W, H = 16, 8


def small_mesh():
    v = np.array([[0, 0, -3], [1, 0, -3], [0, 1, -3]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    return make_mesh(v, f, albedo=(0.5, 0.5, 0.5))


@pytest.fixture
def capture(monkeypatch):
    """Stub all three engine entry points; record (engine, kwargs)."""
    calls = []

    def fake_cluster(scene, cam, seed, **kw):
        calls.append(("cluster", kw))
        return jnp.zeros((kw.get("height", H), kw.get("width", W), 3))

    def fake_pallas(scene, cam, seed, **kw):
        calls.append(("pallas", kw))
        return jnp.zeros((kw.get("height", H), kw.get("width", W), 3))

    def fake_lax(scene, cam, key, **kw):
        calls.append(("lax", kw))
        return jnp.zeros((kw["height"], kw["width"], 3))

    import tpu_rt.ops.pallas_cluster as pc
    import tpu_rt.ops.pallas_megakernel as pm

    monkeypatch.setattr(pc, "render_cluster", fake_cluster)
    monkeypatch.setattr(pm, "render_pallas", fake_pallas)
    monkeypatch.setattr(fr, "_render_lax", fake_lax)
    monkeypatch.setattr(fr, "_on_tpu", lambda s: True)
    # the cluster path prebuilds tables before dispatch; stub that too
    # (the dispatch layer reads prebuilt.attr.shape for the tri cache key)
    class _FakePrebuilt:
        attr = np.zeros((1, 1, 1), np.int32)

    monkeypatch.setattr(fr, "_cached_clusters",
                        lambda builder, obj, anchor, key: _FakePrebuilt())
    # ... and the round-5 eager near-to-far ordering memo, which would
    # otherwise push the fake prebuilt through order_clusters
    monkeypatch.setattr(fr, "_cached_ordered", lambda prebuilt, pos: prebuilt)
    return calls


SCENES = {
    "pallas": lambda: tpu_rt.demo_scene(),          # <= 64 spheres
    "cluster": lambda: random_spheres(128, seed=1),  # past the bucket
}


@pytest.mark.parametrize("engine", ["pallas", "cluster"])
@pytest.mark.parametrize("nee,stratify,adaptive,with_mesh", [
    t for t in itertools.product([False, True], repeat=4)])
def test_pallas_engines_receive_every_flag(capture, engine, nee, stratify,
                                           adaptive, with_mesh):
    scene = SCENES[engine]()
    cam = tpu_rt.make_camera(aspect=W / H)
    mesh = small_mesh() if with_mesh else None
    if adaptive:
        n_tiles = (fr.cluster_tile_map(W, H)[1] if engine == "cluster"
                   else -(-W * H // 4096))
        tile_mask = jnp.ones((n_tiles,), jnp.int32)
    else:
        tile_mask = None
    fr.render(scene, cam, jax.random.key(0), width=W, height=H, spp=1,
              max_depth=1, engine=engine, nee=nee, stratify=stratify,
              tile_mask=tile_mask, mesh=mesh, seed=0,
              n_active=4, n_tri_active=4 if with_mesh else None)
    (got_engine, kw), = capture
    assert got_engine == engine
    assert kw.get("nee", False) is nee
    assert kw.get("stratify", False) is stratify
    assert (kw.get("tile_mask") is not None) is adaptive
    assert (kw.get("mesh") is not None) is with_mesh


@pytest.mark.parametrize("nee,stratify,with_mesh,use_bvh", [
    t for t in itertools.product([False, True], repeat=4)])
def test_lax_engine_receives_every_flag(capture, nee, stratify, with_mesh,
                                        use_bvh):
    scene = tpu_rt.demo_scene()
    cam = tpu_rt.make_camera(aspect=W / H)
    mesh = small_mesh() if with_mesh else None
    fr.render(scene, cam, jax.random.key(0), width=W, height=H, spp=1,
              max_depth=1, engine="lax", nee=nee, stratify=stratify,
              mesh=mesh, use_bvh=use_bvh)
    (got_engine, kw), = capture
    assert got_engine == "lax"
    assert kw.get("nee", False) is nee
    assert kw.get("stratify", False) is stratify
    assert kw.get("use_bvh", False) is use_bvh
    assert (kw.get("mesh") is not None) is with_mesh


def test_auto_dispatch_keeps_cluster_for_nee(capture):
    """The round-3 downgrade cliff is gone: a 128-sphere nee render stays
    on the cluster engine under engine='auto'."""
    scene = SCENES["cluster"]()
    cam = tpu_rt.make_camera(aspect=W / H)
    fr.render(scene, cam, jax.random.key(0), width=W, height=H, spp=1,
              max_depth=1, nee=True, seed=0, n_active=128)
    (got_engine, kw), = capture
    assert got_engine == "cluster"
    assert kw["nee"] is True


def test_tile_mask_on_lax_still_raises(capture):
    scene = tpu_rt.demo_scene()
    cam = tpu_rt.make_camera(aspect=W / H)
    with pytest.raises(ValueError, match="tile_mask"):
        fr.render(scene, cam, jax.random.key(0), width=W, height=H, spp=1,
                  engine="lax", tile_mask=jnp.ones((2,), jnp.int32))


def test_sharded_entry_accepts_nee_and_stratify():
    """render_sharded's signature covers the round-3 estimator features
    for every engine (execution is covered by test_parallel.py's 8-device
    interpret tests)."""
    import inspect

    from tpu_rt.parallel.mesh import render_sharded

    params = inspect.signature(render_sharded).parameters
    assert "nee" in params and "stratify" in params


def test_cluster_tile_map_geometry():
    tm, n = fr.cluster_tile_map(200, 70)
    assert n == 2 * 3  # ceil(200/128) x ceil(70/32)
    assert tm.shape == (70, 200)
    assert int(tm[0, 0]) == 0
    assert int(tm[0, 199]) == 1
    assert int(tm[32, 0]) == 2
    assert int(tm[64, 128]) == 5


def test_accumulate_tiled_mapped_merges_and_freezes():
    tm, n = fr.cluster_tile_map(256, 64)  # 2x2 tiles
    acc = jnp.zeros((64, 256, 3))
    counts = jnp.zeros((n,))
    batch = jnp.ones((64, 256, 3))
    mask = jnp.array([1, 0, 1, 1], jnp.int32)
    acc2, counts2, change = fr.accumulate_tiled_mapped(
        acc, counts, batch, mask, 4, tm, n)
    a = np.asarray(acc2)
    # masked tile (0, 1): stays at its accumulated value (0)
    assert np.all(a[:32, 128:] == 0.0)
    # active tiles: first merge takes the batch wholesale
    assert np.allclose(a[:32, :128], 1.0)
    assert np.allclose(np.asarray(counts2), [4, 0, 4, 4])
    c = np.asarray(change)
    assert c[1] == 0.0 and np.all(c[[0, 2, 3]] > 0.0)
