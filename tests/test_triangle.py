"""Triangle-mesh intersection: scalar MT oracle equivalence + BVH parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_rt.core.types import T_MAX
from tpu_rt.ops import triangle as TR
from tpu_rt.ops.bvh import T_MAX as _  # noqa: F401 (same constant)


def mt_oracle(v0, v1, v2, o, d, t_min=1e-3, t_max=1e10):
    """Textbook scalar Moller-Trumbore."""
    e1, e2 = v1 - v0, v2 - v0
    pvec = np.cross(d, e2)
    det = np.dot(e1, pvec)
    if abs(det) <= 1e-9:
        return None
    inv = 1.0 / det
    tvec = o - v0
    u = np.dot(tvec, pvec) * inv
    if u < 0 or u > 1:
        return None
    qvec = np.cross(tvec, e1)
    v = np.dot(d, qvec) * inv
    if v < 0 or u + v > 1:
        return None
    t = np.dot(e2, qvec) * inv
    if t < t_min or t > t_max:
        return None
    return t


def random_mesh(rng, n_tris, spread=5.0):
    v0 = rng.uniform(-spread, spread, (n_tris, 3))
    v1 = v0 + rng.normal(0, 1.0, (n_tris, 3))
    v2 = v0 + rng.normal(0, 1.0, (n_tris, 3))
    verts = np.concatenate([v0, v1, v2], axis=0).astype(np.float32)
    faces = np.arange(3 * n_tris).reshape(3, n_tris).T
    return TR.make_mesh(verts, faces), verts, faces


def random_rays(rng, R, spread=8.0):
    o = rng.uniform(-spread, spread, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3))
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    return o, d


def test_single_triangle_hit_miss():
    mesh = TR.make_mesh(
        [[-1, -1, -3], [1, -1, -3], [0, 1, -3]], [[0, 1, 2]])
    o = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [5.0, 5.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0], [0.0, 0.0, -1.0]])
    h = TR.intersect_mesh_brute(mesh, o, d)
    assert bool(h.hit[0]) and not bool(h.hit[1]) and not bool(h.hit[2])
    assert abs(float(h.t[0]) - 3.0) < 1e-5
    # ray-opposing normal
    assert float(h.normal[0, 2]) > 0.99


def test_brute_matches_mt_oracle(rng_np):
    mesh, verts, faces = random_mesh(rng_np, 40)
    o, d = random_rays(rng_np, 256)
    h = TR.intersect_mesh_brute(mesh, jnp.asarray(o), jnp.asarray(d))
    hit = np.asarray(h.hit)
    t = np.asarray(h.t)
    for k in range(256):
        best = None
        for f in range(40):
            tv = mt_oracle(verts[faces[f, 0]].astype(float),
                           verts[faces[f, 1]].astype(float),
                           verts[faces[f, 2]].astype(float),
                           o[k].astype(float), d[k].astype(float))
            if tv is not None and (best is None or tv < best):
                best = tv
        if best is None:
            assert not hit[k], f"ray {k}: false hit t={t[k]}"
        else:
            assert hit[k], f"ray {k}: missed, oracle t={best}"
            assert abs(t[k] - best) < 1e-2 * max(1.0, best), (t[k], best)


def test_box_from_inside_and_outside():
    b = TR.box(center=(0, 0, -5), size=(2, 2, 2))
    assert int(np.asarray(b.valid).sum()) == 12
    o = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    h = TR.intersect_mesh_brute(b, o, d)
    assert abs(float(h.t[0]) - 4.0) < 1e-5   # outside -> front face
    assert abs(float(h.t[1]) - 1.0) < 1e-5   # inside -> wall at +x
    # normals oppose rays
    assert float(h.normal[0, 2]) > 0.99
    assert float(h.normal[1, 0]) < -0.99


@pytest.mark.parametrize("n", [8, 100, 300])
def test_mesh_bvh_matches_brute(rng_np, n):
    mesh, _, _ = random_mesh(rng_np, n)
    bvh = TR.mesh_lbvh(mesh)
    o, d = random_rays(rng_np, 512)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_bvh, prim = TR.intersect_mesh_bvh(mesh, bvh, o, d)
    brute = TR.intersect_mesh_brute(mesh, o, d)
    t_bvh = np.asarray(t_bvh)
    tb = np.asarray(brute.t)
    hit_v = t_bvh < T_MAX
    hit_b = np.asarray(brute.hit)
    assert (hit_v == hit_b).mean() > 0.998
    both = hit_v & hit_b
    np.testing.assert_allclose(t_bvh[both], tb[both], rtol=1e-3, atol=1e-3)


def test_merge_meshes():
    a = TR.box(center=(0, 0, -5), size=(1, 1, 1), object_id=1)
    b = TR.quad((-5, 0, -5), (5, 0, -5), (5, 0, 5), (-5, 0, 5), object_id=2)
    m = TR.merge_meshes([a, b])
    assert int(np.asarray(m.valid).sum()) == 14
    ids = np.asarray(m.object_id)[np.asarray(m.valid)]
    assert set(ids) == {1, 2}


def test_render_mesh_scene():
    """End-to-end path trace of a combined sphere+mesh scene."""
    import jax
    from tpu_rt.core import types as T
    from tpu_rt.render import frame as F

    # emissive ceiling quad + diffuse box + sphere ground
    light = TR.quad((-2, 4, -7), (2, 4, -7), (2, 4, -3), (-2, 4, -3),
                    emission=(8.0, 8.0, 8.0), albedo=(0, 0, 0), object_id=10)
    cube = TR.box(center=(0, 0.5, -5), size=(1, 1, 1),
                  albedo=(0.8, 0.2, 0.2), object_id=11)
    mesh = TR.merge_meshes([light, cube])
    ground = T.make_scene(
        centers=[(0.0, -100.0, 0.0)], radii=[100.0], albedos=[(0.7, 0.7, 0.7)],
        metallics=[0.0], roughnesses=[0.5], emissions=[(0, 0, 0)],
        background=(0.0, 0.0, 0.0),
    )
    cam = T.make_camera(position=(0, 2, 0), target=(0, 0.5, -5), aspect=1.0)
    img = np.asarray(F.render(ground, cam, jax.random.key(0), width=32,
                              height=32, spp=8, max_depth=3, mesh=mesh))
    assert np.isfinite(img).all()
    # the lit cube region is brighter than the unlit sky corners
    assert img[12:20, 12:20].mean() > img[:4, :4].mean() + 0.05
    # red cube: center pixels are red-dominant
    center = img[14:18, 14:18]
    assert center[..., 0].mean() > center[..., 2].mean()


def test_mesh_bvh_hit_matches_brute_on_terrain(rng_np):
    """intersect_mesh_bvh_hit vs the brute oracle on a >=1k-triangle scene
    (VERDICT round 1 item 2 / BASELINE config #2: BVH traversal parity)."""
    from tpu_rt.core.scenes import terrain_mesh

    _, mesh = terrain_mesh(n=24)
    assert int(np.asarray(mesh.valid).sum()) >= 1000
    bvh = TR.mesh_lbvh(mesh)
    o, d = random_rays(rng_np, 1024, spread=10.0)
    o = jnp.asarray(o); d = jnp.asarray(d)

    hb = TR.intersect_mesh_brute(mesh, o, d)
    hv = TR.intersect_mesh_bvh_hit(mesh, bvh, o, d)

    hit_b = np.asarray(hb.hit)
    hit_v = np.asarray(hv.hit)
    agree = hit_v == hit_b
    assert agree.mean() > 0.998, f"hit/miss disagreement {1-agree.mean():.4%}"
    both = hit_v & hit_b
    np.testing.assert_allclose(np.asarray(hv.t)[both], np.asarray(hb.t)[both],
                               rtol=1e-3, atol=1e-3)
    same_prim = (np.asarray(hv.object_id)[both] == np.asarray(hb.object_id)[both]) | (
        np.abs(np.asarray(hv.t)[both] - np.asarray(hb.t)[both]) < 1e-4)
    assert same_prim.mean() > 0.998
    # attributes of agreeing hits match (albedo is per-face random)
    match = both & (np.asarray(hv.object_id) == np.asarray(hb.object_id))
    np.testing.assert_allclose(np.asarray(hv.albedo)[match],
                               np.asarray(hb.albedo)[match], atol=1e-5)
    np.testing.assert_allclose(np.asarray(hv.normal)[match],
                               np.asarray(hb.normal)[match], atol=1e-4)


def test_trace_mesh_bvh_image_matches_brute(rng_np):
    """use_bvh=True accelerates the mesh too: same image as brute through
    the full integrator (same RNG stream, only the intersector differs)."""
    import jax
    from tpu_rt.core import types as T
    from tpu_rt.core.scenes import terrain_mesh
    from tpu_rt.render.frame import render

    spheres, mesh = terrain_mesh(n=24)
    cam = T.make_camera(position=(0, 5, 6), target=(0, 0, -12), aspect=1.0)
    a = np.asarray(render(spheres, cam, jax.random.key(3), width=24,
                          height=24, spp=2, max_depth=3, engine="lax",
                          mesh=mesh, use_bvh=True))
    b = np.asarray(render(spheres, cam, jax.random.key(3), width=24,
                          height=24, spp=2, max_depth=3, engine="lax",
                          mesh=mesh, use_bvh=False))
    assert (np.abs(a - b) < 1e-3).mean() > 0.995
