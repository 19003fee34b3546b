"""Core math / types / camera tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_rt.core import camera as cammod
from tpu_rt.core import rng as rngmod
from tpu_rt.core import types as T
from tpu_rt.core import vecmath as vm

from oracle import camera_ray


def test_vec_ops(rng_np):
    a = rng_np.normal(size=(32, 3)).astype(np.float32)
    b = rng_np.normal(size=(32, 3)).astype(np.float32)
    np.testing.assert_allclose(vm.dot(a, b), np.sum(a * b, -1), rtol=1e-5)
    np.testing.assert_allclose(vm.cross(a, b), np.cross(a, b), rtol=1e-4, atol=1e-5)
    n = np.asarray(vm.normalize(a))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)


def test_normalize_zero_vector():
    out = np.asarray(vm.normalize(jnp.zeros((4, 3))))
    np.testing.assert_allclose(out, np.tile([0, 0, 1.0], (4, 1)))


def test_reflect():
    v = jnp.array([[1.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(vm.reflect(v, n)), [[1.0, 1.0, 0.0]])


def test_refract_snell():
    # straight-on ray refracts straight through
    v = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    can, r = vm.refract(v, n, jnp.array([0.5]))
    assert bool(can[0])
    np.testing.assert_allclose(np.asarray(r)[0], [0.0, -1.0, 0.0], atol=1e-6)
    # total internal reflection: grazing exit from dense medium
    v2 = jnp.array([[0.99, -0.14106736, 0.0]])
    can2, _ = vm.refract(v2, n, jnp.array([1.5]))
    assert not bool(can2[0])


def test_schlick_limits():
    s0 = float(vm.schlick(jnp.float32(1.0), jnp.float32(1.5)))
    r0 = ((1 - 1.5) / (1 + 1.5)) ** 2
    assert abs(s0 - r0) < 1e-6
    s90 = float(vm.schlick(jnp.float32(0.0), jnp.float32(1.5)))
    assert abs(s90 - 1.0) < 1e-6


def test_scene_bucketing():
    s = T.demo_scene()
    assert s.capacity == 16
    assert int(s.valid.sum()) == 9
    assert T.sphere_bucket(17) == 32
    # padding spheres are inert
    assert float(s.radius[9:].max()) == 0.0


def test_demo_scene_matches_reference_data():
    s = T.demo_scene()
    np.testing.assert_allclose(np.asarray(s.background), [0.05, 0.05, 0.1])
    np.testing.assert_allclose(np.asarray(s.center[0]), [0, -100.5, 0])
    assert float(s.radius[0]) == 100.0
    np.testing.assert_allclose(np.asarray(s.emission[6]), [10, 10, 8])
    assert float(s.metallic[1]) == np.float32(0.9)


def test_camera_rays_match_oracle(rng_np):
    cam = T.make_camera(position=(0, 2, 5), target=(0, 0, -1), fov=45.0,
                        aspect=640 / 480)
    us = rng_np.uniform(size=(64,)).astype(np.float32)
    vs = rng_np.uniform(size=(64,)).astype(np.float32)
    o, d = cammod.generate_rays(cam, jnp.asarray(us), jnp.asarray(vs))
    o, d = np.asarray(o), np.asarray(d)
    for k in range(64):
        oo, dd = camera_ray((0, 2, 5), (0, 0, -1), us[k], vs[k], 45.0, 640 / 480)
        np.testing.assert_allclose(o[k], oo, atol=1e-5)
        np.testing.assert_allclose(d[k], dd, atol=1e-5)


def test_camera_degenerate_lookdown():
    # forward parallel to world up -> right falls back to +X
    cam = T.make_camera(position=(0, 5, 0), target=(0, 0, 0))
    _, right, _ = cammod.basis(cam)
    np.testing.assert_allclose(np.asarray(right), [1, 0, 0])


def test_unit_ball_is_uniform_in_ball():
    key = jax.random.key(0)
    p = np.asarray(rngmod.unit_ball(key, (20000,)))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # radius CDF of uniform ball: P(r < x) = x^3
    for x in (0.5, 0.8):
        frac = (r < x).mean()
        assert abs(frac - x**3) < 0.02
    # isotropy: mean ~ 0
    assert np.abs(p.mean(0)).max() < 0.02


def test_hemisphere_sides():
    key = jax.random.key(1)
    n = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (5000, 1))
    h = np.asarray(rngmod.hemisphere(key, n))
    assert (h[:, 1] >= 0).all()


def test_scene_library():
    from tpu_rt.core.scenes import cornell_box, random_spheres

    a = random_spheres(32, seed=5)
    b = random_spheres(32, seed=5)
    import numpy as np

    np.testing.assert_array_equal(np.asarray(a.center), np.asarray(b.center))
    assert int(a.valid.sum()) == 32
    assert float(a.radius[0]) == 1000.0  # ground
    c = random_spheres(32, seed=6)
    assert not np.array_equal(np.asarray(a.center), np.asarray(c.center))

    spheres, mesh = cornell_box()
    assert int(spheres.valid.sum()) == 2
    assert int(np.asarray(mesh.valid).sum()) == 12  # 6 quads
    em = np.asarray(mesh.emission)[np.asarray(mesh.valid)]
    assert (em.max(axis=-1) > 0).sum() == 2  # light quad = 2 triangles
