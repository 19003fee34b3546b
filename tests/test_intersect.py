"""Intersector vs scalar oracle equivalence (randomized scenes/rays)."""

import jax.numpy as jnp
import numpy as np

from tpu_rt.core import types as T
from tpu_rt.ops import intersect as I

from oracle import scene_hit


def random_scene(rng, n):
    centers = rng.uniform(-5, 5, size=(n, 3))
    radii = rng.uniform(0.1, 1.5, size=(n,))
    return T.make_scene(
        centers=centers, radii=radii,
        albedos=np.full((n, 3), 0.5), metallics=np.zeros(n),
        roughnesses=np.full(n, 0.5), emissions=np.zeros((n, 3)),
    ), centers, radii


def test_brute_matches_oracle(rng_np):
    for n in (1, 4, 9, 33):
        scene, centers, radii = random_scene(rng_np, n)
        R = 256
        o = rng_np.uniform(-8, 8, size=(R, 3)).astype(np.float32)
        d = rng_np.normal(size=(R, 3))
        d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)

        h = I.intersect_brute(scene, jnp.asarray(o), jnp.asarray(d))
        hit = np.asarray(h.hit)
        t = np.asarray(h.t)
        # object_id defaults to arange, so id == sphere index here
        idx = np.asarray(h.object_id).astype(int)

        def grazing(k, i):
            # Perpendicular distance from center to the ray ~ radius means a
            # tangential hit: f32 and f64 legitimately disagree there.
            oc = centers[i] - o[k].astype(float)
            dd = d[k].astype(float)
            perp = np.linalg.norm(oc - np.dot(oc, dd) * dd)
            return abs(perp - radii[i]) < 5e-3 * max(1.0, radii[i])

        for k in range(R):
            oi, ot = scene_hit(centers, radii, o[k].astype(float), d[k].astype(float))
            if oi is None:
                assert not hit[k] or grazing(k, idx[k]), f"ray {k}: false hit"
            else:
                if grazing(k, oi):
                    continue
                assert hit[k], f"ray {k}: missed (oracle t={ot})"
                assert idx[k] == oi, f"ray {k}: sphere {idx[k]} vs oracle {oi}"
                assert abs(t[k] - ot) < 1e-3 * max(1.0, ot)


def test_normals_are_outward_unit(rng_np):
    scene, centers, radii = random_scene(rng_np, 9)
    R = 128
    o = rng_np.uniform(-8, 8, size=(R, 3)).astype(np.float32)
    d = rng_np.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h = I.intersect_brute(scene, jnp.asarray(o), jnp.asarray(d))
    hit = np.asarray(h.hit)
    nrm = np.asarray(h.normal)[hit]
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-3)


def test_padding_never_hits():
    # A scene whose only content sits far away; rays through the padding
    # region (origin) must miss.
    scene = T.make_scene(
        centers=[(50.0, 0, 0)], radii=[1.0], albedos=[(1, 1, 1)],
        metallics=[0.0], roughnesses=[0.5], emissions=[(0, 0, 0)],
    )
    o = jnp.zeros((8, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (8, 1))
    h = I.intersect_brute(scene, o, d)
    assert not bool(np.asarray(h.hit).any())


def test_inside_sphere_second_root():
    # Ray starting inside a sphere must take the far root.
    scene = T.make_scene(
        centers=[(0.0, 0, 0)], radii=[2.0], albedos=[(1, 1, 1)],
        metallics=[0.0], roughnesses=[0.5], emissions=[(0, 0, 0)],
    )
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = I.intersect_brute(scene, o, d)
    assert bool(h.hit[0])
    assert abs(float(h.t[0]) - 2.0) < 1e-5


def test_selection_ray(rng_np):
    scene = T.demo_scene()
    # Ray from the default camera toward the red metallic sphere at (-2,.5,-3)
    o = jnp.array([0.0, 2.0, 5.0])
    d = jnp.asarray((np.array([-2, 0.5, -3]) - np.array([0, 2, 5.0])))
    d = d / jnp.linalg.norm(d)
    oid = int(I.closest_object_id(scene, o, d))
    assert oid == 1
    # Skipping ground: straight down from above the ground hits nothing else
    o2 = jnp.array([0.0, 2.0, 0.0])
    d2 = jnp.array([0.0, -1.0, 0.0])
    assert int(I.closest_object_id(scene, o2, d2)) == 0
    assert int(I.closest_object_id(scene, o2, d2, skip_object_id=0)) == -1
