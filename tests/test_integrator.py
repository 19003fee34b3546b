"""Integrator semantics tests: deterministic paths, RR, energy, parity modes."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_rt.core import types as T
from tpu_rt.ops.integrator import trace


def _single_sphere(emission=(0, 0, 0), albedo=(0.5, 0.5, 0.5), metallic=0.0,
                   roughness=0.5, background=(0.1, 0.1, 0.1)):
    return T.make_scene(
        centers=[(0.0, 0.0, -3.0)], radii=[1.0], albedos=[albedo],
        metallics=[metallic], roughnesses=[roughness], emissions=[emission],
        background=background,
    )


KEY = jax.random.key(7)


def test_miss_returns_background():
    scene = _single_sphere(background=(0.2, 0.3, 0.4))
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 1.0, 0.0]])  # up: misses
    c = np.asarray(trace(scene, o, d, KEY, max_depth=4))
    np.testing.assert_allclose(c[0], [0.2, 0.3, 0.4], atol=1e-6)


def test_depth1_hit_returns_emission():
    scene = _single_sphere(emission=(3.0, 2.0, 1.0))
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    c = np.asarray(trace(scene, o, d, KEY, max_depth=1))
    np.testing.assert_allclose(c[0], [3.0, 2.0, 1.0], atol=1e-6)
    # v1 estimator agrees at depth 1
    c1 = np.asarray(trace(scene, o, d, KEY, max_depth=1, mode="v1"))
    np.testing.assert_allclose(c1[0], [3.0, 2.0, 1.0], atol=1e-6)


def test_depth2_diffuse_sees_background_through_albedo():
    # Pure-diffuse sphere, black emission: depth-2 radiance is
    # albedo * background for every sample that escapes (all of them:
    # the scene has one sphere and scatter directions leave it).
    scene = _single_sphere(albedo=(0.5, 0.25, 0.125), background=(1.0, 1.0, 1.0))
    R = 4096
    o = jnp.tile(jnp.array([[0.0, 0.0, 0.0]]), (R, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R, 1))
    c = np.asarray(trace(scene, o, d, KEY, max_depth=2))
    np.testing.assert_allclose(c.mean(0), [0.5, 0.25, 0.125], atol=0.02)


def test_mirror_metal_deterministic():
    # roughness 0 metal = perfect mirror: ray straight at sphere center
    # reflects straight back and escapes to background * albedo.
    scene = _single_sphere(albedo=(0.9, 0.8, 0.7), metallic=1.0, roughness=0.0,
                           background=(1.0, 1.0, 1.0))
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    c = np.asarray(trace(scene, o, d, KEY, max_depth=4))
    np.testing.assert_allclose(c[0], [0.9, 0.8, 0.7], atol=1e-5)


def test_russian_roulette_unbiased_v2():
    # A diffuse "furnace": sphere albedo a, white background. With unbiased
    # RR the estimator mean must stay near the analytic geometric series
    # regardless of depth. We check depth-8 mean ~ depth-4 mean.
    scene = _single_sphere(albedo=(0.8, 0.8, 0.8), background=(1.0, 1.0, 1.0))
    R = 8192
    o = jnp.tile(jnp.array([[0.0, 0.0, 0.0]]), (R, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R, 1))
    k1, k2 = jax.random.split(KEY)
    c4 = float(np.asarray(trace(scene, o, d, k1, max_depth=6)).mean())
    c8 = float(np.asarray(trace(scene, o, d, k2, max_depth=12)).mean())
    assert abs(c4 - c8) < 0.03, (c4, c8)


def test_emissive_depth_invariance():
    # Emission-only contribution at first hit must not depend on max_depth.
    scene = _single_sphere(emission=(2.0, 2.0, 2.0), albedo=(0, 0, 0),
                           background=(0, 0, 0))
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    for depth in (1, 2, 8):
        c = np.asarray(trace(scene, o, d, KEY, max_depth=depth))
        np.testing.assert_allclose(c[0], [2.0, 2.0, 2.0], atol=1e-5)


def test_stats_counts_segments():
    scene = _single_sphere(albedo=(0, 0, 0))  # absorbs: throughput -> 0
    o = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])  # one hit, one miss
    _, segs = trace(scene, o, d, KEY, max_depth=1, with_stats=True)
    assert int(segs) == 2  # both rays traced one segment


def test_determinism():
    scene = T.demo_scene()
    R = 64
    o = jnp.tile(jnp.array([[0.0, 2.0, 5.0]]), (R, 1))
    d = jnp.tile(jnp.array([[0.0, -0.3, -1.0]]) / np.sqrt(1.09), (R, 1))
    a = np.asarray(trace(scene, o, d, KEY, max_depth=4))
    b = np.asarray(trace(scene, o, d, KEY, max_depth=4))
    np.testing.assert_array_equal(a, b)


def test_refraction_mode_straight_through():
    # Glass sphere head-on: straight-on rays refract straight through both
    # interfaces (up to Schlick reflections) and reach an emissive wall
    # behind. With refraction off, diffuse scatter mostly misses the wall.
    scene = T.make_scene(
        centers=[(0.0, 0.0, -3.0), (0.0, 0.0, -50.0)],
        radii=[1.0, 40.0],
        albedos=[(1.0, 1.0, 1.0), (0, 0, 0)],
        metallics=[0.0, 0.0],
        roughnesses=[0.0, 0.5],
        emissions=[(0, 0, 0), (5.0, 5.0, 5.0)],
        background=(0.0, 0.0, 0.0),
    )
    R = 2048
    o = jnp.tile(jnp.array([[0.0, 0.0, 0.0]]), (R, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R, 1))
    on = float(np.asarray(
        trace(scene, o, d, KEY, max_depth=4, enable_refraction=True)).mean())
    off = float(np.asarray(
        trace(scene, o, d, KEY, max_depth=4, enable_refraction=False)).mean())
    assert on > 2.0, on   # most rays pass through to the emitter
    assert off < 1.0, off
