"""Frame renderer tests: golden-image vs scalar oracle, accumulation, tone map."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_rt.core import types as T
from tpu_rt.render import frame as F

from oracle import render_depth1

KEY = jax.random.key(3)

DEMO_ROWS = [
    {"center": (0.0, -100.5, 0.0), "radius": 100.0},
    {"center": (-2.0, 0.5, -3.0), "radius": 0.5},
    {"center": (0.0, 0.5, -3.0), "radius": 0.5},
    {"center": (2.0, 0.5, -3.0), "radius": 0.5},
    {"center": (-1.0, 0.3, -1.5), "radius": 0.3},
    {"center": (1.0, 0.3, -1.5), "radius": 0.3},
    {"center": (0.0, 3.0, -1.0), "radius": 0.3, "emission": (10, 10, 8)},
    {"center": (-2.0, 2.0, 0.0), "radius": 0.2, "emission": (5, 3, 2)},
    {"center": (2.0, 2.0, 0.0), "radius": 0.2, "emission": (2, 3, 5)},
]


def test_depth1_golden_image_matches_oracle():
    w, h = 48, 36
    scene = T.demo_scene()
    cam = T.make_camera(aspect=w / h)
    img = np.asarray(F.render(scene, cam, KEY, width=w, height=h, spp=1,
                              max_depth=1, jitter=False))
    gold = render_depth1(DEMO_ROWS, (0.05, 0.05, 0.1), (0, 2, 5), (0, 0, -1),
                         45.0, w, h)
    # Grazing pixels at sphere edges may differ (f32 vs f64); demand parity on
    # 99.5% of pixels and tight RMSE overall.
    diff = np.abs(img - gold)
    bad = (diff.max(-1) > 1e-3).mean()
    assert bad < 0.005, f"{bad:.4%} pixels disagree"
    rmse = float(np.sqrt((diff ** 2).mean()))
    assert rmse < 5e-3, rmse


def test_render_shapes_and_ranges():
    scene = T.demo_scene()
    cam = T.make_camera(aspect=4 / 3)
    img = np.asarray(F.render(scene, cam, KEY, width=32, height=24, spp=2,
                              max_depth=2))
    assert img.shape == (24, 32, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_render_deterministic_given_key():
    scene = T.demo_scene()
    cam = T.make_camera(aspect=1.0)
    a = np.asarray(F.render(scene, cam, KEY, width=16, height=16, spp=2,
                            max_depth=3))
    b = np.asarray(F.render(scene, cam, KEY, width=16, height=16, spp=2,
                            max_depth=3))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(F.render(scene, cam, jax.random.key(99), width=16,
                            height=16, spp=2, max_depth=3))
    assert not np.array_equal(a, c)


def test_accumulate_weighted_mean():
    b1 = jnp.full((4, 4, 3), 1.0)
    b2 = jnp.full((4, 4, 3), 0.0)
    acc, n = F.accumulate(None, 0, b1, 8)
    assert n == 8
    acc, n = F.accumulate(acc, n, b2, 8)
    assert n == 16
    np.testing.assert_allclose(np.asarray(acc), 0.5)
    acc, n = F.accumulate(acc, n, b1, 16)
    np.testing.assert_allclose(np.asarray(acc), 0.75)


def test_tone_map_and_enhance():
    img = jnp.array([[[0.0, 1.0, 10.0]]])
    out = np.asarray(F.tone_map(img, 1.5))
    np.testing.assert_allclose(out[0, 0, 0], 0.0)
    np.testing.assert_allclose(out[0, 0, 1], 1.5 / 2.5, rtol=1e-6)
    assert out[0, 0, 2] < 1.0
    # enhance: constant image passes through
    flat = jnp.full((8, 8, 3), 0.25)
    np.testing.assert_allclose(np.asarray(F.enhance_contrast(flat)), 0.25)
    # stretch maps 2nd..98th percentile to 0..1
    ramp = jnp.linspace(0, 1, 300).reshape(10, 10, 3)
    stretched = np.asarray(F.enhance_contrast(ramp))
    assert stretched.min() == 0.0 and stretched.max() == 1.0


def test_stats_ray_counts():
    scene = T.demo_scene()
    cam = T.make_camera(aspect=1.0)
    _, segs = F.render(scene, cam, KEY, width=8, height=8, spp=2, max_depth=1,
                       with_stats=True)
    assert int(segs) == 8 * 8 * 2  # depth 1: every primary ray = 1 segment
