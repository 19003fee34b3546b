"""Thin-lens depth of field (beyond-reference capability)."""

import jax
import numpy as np
import pytest

import tpu_rt
from tpu_rt.render.frame import render


def _peak(img):
    """99.9th-percentile linear radiance: defocus spreads a small bright
    emitter over more pixels, so its peak drops — a blur measure that is
    robust to Monte-Carlo noise (unlike gradient/TV measures, which the
    lens-sampling noise inflates)."""
    return float(np.quantile(img, 0.999))


@pytest.fixture(scope="module")
def scene():
    return tpu_rt.demo_scene()


def test_zero_aperture_matches_pinhole(scene):
    cam_pin = tpu_rt.make_camera(aspect=4 / 3)
    cam_dof = tpu_rt.make_camera(aspect=4 / 3, aperture=0.0, focus_dist=5.0)
    a = np.asarray(render(scene, cam_pin, jax.random.key(0), width=64,
                          height=48, spp=2, max_depth=2, engine="lax"))
    b = np.asarray(render(scene, cam_dof, jax.random.key(0), width=64,
                          height=48, spp=2, max_depth=2, engine="lax",
                          enable_dof=True))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_dof_blurs_out_of_focus_preserves_energy(scene):
    # focus very close to the lens: the whole scene is far out of focus
    cam_pin = tpu_rt.make_camera(aspect=4 / 3)
    cam_dof = tpu_rt.make_camera(aspect=4 / 3, aperture=0.35,
                                 focus_dist=1.0)
    kw = dict(width=96, height=72, spp=64, max_depth=2, gamma=False)
    a = np.asarray(render(scene, cam_pin, jax.random.key(1), engine="lax",
                          **kw))
    b = np.asarray(render(scene, cam_dof, jax.random.key(1), engine="lax",
                          **kw))
    # the small emissive blobs smear -> peak radiance drops; total radiance
    # stays close (not exactly equal: the lens cone genuinely samples
    # different geometry than the pinhole, so a few % shift is physical)
    assert _peak(b) < _peak(a) * 0.9, (_peak(b), _peak(a))
    assert abs(float(a.mean() - b.mean())) < 0.06 * max(a.mean(), 1e-6)


def test_objects_at_focus_stay_sharp(scene):
    # focus ON the brightest emitter: its image stays a tight (high-peak)
    # disk, while a focus-at-1.0 lens smears it
    import numpy as _np

    em = _np.asarray(scene.emission).sum(-1)
    bright = int(_np.argmax(em))
    center = _np.asarray(scene.center)[bright]
    fd = float(_np.linalg.norm(center - _np.array([0.0, 2.0, 5.0])))
    cam_focus = tpu_rt.make_camera(aspect=4 / 3, aperture=0.35,
                                   focus_dist=fd)
    cam_defocus = tpu_rt.make_camera(aspect=4 / 3, aperture=0.35,
                                     focus_dist=1.0)
    kw = dict(width=96, height=72, spp=64, max_depth=2, gamma=False)
    sharp = np.asarray(render(scene, cam_focus, jax.random.key(2),
                              engine="lax", **kw))
    blurred = np.asarray(render(scene, cam_defocus, jax.random.key(2),
                                engine="lax", **kw))
    assert _peak(sharp) > _peak(blurred) * 1.1, (_peak(sharp),
                                                 _peak(blurred))


def test_auto_dof_detection(scene):
    """render() auto-enables DOF from the camera's aperture."""
    cam_dof = tpu_rt.make_camera(aspect=4 / 3, aperture=0.35, focus_dist=1.0)
    auto = np.asarray(render(scene, cam_dof, jax.random.key(1), width=96,
                             height=72, spp=8, max_depth=2, engine="lax"))
    explicit = np.asarray(render(scene, cam_dof, jax.random.key(1), width=96,
                                 height=72, spp=8, max_depth=2, engine="lax",
                                 enable_dof=True))
    np.testing.assert_array_equal(auto, explicit)


def test_cluster_engine_dof_agrees_with_lax():
    from tpu_rt.core.scenes import random_spheres
    from tpu_rt.ops.pallas_cluster import render_cluster

    sc = random_spheres(200, seed=3)
    cam = tpu_rt.make_camera(position=(0, 3, 14), target=(0, 0, -6),
                             aspect=160 / 96, aperture=0.4, focus_dist=8.0)
    a = np.asarray(render_cluster(sc, cam, 7, width=160, height=96, spp=12,
                                  max_depth=3, interpret=True, n_active=200,
                                  enable_dof=True))
    b = np.asarray(render(sc, cam, jax.random.key(5), width=160, height=96,
                          spp=12, max_depth=3, engine="lax",
                          enable_dof=True))
    b2 = np.asarray(render(sc, cam, jax.random.key(9), width=160, height=96,
                           spp=12, max_depth=3, engine="lax",
                           enable_dof=True))
    rmse = float(np.sqrt(((a - b) ** 2).mean()))
    floor = float(np.sqrt(((b - b2) ** 2).mean()))
    assert rmse < floor * 1.25, (rmse, floor)
    assert abs(float(a.mean() - b.mean())) < 5e-3


_tpu = [d for d in jax.devices() if "TPU" in str(d)]


@pytest.mark.skipif(not _tpu, reason="no TPU available")
def test_megakernel_dof_agrees_with_lax(scene):
    from tpu_rt.ops.pallas_megakernel import render_pallas

    cam = tpu_rt.make_camera(aspect=2.0, aperture=0.35, focus_dist=6.4)
    with jax.default_device(_tpu[0]):
        a = np.asarray(render_pallas(scene, cam, 0, width=256, height=128,
                                     spp=32, max_depth=3, enable_dof=True))
        b = np.asarray(render(scene, cam, jax.random.key(5), width=256,
                              height=128, spp=32, max_depth=3, engine="lax",
                              enable_dof=True))
    assert np.isfinite(a).all()
    assert abs(float(a.mean() - b.mean())) < 5e-3
