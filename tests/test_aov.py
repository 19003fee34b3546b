"""AOV feature buffers + feature-guided (joint bilateral) denoising."""

import jax
import numpy as np
import pytest

import tpu_rt
from tpu_rt.core.types import T_MAX
from tpu_rt.ops.post import gaussian_blur, joint_bilateral
from tpu_rt.render.aov import render_aovs


@pytest.fixture(scope="module")
def aovs():
    scene = tpu_rt.demo_scene()
    cam = tpu_rt.make_camera(aspect=64 / 48)
    return {k: np.asarray(v) for k, v in
            render_aovs(scene, cam, width=64, height=48).items()}


def test_aov_structure(aovs):
    hit = aovs["hit"]
    assert hit.any() and not hit.all()  # spheres + sky both visible
    n = aovs["normal"]
    lens = np.linalg.norm(n[hit], axis=-1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-4)
    assert (n[~hit] == 0).all()
    assert (aovs["depth"][~hit] == T_MAX).all()
    assert (aovs["depth"][hit] < 1e4).all()
    assert (aovs["object_id"][~hit] == -1).all()
    # misses carry the background color
    bg = np.asarray(tpu_rt.demo_scene().background)
    np.testing.assert_allclose(
        aovs["albedo"][~hit], np.broadcast_to(bg, aovs["albedo"][~hit].shape),
        atol=1e-6)


def test_joint_bilateral_preserves_geometry_edges():
    """Two noisy constant regions split by a NORMAL discontinuity but with
    overlapping color noise: the color-only range term cannot separate
    them, the normal term can."""
    rng = np.random.default_rng(0)
    h, w = 40, 40
    img = np.full((h, w, 3), 0.45, np.float32)
    img[:, w // 2:] = 0.55
    img += rng.normal(0.0, 0.08, img.shape).astype(np.float32)
    img = np.clip(img, 0, 1)

    normal = np.zeros((h, w, 3), np.float32)
    normal[:, : w // 2, 2] = 1.0
    normal[:, w // 2:, 0] = 1.0
    depth = np.full((h, w), 5.0, np.float32)

    out = np.asarray(joint_bilateral(img, normal, depth, d=9,
                                     sigma_color=200.0, sigma_normal=0.2))
    gau = np.asarray(gaussian_blur(img, ksize=9, sigma=3.0))

    # interior noise is smoothed comparably to a gaussian
    assert out[:, 5:15].std() < img[:, 5:15].std() * 0.5
    # but the cross-edge step survives where the gaussian destroys it
    step_in = img[:, w // 2 + 2: w // 2 + 8].mean() - \
        img[:, w // 2 - 8: w // 2 - 2].mean()
    step_joint = out[:, w // 2 + 2: w // 2 + 8].mean() - \
        out[:, w // 2 - 8: w // 2 - 2].mean()
    step_gau = gau[:, w // 2 + 2: w // 2 + 8].mean() - \
        gau[:, w // 2 - 8: w // 2 - 2].mean()
    assert step_joint > 0.8 * step_in
    assert step_joint > step_gau


def test_joint_bilateral_depth_edges():
    """Same color+normal, different depth (an object silhouetted against a
    parallel far wall): the depth term keeps them separate."""
    rng = np.random.default_rng(1)
    h, w = 32, 32
    img = np.clip(np.full((h, w, 3), 0.5, np.float32)
                  + rng.normal(0, 0.05, (h, w, 3)).astype(np.float32), 0, 1)
    normal = np.zeros((h, w, 3), np.float32)
    normal[..., 2] = 1.0
    depth = np.full((h, w), 2.0, np.float32)
    depth[h // 2:] = 20.0

    out = np.asarray(joint_bilateral(img, normal, depth, d=7,
                                     sigma_color=500.0, sigma_depth=0.05))
    # weights must not leak across the depth edge: rows just above the
    # split are averages of top-region pixels only -> their mean stays
    # near the top mean rather than blending with the bottom
    top = out[: h // 2 - 1].mean()
    bot = out[h // 2 + 1:].mean()
    raw_top = img[: h // 2 - 1].mean()
    raw_bot = img[h // 2 + 1:].mean()
    assert abs(top - raw_top) < 0.01
    assert abs(bot - raw_bot) < 0.01


def test_denoiser_bank_joint_method(aovs):
    from tpu_rt.app.denoiser import Denoiser

    d = Denoiser()
    assert "joint" in d.available_methods
    img = np.clip(aovs["albedo"]
                  + np.random.default_rng(2).normal(0, 0.05, aovs["albedo"].shape),
                  0, 1).astype(np.float32)
    out = d.denoise(img, "joint", aovs=aovs)
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    with pytest.raises(ValueError):
        d.denoise(img, "joint")


def test_app_aov_cache_lifecycle():
    from tpu_rt.app import RayTracerInteraction

    r = RayTracerInteraction(48, 36)
    try:
        a = r._get_aovs()
        b = r._get_aovs()
        assert a is b  # cached per pose
        assert a["normal"].shape == (36, 48, 3)
        r.restart_rendering()
        c = r._get_aovs()
        assert c is not a  # invalidated by the restart
    finally:
        r.stop_rendering()
