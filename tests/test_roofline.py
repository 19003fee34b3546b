"""Roofline estimator (tpu_rt/utils/roofline.py): op model + microkernel.

The peak NUMBER is only meaningful on a real chip (bench.py records it in
extras.roofline); here we verify the machinery — the FMA microkernel
actually iterates (no constant-folding), the static op model is exact
arithmetic, and the report is well-formed — on the CPU interpret path.
"""

import jax
import jax.numpy as jnp
import pytest

from tpu_rt.utils.roofline import (
    OPS_PER_SPHERE_TEST,
    OPS_SHADING_PER_BOUNCE,
    _timed_fma,
    megakernel_op_model,
    roofline_report,
)


def test_op_model_is_dense_product():
    got = megakernel_op_model(64, 48, 2, 3, n_spheres=9)
    want = 64 * 48 * 2 * 3 * (OPS_PER_SPHERE_TEST * 9
                              + OPS_SHADING_PER_BOUNCE)
    assert got == want


def test_fma_kernel_executes_not_folded():
    """Different loop depths must yield different outputs — if XLA or
    Mosaic folded the carried loop, the peak measurement is garbage."""
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpu_rt.utils.roofline import _BLOCK, _CARRIES, _fma_kernel

    x = jnp.full(_BLOCK, 0.5, jnp.float32)
    outs = []
    for depth in (8, 64):
        out = pl.pallas_call(
            partial(_fma_kernel, depth=depth, carries=_CARRIES),
            out_shape=jax.ShapeDtypeStruct(_BLOCK, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=True,
        )(x)
        outs.append(float(out[0, 0]))
    assert outs[0] != outs[1]
    # depth-8 carried FMA from 0.5+0.01i seeds, summed over 32 carries:
    # every chain adds a*depth plus compounding, so the sum grows ~depth
    assert outs[1] > outs[0] > 32 * 0.5


def test_timed_fma_runs_on_cpu_interpret():
    t = _timed_fma(depth=16, reps=1)
    assert t > 0.0


def test_report_shape():
    # build a report with a stubbed peak so CPU CI never runs the big loop
    import tpu_rt.utils.roofline as rl

    orig = rl.measure_vpu_fma_ops
    rl.measure_vpu_fma_ops = lambda *a, **k: 1.5e12
    try:
        r = rl.roofline_report(0.0062, 1920, 1080, 4, 4, 9)
    finally:
        rl.measure_vpu_fma_ops = orig
    assert r["bound"].startswith("compute")
    assert r["model_vector_ops_per_frame_g"] == pytest.approx(18.68, abs=0.1)
    assert 0 < r["utilization_vs_theoretical_pct"] < 100
    # compute-bound: intensity far above any HBM machine balance (~100)
    assert r["arithmetic_intensity_ops_per_hbm_byte"] > 300
