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
