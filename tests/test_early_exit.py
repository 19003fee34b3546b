"""Per-tile all-dead bounce early exit (render_pallas(bounce_early_exit=)).

The flag skips bounces 2..D for tiles whose lanes are ALL dead — work that
can only feed zero-contribution lanes — so rendering correctness must be
flag-independent. Measured perf (tools/ab_bounce_early_exit.py, on chip,
1080p/4spp/d4, 2026-08-20): demo scene 7.29 ms on / 6.20 ms off, mostly-sky
3.70 ms on / 6.14 ms off — hence the module default is OFF and sky-heavy
callers opt in per render (VERDICT r4 item 2 / ADVICE r4 item 1).

Reference workload being matched: the iterative bounce loop whose dead-lane
waste the exit targets, /root/reference/cpp_raytracer/raytracer_core.cpp:291-351.
"""

import jax
import jax.numpy as jnp
import pytest

import tpu_rt
from tpu_rt.ops import pallas_megakernel as mk
from tpu_rt.ops.pallas_megakernel import render_pallas


def test_default_is_off():
    """The measured-faster default for headline/interactive workloads
    (the round-4 regression shipped True without a number; never again)."""
    assert mk.BOUNCE_EARLY_EXIT is False


@pytest.mark.parametrize("spp", [1, 4])
def test_interpret_bit_identity_on_vs_off(spp):
    """Interpret mode uses the counter-hash RNG (stateless per call site),
    so skipping all-dead bounces changes no live draw: any spp must be
    bit-identical across the flag."""
    scene = tpu_rt.demo_scene()
    cam = tpu_rt.make_camera(aspect=64 / 48)
    on = render_pallas(scene, cam, 3, width=64, height=48, spp=spp,
                       max_depth=4, n_active=9, interpret=True,
                       bounce_early_exit=True)
    off = render_pallas(scene, cam, 3, width=64, height=48, spp=spp,
                        max_depth=4, n_active=9, interpret=True,
                        bounce_early_exit=False)
    assert bool(jnp.all(on == off))


def test_compiled_bit_identity_spp1():
    """Compiled, the hardware PRNG is one stream per tile across samples:
    at spp=1 no later draw consumes the stream, so skipped dead-tile
    bounces cannot shift anything and on/off must match bit for bit.
    (At spp>1 the streams shift — different, equally unbiased samples.)
    TPU-gated: re-proven per round in the on-chip lane."""
    tpus = [d for d in jax.devices() if "TPU" in str(d)]
    if not tpus:
        pytest.skip("needs a TPU chip (covered by the on-chip test lane)")
    scene = jax.device_put(tpu_rt.demo_scene(), tpus[0])
    cam = jax.device_put(tpu_rt.make_camera(aspect=640 / 480), tpus[0])
    on = render_pallas(scene, cam, 7, width=640, height=480, spp=1,
                       max_depth=4, n_active=9, bounce_early_exit=True)
    off = render_pallas(scene, cam, 7, width=640, height=480, spp=1,
                        max_depth=4, n_active=9, bounce_early_exit=False)
    assert bool(jnp.all(on == off))


def test_interpret_sky_scene_statistics():
    """A mostly-sky camera (the flag's winning regime): the flag must not
    change the image in interpret mode, and the image must actually be
    mostly background (validates the A/B scene construction)."""
    scene = tpu_rt.demo_scene()
    cam = tpu_rt.make_camera(position=(0.0, 2.0, 5.0),
                             target=(0.0, 30.0, 20.0), aspect=64 / 48)
    on = render_pallas(scene, cam, 11, width=64, height=48, spp=2,
                       max_depth=4, n_active=9, interpret=True,
                       bounce_early_exit=True)
    off = render_pallas(scene, cam, 11, width=64, height=48, spp=2,
                        max_depth=4, n_active=9, interpret=True,
                        bounce_early_exit=False)
    assert bool(jnp.all(on == off))
    # sqrt-gamma background (0.05, 0.05, 0.1) -> ~(0.22, 0.22, 0.32)
    bg = jnp.sqrt(jnp.asarray([0.05, 0.05, 0.1]))
    frac_bg = jnp.mean(
        (jnp.abs(on - bg[None, None, :]).max(axis=-1) < 1e-3).astype(
            jnp.float32))
    assert float(frac_bg) > 0.8
