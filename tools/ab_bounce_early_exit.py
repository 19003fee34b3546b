"""On-chip A/B of the megakernel's per-tile all-dead bounce early exit.

VERDICT r4 item 2: BOUNCE_EARLY_EXIT=True shipped at the round-4 buzzer
with no before/after number and the driver recorded a -14.9% headline
regression (6.2 -> 7.28 ms). This measures both flag states on the real
chip for (a) the headline demo scene and (b) a mostly-sky scene where the
early exit should win (most tiles die at bounce 1), plus a compiled
bit-identity check at spp=1 (the only compiled config where the shared
per-tile PRNG stream makes on/off comparable draw-for-draw).

Usage: python tools/ab_bounce_early_exit.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import tpu_rt
from tpu_rt.ops.pallas_megakernel import render_pallas

WIDTH, HEIGHT, SPP, DEPTH = 1920, 1080, 4, 4
CHAIN = 20
REPEATS = 5


def measure(scene, cam, flag: bool) -> float:
    @jax.jit
    def chained(seed0):
        def body(i, acc):
            frame = render_pallas(scene, cam, seed0 + i, width=WIDTH,
                                  height=HEIGHT, spp=SPP, max_depth=DEPTH,
                                  n_active=9, bounce_early_exit=flag)
            return acc + jnp.sum(frame)
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    _ = float(chained(jnp.int32(0)))  # compile
    times = []
    for k in range(REPEATS):
        t0 = time.perf_counter()
        _ = float(chained(jnp.int32(1 + k * CHAIN)))
        times.append((time.perf_counter() - t0) / CHAIN)
    return float(np.median(times))


def main() -> None:
    dev = jax.devices()[0]
    scene = jax.device_put(tpu_rt.demo_scene(), dev)
    demo_cam = jax.device_put(
        tpu_rt.make_camera(aspect=WIDTH / HEIGHT), dev)
    # mostly-sky: look up and away — only the lights graze the frustum,
    # so almost every tile's lanes miss at bounce 1
    sky_cam = jax.device_put(
        tpu_rt.make_camera(position=(0.0, 2.0, 5.0), target=(0.0, 30.0, 20.0),
                           aspect=WIDTH / HEIGHT), dev)

    for name, cam in (("demo", demo_cam), ("sky", sky_cam)):
        on = measure(scene, cam, True)
        off = measure(scene, cam, False)
        print(f"{name:5s}  early_exit=on {on * 1e3:7.2f} ms   "
              f"off {off * 1e3:7.2f} ms   "
              f"on/off {on / off:6.3f}x")

    # compiled bit-identity at spp=1: with one sample per tile, skipped
    # bounces only feed all-dead lanes and no later draw consumes the
    # stream, so the images must match bit for bit
    a = render_pallas(scene, demo_cam, 7, width=640, height=480, spp=1,
                      max_depth=DEPTH, n_active=9, bounce_early_exit=True)
    b = render_pallas(scene, demo_cam, 7, width=640, height=480, spp=1,
                      max_depth=DEPTH, n_active=9, bounce_early_exit=False)
    print("spp=1 compiled bit-identical:", bool(jnp.all(a == b)))


if __name__ == "__main__":
    main()
