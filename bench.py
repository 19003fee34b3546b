"""Headline benchmark: 1080p @ 4 spp path trace of the demo scene on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline target (BASELINE.md / BASELINE.json): >= 100 Mrays/s per chip at
1080p. "Rays" counts actual traced ray segments (primary + bounces +
RR-survivors), the standard Mrays/s accounting; primary-only throughput and
frame time are reported as extra fields for context.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

WIDTH, HEIGHT, SPP, DEPTH = 1920, 1080, 4, 4
BASELINE_MRAYS = 100.0
REPEATS = 5


def main() -> None:
    from tpu_rt.core.types import demo_scene, make_camera
    from tpu_rt.render.frame import render

    dev = jax.devices()[0]
    scene = jax.device_put(demo_scene(), dev)
    cam = jax.device_put(make_camera(aspect=WIDTH / HEIGHT), dev)

    def step(key):
        return render(scene, cam, key, width=WIDTH, height=HEIGHT, spp=SPP,
                      max_depth=DEPTH, with_stats=True)

    # Warmup / compile
    img, segs = step(jax.random.key(0))
    img.block_until_ready()
    segments = int(segs)

    times = []
    for i in range(REPEATS):
        key = jax.random.key(i + 1)
        t0 = time.perf_counter()
        img, segs = step(key)
        img.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    primary = WIDTH * HEIGHT * SPP
    mrays = segments / dt / 1e6
    out = {
        "metric": "traced_mrays_per_s_1080p_4spp_depth4",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "extras": {
            "frame_time_ms": round(dt * 1e3, 2),
            "primary_mrays_per_s": round(primary / dt / 1e6, 2),
            "segments_per_frame": segments,
            "avg_bounces_per_primary": round(segments / primary, 3),
            "device": str(dev),
            "times_ms": [round(t * 1e3, 2) for t in times],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
