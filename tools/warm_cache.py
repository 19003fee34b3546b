#!/usr/bin/env python3
"""Pre-compile the render pipeline for common interactive configurations.

Mosaic compiles of the fused megakernel take minutes per (resolution, spp,
depth) the first time; the persistent compile cache (tpu_rt configures it)
makes every later start instant. Run this once per machine — e.g. before
first GUI launch — to warm the standard shapes:

    python tools/warm_cache.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    # (width, height, spp, depth) — GUI default + common tweaks + bench
    (640, 480, 8, 4),
    (640, 480, 8, 8),
    (320, 240, 8, 4),
    (1280, 720, 4, 4),
    (1920, 1080, 4, 4),
]


def main() -> int:
    import jax
    import jax.numpy as jnp

    import tpu_rt
    from tpu_rt.render.frame import render

    scene = tpu_rt.demo_scene()
    for w, h, spp, depth in CONFIGS:
        cam = tpu_rt.make_camera(aspect=w / h)
        t0 = time.time()
        img = render(scene, cam, jax.random.key(0), width=w, height=h,
                     spp=spp, max_depth=depth, seed=0)
        _ = float(jnp.sum(img))
        print(f"{w}x{h} @ {spp}spp depth {depth}: ready in {time.time() - t0:.1f}s")
    print("compile cache warmed.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
