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

    # large-scene engine buckets (cluster; sphere + triangle phases)
    if any("TPU" in str(d) for d in jax.devices()):
        from tpu_rt.core.scenes import random_spheres, terrain_mesh
        from tpu_rt.ops.pallas_cluster import render_cluster

        big = random_spheres(1000, seed=1, spread=30.0)
        t0 = time.time()
        img = render_cluster(big, tpu_rt.make_camera(aspect=16 / 9), 0,
                             width=1920, height=1080, spp=4, max_depth=4,
                             n_active=1024)
        _ = float(jnp.sum(img))
        print(f"cluster 1024 spheres @ 1080p: ready in {time.time() - t0:.1f}s")

        sph, mesh = terrain_mesh(n=24, seed=1)
        t0 = time.time()
        img = render_cluster(sph, tpu_rt.make_camera(aspect=16 / 9), 0,
                             width=1920, height=1080, spp=4, max_depth=4,
                             n_active=4, mesh=mesh, n_tri_active=1536)
        _ = float(jnp.sum(img))
        print(f"cluster 1536-tri mesh @ 1080p: ready in {time.time() - t0:.1f}s")
    print("compile cache warmed.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
