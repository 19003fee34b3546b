#!/usr/bin/env python3
"""Multi-scene / multi-engine benchmark table.

Measures steady-state frame time (10 chained frames per dispatch) and
Mrays/s for: the demo scene (pallas + lax), random-spheres scaling
(16/32/64 spheres through the megakernel), and the Cornell mesh box
(lax + mesh path). Prints a markdown table.

Run on the chip: python benchmarks/bench_scenes.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def steady_state(frame_fn, reps=3, chain=10):
    @jax.jit
    def chained(seed0):
        def body(i, acc):
            return acc + jnp.sum(frame_fn(seed0 + i))
        return jax.lax.fori_loop(0, chain, body, jnp.float32(0.0))

    _ = float(chained(jnp.int32(0)))
    ts = []
    for k in range(reps):
        t0 = time.perf_counter()
        _ = float(chained(jnp.int32(1 + k * chain)))
        ts.append((time.perf_counter() - t0) / chain)
    return float(np.median(ts))


def main():
    import tpu_rt
    from tpu_rt.core.scenes import cornell_box, random_spheres
    from tpu_rt.ops.pallas_megakernel import render_pallas
    from tpu_rt.render.frame import render

    W, H, SPP, D = 1920, 1080, 4, 4
    prim = W * H * SPP
    dev = jax.devices()[0]
    rows = []

    demo = jax.device_put(tpu_rt.demo_scene(), dev)
    cam = jax.device_put(tpu_rt.make_camera(aspect=W / H), dev)

    dt = steady_state(lambda s: render_pallas(
        demo, cam, s, width=W, height=H, spp=SPP, max_depth=D, n_active=9))
    rows.append(("demo 9 spheres / pallas", dt, prim / dt / 1e6))

    dt = steady_state(lambda s: render(
        demo, cam, jax.random.key(0), width=W, height=H, spp=SPP,
        max_depth=D, engine="lax", seed=None), reps=1, chain=2)
    rows.append(("demo 9 spheres / lax", dt, prim / dt / 1e6))

    for n in (16, 32, 64):
        sc = jax.device_put(random_spheres(n), dev)
        dt = steady_state(lambda s, sc=sc, n=n: render_pallas(
            sc, cam, s, width=W, height=H, spp=SPP, max_depth=D, n_active=n))
        rows.append((f"random {n} spheres / pallas", dt, prim / dt / 1e6))

    # large scenes: cluster engine vs (small-N) megakernel — the crossover
    # table (VERDICT r1 item 3). The cluster engine reports traced Mrays/s
    # too via with_stats on a single dispatch.
    from tpu_rt.ops.pallas_cluster import build_clusters, render_cluster

    fcam = jax.device_put(
        tpu_rt.make_camera(position=(0, 6, 40), target=(0, 0, -18),
                           aspect=W / H), dev)
    # spread scales ~N^(1/3): constant sphere density as the field grows
    for n, spread in ((64, 10.0), (256, 16.0), (1000, 30.0), (4096, 30.0),
                      (10000, 30.0), (100000, 95.0), (1000000, 205.0)):
        sc = jax.device_put(random_spheres(n, seed=1, spread=spread), dev)
        # production path (render/frame.py) caches the camera-independent
        # cluster build across progressive batches; measure the same way
        pre = jax.block_until_ready(build_clusters(sc, n_active=n))
        dt = steady_state(lambda s, sc=sc, n=n, pre=pre: render_cluster(
            sc, fcam, s, width=W, height=H, spp=SPP, max_depth=D,
            n_active=n, prebuilt=pre), reps=2, chain=3)
        _, segs = render_cluster(sc, fcam, 0, width=W, height=H, spp=SPP,
                                 max_depth=D, n_active=n, prebuilt=pre,
                                 with_stats=True)
        traced = int(segs) / dt / 1e6
        rows.append((f"random {n} spheres / cluster", dt,
                     prim / dt / 1e6))
        rows.append((f"random {n} spheres / cluster (traced)", dt, traced))
        if n <= 64:
            dt = steady_state(lambda s, sc=sc, n=n: render_pallas(
                sc, fcam, s, width=W, height=H, spp=SPP, max_depth=D,
                n_active=n), reps=2, chain=3)
            rows.append((f"random {n} spheres / pallas (same cam)", dt,
                         prim / dt / 1e6))

    # large triangle meshes: terrain heightfields through the cluster
    # engine's triangle phase (n=24 -> 1058 tris, n=72 -> 10082,
    # n=226 -> 101250)
    from tpu_rt.core.scenes import terrain_mesh

    tcam = jax.device_put(
        tpu_rt.make_camera(position=(0, 6, 6), target=(0, 0, -10),
                           aspect=W / H), dev)
    from tpu_rt.ops.pallas_cluster import (build_tri_clusters,
                                           ensure_distinct_tables)
    from tpu_rt.render.frame import quantize_count

    # n=501 -> 500,000 triangles (the half-million-primitive mesh decade)
    for grid_n in (24, 72, 226, 501):
        sph, tmesh = terrain_mesh(n=grid_n, seed=1)
        ntri = int(np.asarray(tmesh.valid).sum())
        sph = jax.device_put(sph, dev)
        tmesh = jax.device_put(tmesh, dev)
        nq = quantize_count(ntri, tmesh.capacity)  # production bucketing
        spre = jax.block_until_ready(build_clusters(sph, n_active=4))
        # eager de-collision pad: same-shaped sph/tri tables are ~12x
        # slower in-kernel (ensure_distinct_tables)
        tpre = jax.block_until_ready(ensure_distinct_tables(
            spre, build_tri_clusters(tmesh, n_active=nq)))
        dt = steady_state(
            lambda s, sph=sph, tmesh=tmesh, nq=nq, spre=spre, tpre=tpre:
            render_cluster(
                sph, tcam, s, width=W, height=H, spp=SPP, max_depth=D,
                n_active=4, mesh=tmesh, n_tri_active=nq,
                prebuilt=spre, tri_prebuilt=tpre),
            reps=2, chain=3)
        _, segs = render_cluster(sph, tcam, 0, width=W, height=H, spp=SPP,
                                 max_depth=D, n_active=4, mesh=tmesh,
                                 n_tri_active=nq, prebuilt=spre,
                                 tri_prebuilt=tpre, with_stats=True)
        rows.append((f"terrain {ntri} tris / cluster", dt, prim / dt / 1e6))
        rows.append((f"terrain {ntri} tris / cluster (traced)", dt,
                     int(segs) / dt / 1e6))

    spheres, mesh = cornell_box()
    spheres = jax.device_put(spheres, dev)
    mesh = jax.device_put(mesh, dev)
    ccam = jax.device_put(
        tpu_rt.make_camera(position=(0, 2, 2.5), target=(0, 2, -3),
                           aspect=W / H), dev)

    dt = steady_state(lambda s: render_pallas(
        spheres, ccam, s, width=W, height=H, spp=SPP, max_depth=D,
        mesh=mesh, n_active=2, n_tri_active=14))
    rows.append(("cornell box (14 tris + 2 spheres) / pallas", dt,
                 prim / dt / 1e6))

    # plain dispatch timing (chaining the lax mesh path in a fori_loop trips
    # an internal TPU compiler fault on this toolchain)
    def cornell_frame(k):
        return render(spheres, ccam, jax.random.key(k), width=W, height=H,
                      spp=SPP, max_depth=D, engine="lax", mesh=mesh)

    out = cornell_frame(0)
    _ = float(jnp.sum(out))
    ts = []
    for k in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(cornell_frame(k + 1)))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    rows.append(("cornell box (14 tris + 2 spheres) / lax+mesh", dt,
                 prim / dt / 1e6))

    print(f"\n1080p @ {SPP} spp, depth {D}, {dev}\n")
    print("| Scene / engine | frame ms | primary Mrays/s |")
    print("|---|---|---|")
    for name, dt, mrays in rows:
        print(f"| {name} | {dt * 1e3:.1f} | {mrays:.0f} |")


if __name__ == "__main__":
    main()
