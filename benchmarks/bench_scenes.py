#!/usr/bin/env python3
"""Multi-scene / multi-engine benchmark table.

Measures steady-state frame time (frames chained on device per dispatch)
and Mrays/s for: the demo scene (pallas + lax), random-spheres scaling
(16/32/64 spheres through the megakernel), large sphere fields and terrain
meshes through the cluster engine, and the Cornell mesh box. Prints a
markdown table.

MEASUREMENT HONESTY (round-5 correction): every cluster row passes the
prebuilt through ``order_clusters`` EAGERLY and renders with
``pre_ordered=True`` — the production path (render/frame.py memoizes the
same thing). The r02/r03 editions of this harness closure-captured the
raw prebuilt inside the chained jit; the TPU constant folder mis-folded
the in-graph ordering's gathers to zeros (the miscompile the r04 barrier
now shields), so most primitives became never-hit padding and the
recorded cluster numbers (673 traced Mrays/s at 10k, 633 at 100k, ...)
measured rays hitting NOTHING. Honest numbers are several times lower;
see BASELINE.md "Round-5 correction".

Usage:
  python benchmarks/bench_scenes.py                 # base table
  python benchmarks/bench_scenes.py --modes features  # nee/stratify/adaptive
  python benchmarks/bench_scenes.py --skip-1m       # skip the 1M build
"""

from __future__ import annotations

import argparse
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


def _cluster_pre(build_fn, cam):
    """Production prep: build + eager near-to-far ordering (the exact
    pair render/frame.py memoizes per (scene, camera))."""
    from tpu_rt.ops.pallas_cluster import order_clusters

    return jax.block_until_ready(order_clusters(build_fn(), cam.position))


def base_rows(W, H, SPP, D, dev, skip_1m=False):
    import tpu_rt
    from tpu_rt.core.scenes import cornell_box, random_spheres, terrain_mesh
    from tpu_rt.ops.pallas_cluster import (build_clusters, build_tri_clusters,
                                           ensure_distinct_tables,
                                           render_cluster)
    from tpu_rt.ops.pallas_megakernel import render_pallas
    from tpu_rt.render.frame import quantize_count, render

    prim = W * H * SPP
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

    fcam = jax.device_put(
        tpu_rt.make_camera(position=(0, 6, 40), target=(0, 0, -18),
                           aspect=W / H), dev)
    # spread scales ~N^(1/3): constant sphere density as the field grows
    scales = [(64, 10.0), (256, 16.0), (1000, 30.0), (4096, 30.0),
              (10000, 30.0), (100000, 95.0)]
    if not skip_1m:
        scales.append((1000000, 205.0))
    for n, spread in scales:
        sc = jax.device_put(random_spheres(n, seed=1, spread=spread), dev)
        pre = _cluster_pre(lambda: build_clusters(sc, n_active=n), fcam)
        dt = steady_state(lambda s, sc=sc, n=n, pre=pre: render_cluster(
            sc, fcam, s, width=W, height=H, spp=SPP, max_depth=D,
            n_active=n, prebuilt=pre, pre_ordered=True), reps=2, chain=3)
        _, segs = render_cluster(sc, fcam, 0, width=W, height=H, spp=SPP,
                                 max_depth=D, n_active=n, prebuilt=pre,
                                 pre_ordered=True, with_stats=True)
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
    # n=226 -> 101250, n=501 -> 500,000)
    tcam = jax.device_put(
        tpu_rt.make_camera(position=(0, 6, 6), target=(0, 0, -10),
                           aspect=W / H), dev)
    for grid_n in (24, 72, 226, 501):
        sph, tmesh = terrain_mesh(n=grid_n, seed=1)
        ntri = int(np.asarray(tmesh.valid).sum())
        sph = jax.device_put(sph, dev)
        tmesh = jax.device_put(tmesh, dev)
        nq = quantize_count(ntri, tmesh.capacity)  # production bucketing
        spre = _cluster_pre(lambda: build_clusters(sph, n_active=4), tcam)
        # eager de-collision pad: same-shaped sph/tri tables are ~12x
        # slower in-kernel (ensure_distinct_tables)
        tpre = _cluster_pre(lambda: ensure_distinct_tables(
            spre, build_tri_clusters(tmesh, n_active=nq)), tcam)
        dt = steady_state(
            lambda s, sph=sph, tmesh=tmesh, nq=nq, spre=spre, tpre=tpre:
            render_cluster(
                sph, tcam, s, width=W, height=H, spp=SPP, max_depth=D,
                n_active=4, mesh=tmesh, n_tri_active=nq,
                prebuilt=spre, tri_prebuilt=tpre, pre_ordered=True),
            reps=2, chain=3)
        _, segs = render_cluster(sph, tcam, 0, width=W, height=H, spp=SPP,
                                 max_depth=D, n_active=4, mesh=tmesh,
                                 n_tri_active=nq, prebuilt=spre,
                                 tri_prebuilt=tpre, pre_ordered=True,
                                 with_stats=True)
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
    return rows


def feature_rows(W, H, SPP, D, dev):
    """VERDICT r3 item 2 / r4 item 5a: measured throughput for the
    round-3/4 features (NEE, stratified sampling, adaptive tile masks) on
    the production engines — the feature matrix with NUMBERS attached."""
    import tpu_rt
    from tpu_rt.core.scenes import random_spheres, terrain_mesh
    from tpu_rt.ops.pallas_cluster import (build_clusters, build_tri_clusters,
                                           ensure_distinct_tables,
                                           render_cluster)
    from tpu_rt.ops.pallas_megakernel import render_pallas
    from tpu_rt.render.frame import quantize_count

    prim = W * H * SPP
    rows = []

    # megakernel features on the demo scene
    demo = jax.device_put(tpu_rt.demo_scene(), dev)
    cam = jax.device_put(tpu_rt.make_camera(aspect=W / H), dev)
    for tag, kw in (("base", {}), ("nee", dict(nee=True)),
                    ("stratify", dict(stratify=True))):
        dt = steady_state(lambda s, kw=kw: render_pallas(
            demo, cam, s, width=W, height=H, spp=SPP, max_depth=D,
            n_active=9, **kw), reps=2, chain=10)
        rows.append((f"demo 9 spheres / pallas {tag}", dt, prim / dt / 1e6))

    # cluster features at 10k / 100k spheres (~10% emissive)
    fcam = jax.device_put(
        tpu_rt.make_camera(position=(0, 6, 40), target=(0, 0, -18),
                           aspect=W / H), dev)
    for n, spread in ((10000, 30.0), (100000, 95.0)):
        sc = jax.device_put(random_spheres(n, seed=1, spread=spread), dev)
        pre = _cluster_pre(lambda: build_clusters(sc, n_active=n), fcam)
        for tag, kw in (("base", {}), ("nee", dict(nee=True)),
                        ("stratify", dict(stratify=True))):
            dt = steady_state(
                lambda s, kw=kw, sc=sc, n=n, pre=pre: render_cluster(
                    sc, fcam, s, width=W, height=H, spp=SPP, max_depth=D,
                    n_active=n, prebuilt=pre, pre_ordered=True, **kw),
                reps=2, chain=3)
            _, segs = render_cluster(
                sc, fcam, 0, width=W, height=H, spp=SPP, max_depth=D,
                n_active=n, prebuilt=pre, pre_ordered=True,
                with_stats=True, **kw)
            rows.append((f"random {n} spheres / cluster {tag} (traced)",
                         dt, int(segs) / dt / 1e6))

    # cluster NEE on a 10k-triangle terrain (tri lights stay BSDF-path)
    tcam = jax.device_put(
        tpu_rt.make_camera(position=(0, 6, 6), target=(0, 0, -10),
                           aspect=W / H), dev)
    sph, tmesh = terrain_mesh(n=72, seed=1)
    ntri = int(np.asarray(tmesh.valid).sum())
    sph = jax.device_put(sph, dev)
    tmesh = jax.device_put(tmesh, dev)
    nq = quantize_count(ntri, tmesh.capacity)
    spre = _cluster_pre(lambda: build_clusters(sph, n_active=4), tcam)
    tpre = _cluster_pre(lambda: ensure_distinct_tables(
        spre, build_tri_clusters(tmesh, n_active=nq)), tcam)
    for tag, kw in (("base", {}), ("nee", dict(nee=True))):
        dt = steady_state(
            lambda s, kw=kw: render_cluster(
                sph, tcam, s, width=W, height=H, spp=SPP, max_depth=D,
                n_active=4, mesh=tmesh, n_tri_active=nq, prebuilt=spre,
                tri_prebuilt=tpre, pre_ordered=True, **kw),
            reps=2, chain=3)
        _, segs = render_cluster(
            sph, tcam, 0, width=W, height=H, spp=SPP, max_depth=D,
            n_active=4, mesh=tmesh, n_tri_active=nq, prebuilt=spre,
            tri_prebuilt=tpre, pre_ordered=True, with_stats=True, **kw)
        rows.append((f"terrain {ntri} tris / cluster {tag} (traced)",
                     dt, int(segs) / dt / 1e6))

    # adaptive tile masks: full mask = bookkeeping overhead; half mask =
    # the skip saving once half the tiles have converged
    from tpu_rt.ops.pallas_megakernel import TILE
    n_tiles = -(-W * H // TILE)
    full = jnp.ones((n_tiles,), jnp.int32)
    half = jnp.asarray(np.arange(n_tiles) % 2, jnp.int32)
    for tag, mask in (("mask=full", full), ("mask=half", half)):
        dt = steady_state(lambda s, mask=mask: render_pallas(
            demo, cam, s, width=W, height=H, spp=SPP, max_depth=D,
            n_active=9, tile_mask=mask), reps=2, chain=10)
        rows.append((f"demo 9 spheres / pallas adaptive {tag}", dt,
                     prim / dt / 1e6))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="base",
                    help="comma list: base, features")
    ap.add_argument("--skip-1m", action="store_true")
    args = ap.parse_args()
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]

    W, H, SPP, D = 1920, 1080, 4, 4
    dev = jax.devices()[0]
    rows = []
    if "base" in modes:
        rows += base_rows(W, H, SPP, D, dev, skip_1m=args.skip_1m)
    if "features" in modes:
        rows += feature_rows(W, H, SPP, D, dev)

    print(f"\n1080p @ {SPP} spp, depth {D}, {dev}\n")
    print("| Scene / engine | frame ms | Mrays/s |")
    print("|---|---|---|")
    for name, dt, mrays in rows:
        print(f"| {name} | {dt * 1e3:.1f} | {mrays:.0f} |")


if __name__ == "__main__":
    main()
