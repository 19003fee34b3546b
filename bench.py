"""Headline benchmark: 1080p @ 4 spp path trace of the demo scene on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline target (BASELINE.md / BASELINE.json): >= 100 Mrays/s per chip at
1080p. "Rays" counts actual traced ray segments (primary + bounces +
RR survivors). The headline value is steady-state throughput: frames chained
on device (10 per dispatch), which is how a progressive renderer runs;
single-dispatch latency — which on this host includes a ~25 ms tunnel
round-trip that is not chip time — is reported in extras.

Engine: the fused Pallas megakernel (tpu_rt/ops/pallas_megakernel.py); the
XLA lax pipeline number is reported alongside for reference.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

WIDTH, HEIGHT, SPP, DEPTH = 1920, 1080, 4, 4
BASELINE_MRAYS = 100.0
CHAIN = 20
REPEATS = 7


def _best_prior() -> float | None:
    """Perf ratchet: best headline value recorded by any prior round's
    driver run (BENCH_r*.json at the repo root). Round 2's apparent -5%
    'regression' was environment noise (interleaved A/B of the r01 vs r02
    kernels measured -0.7%); the ratchet makes any real drop loud. The
    comparison is median-vs-median — the same estimator every round — with
    min-of-N reported alongside for separating chip time from host noise."""
    import glob
    import os

    best = None
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            rec = json.load(open(path))
            cmd_out = rec.get("parsed", rec)
            v = float(cmd_out.get("value"))
        except Exception:
            continue
        if best is None or v > best:
            best = v
    return best


def _preflight_device(timeout_s: int = 180) -> None:
    """Fail FAST if the device can't initialize, instead of hanging.

    The axon TPU client blocks indefinitely inside PJRT init when the
    pool/relay is unreachable or the chip grant is stuck (observed: 5+ h).
    Backend init can't be timed out in-process (a blocking C call), so
    probe from a subprocess with a hard timeout and exit with a clear
    message the driver can record."""
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); "
             "import jax.numpy as jnp; jnp.zeros(4).block_until_ready()"],
            timeout=timeout_s, check=True, capture_output=True)
    except subprocess.TimeoutExpired:
        print(json.dumps({
            "metric": "traced_mrays_per_s_1080p_4spp_depth4",
            "value": None, "unit": "Mrays/s", "vs_baseline": None,
            "error": f"device init exceeded {timeout_s}s — TPU "
                     "pool/relay unreachable or chip grant stuck; "
                     "not a framework regression"}))
        sys.exit(3)
    except subprocess.CalledProcessError as e:
        print(json.dumps({
            "metric": "traced_mrays_per_s_1080p_4spp_depth4",
            "value": None, "unit": "Mrays/s", "vs_baseline": None,
            "error": "device init failed: "
                     + e.stderr.decode(errors="replace")[-400:]}))
        sys.exit(3)


def main() -> None:
    _preflight_device()

    import tpu_rt
    from tpu_rt.ops.pallas_megakernel import render_pallas
    from tpu_rt.render.frame import render

    dev = jax.devices()[0]
    scene = jax.device_put(tpu_rt.demo_scene(), dev)
    cam = jax.device_put(tpu_rt.make_camera(aspect=WIDTH / HEIGHT), dev)

    n_active = 9  # demo scene real-sphere count (bucket is 16)
    # segments per frame (for Mrays accounting)
    img, segs = render_pallas(scene, cam, 0, width=WIDTH, height=HEIGHT,
                              spp=SPP, max_depth=DEPTH, with_stats=True,
                              n_active=n_active)
    _ = float(jnp.sum(img))
    segments = int(segs)

    # steady-state: CHAIN frames chained in one dispatch
    @jax.jit
    def chained(seed0):
        def body(i, acc):
            frame = render_pallas(scene, cam, seed0 + i, width=WIDTH,
                                  height=HEIGHT, spp=SPP, max_depth=DEPTH,
                                  n_active=n_active)
            return acc + jnp.sum(frame)
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    _ = float(chained(jnp.int32(0)))  # compile
    chain_times = []
    for k in range(REPEATS):
        t0 = time.perf_counter()
        _ = float(chained(jnp.int32(1 + k * CHAIN)))
        chain_times.append((time.perf_counter() - t0) / CHAIN)
    # Headline = median, the SAME estimator prior rounds recorded — the
    # ratchet below compares this value against BENCH_r*.json, so the
    # estimator must not change between rounds (a min-of-N headline would
    # read ~up to 15% high vs a median-recorded prior and mask real drops).
    # min-of-N is kept as a diagnostic: the chained dispatch is
    # device-bound, so the fastest repeat is the least-interference
    # estimate of pure chip time (host/tunnel noise rides on top).
    frame_s = float(np.median(chain_times))
    frame_s_min = float(np.min(chain_times))

    # single-dispatch latency (includes host->chip round trip)
    lat = []
    for k in range(REPEATS):
        t0 = time.perf_counter()
        out = render_pallas(scene, cam, 100 + k, width=WIDTH, height=HEIGHT,
                            spp=SPP, max_depth=DEPTH, n_active=n_active)
        _ = float(jnp.sum(out))
        lat.append(time.perf_counter() - t0)
    dispatch_s = float(np.median(lat))

    # cluster engine at 10k primitives (the large-scene headline:
    # BASELINE.md "Large-scene scaling")
    from tpu_rt.core.scenes import random_spheres
    from tpu_rt.ops.pallas_cluster import (build_clusters, order_clusters,
                                           render_cluster)

    big = jax.device_put(random_spheres(10000, seed=1, spread=30.0), dev)
    bcam = jax.device_put(
        tpu_rt.make_camera(position=(0, 6, 40), target=(0, 0, -18),
                           aspect=WIDTH / HEIGHT), dev)
    # production path (render/frame.py): the camera-independent cluster
    # build AND the camera-dependent near-to-far ordering are both cached
    # across progressive batches — the ordering must happen eagerly here,
    # NOT inside chained_big, where the miscompile-shield barrier keeps its
    # full-table gathers live per frame (the r04 7.2x regression).
    bpre = jax.block_until_ready(order_clusters(
        build_clusters(big, n_active=10000), bcam.position))
    bimg, bsegs = render_cluster(big, bcam, 0, width=WIDTH, height=HEIGHT,
                                 spp=SPP, max_depth=DEPTH, with_stats=True,
                                 n_active=10000, prebuilt=bpre,
                                 pre_ordered=True)
    _ = float(jnp.sum(bimg))

    @jax.jit
    def chained_big(seed0):
        def body(i, acc):
            frame = render_cluster(big, bcam, seed0 + i, width=WIDTH,
                                   height=HEIGHT, spp=SPP, max_depth=DEPTH,
                                   n_active=10000, prebuilt=bpre,
                                   pre_ordered=True)
            return acc + jnp.sum(frame)
        return jax.lax.fori_loop(0, 3, body, jnp.float32(0.0))

    _ = float(chained_big(jnp.int32(0)))
    t0 = time.perf_counter()
    _ = float(chained_big(jnp.int32(7)))
    big_frame_s = (time.perf_counter() - t0) / 3
    big_mrays = int(bsegs) / big_frame_s / 1e6

    # lax pipeline reference point
    out2, segs2 = render(scene, cam, jax.random.key(0), width=WIDTH,
                         height=HEIGHT, spp=SPP, max_depth=DEPTH,
                         with_stats=True, engine="lax")
    _ = float(jnp.sum(out2))
    t0 = time.perf_counter()
    out2, _ = render(scene, cam, jax.random.key(1), width=WIDTH, height=HEIGHT,
                     spp=SPP, max_depth=DEPTH, with_stats=True, engine="lax")
    _ = float(jnp.sum(out2))
    lax_s = time.perf_counter() - t0

    primary = WIDTH * HEIGHT * SPP
    mrays = segments / frame_s / 1e6
    best = _best_prior()
    regression_pct = (round((mrays - best) / best * 100.0, 2)
                      if best else None)
    out = {
        "metric": "traced_mrays_per_s_1080p_4spp_depth4",
        "value": round(mrays, 1),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 2),
        "extras": {
            "engine": "pallas_megakernel",
            "best_prior_round_mrays": best,
            "regression_vs_best_prior_pct": regression_pct,
            "frame_time_ms_steady_state": round(frame_s * 1e3, 2),
            "frame_time_ms_min": round(frame_s_min * 1e3, 2),
            "chip_time_mrays_per_s_min_of_n": round(
                segments / frame_s_min / 1e6, 1),
            "single_dispatch_latency_ms": round(dispatch_s * 1e3, 2),
            "primary_mrays_per_s": round(primary / frame_s / 1e6, 1),
            "segments_per_frame": segments,
            "avg_bounces_per_primary": round(segments / primary, 3),
            "lax_engine_frame_ms": round(lax_s * 1e3, 1),
            "cluster_engine_10k_spheres_traced_mrays": round(big_mrays, 1),
            "cluster_engine_10k_spheres_frame_ms": round(
                big_frame_s * 1e3, 1),
            "reference_cpu_primary_mrays_per_s": 2.79,
            "speedup_vs_reference_cpu": round(
                (primary / frame_s / 1e6) / 2.79, 1),
            "device": str(dev),
        },
    }
    # Chip-utilization roofline (BASELINE.md "Chip utilization"): uses the
    # steady-state frame time so dispatch overhead is already amortized.
    # Never allowed to sink the headline — any failure is recorded inline.
    try:
        from tpu_rt.utils.roofline import roofline_report
        out["extras"]["roofline"] = roofline_report(
            frame_s, WIDTH, HEIGHT, SPP, DEPTH, n_spheres=n_active)
    except Exception as e:  # pragma: no cover - defensive for the driver
        out["extras"]["roofline"] = {"error": repr(e)[:200]}
    if regression_pct is not None and regression_pct < -3.0:
        print(f"REGRESSION: {regression_pct}% vs best prior round "
              f"({best} Mrays/s) — bisect before shipping", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
