#!/usr/bin/env python3
"""Measure the interactive loop on real hardware (VERDICT r2 item 6).

Drives the headless ``RayTracerInteraction`` runtime exactly as the GUI
does — progressive batches, denoiser bank ON (all four stackable methods) —
and reports per-displayed-frame:

  * p50 / p90 batch latency (device render + display pipeline + queue),
  * device->host transfers ("d2h" counted by the runtime; the fused
    display pipeline performs exactly 1 — render/display.py — vs the
    reference's 1 accumulation pull + 2 per denoise method),
  * steady-state Mrays/s from the runtime's rolling FrameStats.

Run on the chip:  python tools/interactive_latency.py [width height spp
[denoise_every]]  (denoise_every=N runs the full denoiser stack on every
Nth displayed frame and reuses the previous enhanced image in between —
utils/config.py; VERDICT r4 item 5b wants the {1, 4} pair recorded).
Results land in BASELINE.md's interactive-loop table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from tpu_rt.app.interaction import RayTracerInteraction

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 480
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    denoise_every = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    rt = RayTracerInteraction(width, height)
    rt.settings["samples_per_batch"] = spp
    rt.settings["max_samples"] = spp * 40
    rt.settings["show_denoisers"] = True
    rt.settings["selected_denoisers"] = ["bilateral", "nlmeans", "gaussian",
                                         "median"]
    rt.settings["denoise_every"] = denoise_every
    rt.start_rendering()

    frames = []
    arrivals = []
    t0 = time.time()
    while len(frames) < 40 and time.time() - t0 < 600:
        f = rt.get_frame()
        if f is None:
            time.sleep(0.01)
            continue
        if f.get("done"):
            break
        if f.get("is_raytracing"):
            frames.append(f)
            arrivals.append(time.time())
    rt.stop_rendering()

    if len(frames) < 5:
        raise SystemExit(f"only {len(frames)} frames in 600 s")

    import numpy as np

    # drop the first (compile) frame; "frame_latency" is batch start ->
    # frame enqueued (device render + display pipeline + host pull — what
    # the user waits for); "render_time" is the device render alone
    lat = np.array([f["frame_latency"] for f in frames[1:]])
    render_only = np.array([f["render_time"] for f in frames[1:]])
    d2h = [f["d2h"] for f in frames[1:]]
    # Inter-frame interval = displayed-frame cadence (1/throughput). Under
    # the round-4 double-buffered loop, frame_latency spans ~TWO pipeline
    # stages by design (batch N's display is pulled while batch N+1
    # renders), so the interval is the number comparable with the round-3
    # serial loop's p50, and the latency is what a user waits for one
    # specific interaction to appear.
    iv = np.diff(np.array(arrivals))[1:] if len(arrivals) > 2 else np.array(
        [float("nan")])
    out = {
        "metric": "interactive_p50_batch_ms",
        "value": round(float(np.percentile(lat, 50)) * 1e3, 2),
        "unit": "ms",
        "extras": {
            "width": width, "height": height, "spp_per_batch": spp,
            "frames_measured": len(frames) - 1,
            "p90_batch_ms": round(float(np.percentile(lat, 90)) * 1e3, 2),
            "p50_frame_interval_ms": round(
                float(np.nanpercentile(iv, 50)) * 1e3, 2),
            "p90_frame_interval_ms": round(
                float(np.nanpercentile(iv, 90)) * 1e3, 2),
            "p50_device_render_ms": round(
                float(np.percentile(render_only, 50)) * 1e3, 2),
            "first_frame_ms": round(frames[0]["frame_latency"] * 1e3, 1),
            "d2h_per_displayed_frame": max(d2h),
            "denoisers": 4,
            "denoise_every": denoise_every,
            "mrays_per_s": round(rt.frame_stats.mrays_per_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
