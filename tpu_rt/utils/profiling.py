"""Tracing / profiling instrumentation.

Replaces the reference's wall-clock prints (std::chrono around the frame
loop, cpp_raytracer/raytracer_core.cpp:357-415; per-batch render_time in the
status bar, interaction.py:1291) with structured counters: frame timers with
proper device synchronization, rolling Mrays/s, and an optional
``jax.profiler`` trace context for XLA-level analysis (SURVEY.md §5).

Timing on this platform needs care: ``block_until_ready`` alone does not
reliably fence the remote TPU stream; reading back a device scalar does.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp


def sync(x=None) -> None:
    """Hard device fence: reduce to a scalar on device and read it back."""
    if x is None:
        jax.block_until_ready(jnp.zeros(()) + 0.0)
        return
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        jax.block_until_ready(leaves)
        # readback of one element forces stream completion on remote targets
        _ = jnp.asarray(leaves[0]).ravel()[0].item()


@dataclass
class FrameStats:
    """Rolling render statistics (Mrays/s, ms/frame)."""

    window: int = 32
    times: List[float] = field(default_factory=list)
    rays: List[int] = field(default_factory=list)

    def record(self, seconds: float, ray_segments: int):
        self.times.append(seconds)
        self.rays.append(ray_segments)
        if len(self.times) > self.window:
            self.times.pop(0)
            self.rays.pop(0)

    @property
    def frame_ms(self) -> float:
        return 1e3 * (sum(self.times) / len(self.times)) if self.times else 0.0

    @property
    def mrays_per_s(self) -> float:
        t = sum(self.times)
        return (sum(self.rays) / t / 1e6) if t > 0 else 0.0

    def summary(self) -> str:
        return f"{self.frame_ms:.1f} ms/frame, {self.mrays_per_s:.1f} Mrays/s"


@contextlib.contextmanager
def frame_timer(stats: FrameStats | None = None, ray_segments: int = 0):
    """Time a render call with a hard fence; optionally record into stats."""
    t0 = time.perf_counter()
    holder = {}
    yield holder
    sync(holder.get("result"))
    dt = time.perf_counter() - t0
    holder["seconds"] = dt
    if stats is not None:
        stats.record(dt, ray_segments)


@contextlib.contextmanager
def xla_trace(logdir: str):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
