"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax import (SURVEY.md §4: CPU-backend tests stand in for
TPU in CI; multi-chip sharding is validated on a virtual host-device mesh).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compile cache: XLA compiles are minutes on this host; the cache
# makes re-runs near-instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin's register() (sitecustomize in every process) OVERRIDES
# jax_platforms to "axon,cpu", so the env setdefault above never wins and any
# jax.devices() call initializes the TPU backend. Re-pin to CPU-only so the
# suite never touches the chip: a wedged tunnel (observed 2026-08-20: 25 min
# of zero output before collection, then SIGTERM) cannot hang a CPU suite.
# TPU_RT_TESTS_ON_TPU=1 un-hides the TPU backend — note the default device
# STAYS pinned to CPU either way, so only the TPU-gated tests (the ones that
# look up a "TPU" device and device_put onto it, e.g. test_parity.py's live
# parity/1/sqrt(N) checks, test_stratify's chip variant) actually run
# on-chip; everything else keeps its deterministic CPU path. That is the
# on-chip lane's design: the chip re-proves the headline claims, the CPU
# carries the breadth.
if not os.environ.get("TPU_RT_TESTS_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_device", jax.devices("cpu")[0])


@pytest.fixture(autouse=True)
def no_leaked_tpu_rt_threads():
    """Every tpu_rt worker thread must be gone when its test ends
    (VERDICT r3 item 4): a leaked daemon worker was alive during the one
    hard-SIGSEGV full-suite run of round 3 (inside JAX's compilation-cache
    read on the main thread). Workers are named tpu_rt-* and
    stop_rendering() now joins-or-raises; this fixture catches any test
    that forgets to stop a session."""
    import threading
    import time

    yield
    deadline = time.time() + 5.0
    while time.time() < deadline:
        leaked = [t.name for t in threading.enumerate()
                  if t.name.startswith("tpu_rt-") and t.is_alive()]
        if not leaked:
            return
        time.sleep(0.05)
    raise AssertionError(
        f"test leaked live tpu_rt worker threads: {leaked} — call "
        "stop_rendering() (it joins and raises on stuck workers)")


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
