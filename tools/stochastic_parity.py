#!/usr/bin/env python3
"""Quantitative stochastic-parity goldens: RMSE-of-means vs the C++ reference.

BASELINE target: RMSE <= 1e-3 vs the reference render. A single stochastic
frame can't show that (the MC noise floor of one 512-spp frame is ~0.03 in
gamma space), so both sides average N independent 512-spp batches: the
per-pixel means converge at sigma*sqrt(2/N), and any estimator mismatch
> 1e-3 survives the averaging while the noise does not.

Phase "cpp": compile the reference v1 pipeline and produce the mean of N
  render() batches (thread-local RNG advances across calls -> independent
  draws). ~17 min at N=2048 on this 1-core host; one-time, cached in
  tests/goldens/.
Phase "tpu": render the same average with tpu-rt's v1-mode estimator
  (lax engine; each batch gets a fresh fold_in key), on whatever backend
  jax picks (TPU when available).

Both means + metadata land in tests/goldens/; tests/test_parity.py asserts
the RMSE target and the 1/sqrt(N) scaling.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDENS = os.path.join(REPO, "tests", "goldens")

W, H, SPP, DEPTH = 64, 48, 512, 4


def run_cpp(n_batches: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_reference_goldens import BUILD, build

    exe = build()
    out = f"{BUILD}/avg.bin"
    import subprocess

    proc = subprocess.run(
        [exe, "avg", str(W), str(H), out, str(SPP), str(DEPTH),
         str(n_batches)],
        check=True, capture_output=True, text=True)
    secs = None
    for line in proc.stderr.splitlines():
        if line.startswith("RENDER_SECONDS"):
            secs = float(line.split()[1])
    img = np.fromfile(out, np.float32).reshape(H, W, 3)
    np.save(f"{GOLDENS}/ref_mean_{W}x{H}_{SPP}spp_d{DEPTH}_N{n_batches}.npy",
            img)
    meta_path = f"{GOLDENS}/parity_meta.json"
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    meta["cpp"] = {"w": W, "h": H, "spp": SPP, "depth": DEPTH,
                   "n_batches": n_batches, "seconds": secs}
    json.dump(meta, open(meta_path, "w"), indent=2)
    print(f"cpp mean N={n_batches}: {secs:.1f}s -> mean {img.mean():.5f}")


def run_tpu(n_batches: int) -> None:
    """v1-estimator mean of N independent 512-spp batches, batches chained
    on device (fori_loop over folded keys) — one dispatch per 128 batches
    instead of one per batch (~25 ms tunnel RTT each made N=4096 a
    40-minute run; chained it is minutes). Streams are keyed fold_in(
    key(1000), b): independent draws, which is all the mean requires."""
    import jax
    import jax.numpy as jnp

    import tpu_rt

    dev = jax.devices()[0]
    scene = jax.device_put(tpu_rt.demo_scene(), dev)
    cam = jax.device_put(tpu_rt.make_camera(aspect=W / H), dev)
    CH = 128
    assert n_batches % CH == 0

    @jax.jit
    def chunk(b0):
        def body(i, acc):
            key = jax.random.fold_in(jax.random.key(1000), b0 + i)
            return acc + tpu_rt.render(scene, cam, key, width=W, height=H,
                                       spp=SPP, max_depth=DEPTH, mode="v1",
                                       engine="lax")
        return jax.lax.fori_loop(0, CH, body,
                                 jnp.zeros((H, W, 3), jnp.float32))

    acc = np.zeros((H, W, 3), np.float64)
    for c in range(n_batches // CH):
        acc += np.asarray(chunk(jnp.int32(c * CH)), np.float64)
        print(f"batch {(c + 1) * CH}/{n_batches}")
    mean = (acc / n_batches).astype(np.float32)
    np.save(f"{GOLDENS}/tpurt_mean_{W}x{H}_{SPP}spp_d{DEPTH}_N{n_batches}.npy",
            mean)
    meta_path = f"{GOLDENS}/parity_meta.json"
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    meta["tpurt"] = {"w": W, "h": H, "spp": SPP, "depth": DEPTH,
                     "n_batches": n_batches,
                     "device": str(jax.devices()[0])}
    json.dump(meta, open(meta_path, "w"), indent=2)
    print(f"tpu-rt mean N={n_batches}: mean {mean.mean():.5f}")

    ref_files = [f for f in os.listdir(GOLDENS)
                 if f.startswith(f"ref_mean_{W}x{H}_{SPP}spp_d{DEPTH}_N")]
    for f in sorted(ref_files):
        ref = np.load(os.path.join(GOLDENS, f))
        rmse = float(np.sqrt(((mean - ref) ** 2).mean()))
        print(f"RMSE vs {f}: {rmse:.2e}")


def run_v2(n_batches: int) -> None:
    """Means-level parity goldens for the PRODUCTION engines (VERDICT r2
    item 3): N-batch means of the v2 estimator from all three engines —
    the lax v2 oracle (itself golden-anchored to the reference at depth 1
    and v1-anchored stochastically) plus the Pallas megakernel and cluster
    engines users actually run. tests/test_parity.py asserts pairwise
    RMSE-of-means <= 1e-3. Batches are chained on device (fori_loop) so
    N=2048 is seconds, not dispatch-bound minutes."""
    import jax
    import jax.numpy as jnp

    import tpu_rt
    from tpu_rt.ops.pallas_cluster import build_clusters, render_cluster
    from tpu_rt.ops.pallas_megakernel import render_pallas
    from tpu_rt.render.frame import render

    dev = jax.devices()[0]
    scene = jax.device_put(tpu_rt.demo_scene(), dev)
    cam = jax.device_put(tpu_rt.make_camera(aspect=W / H), dev)
    zeros = jnp.zeros((H, W, 3), jnp.float32)
    CH = 128  # batches per dispatch
    assert n_batches % CH == 0
    # In-kernel PRNG streams are keyed seed + tile*spp + s; stride seeds
    # far apart so no two batches share a stream.
    STRIDE = 1 << 16

    def mean_of(chunk_fn, tag):
        acc = np.zeros((H, W, 3), np.float64)
        for c in range(n_batches // CH):
            acc += np.asarray(chunk_fn(jnp.int32(c * CH)), np.float64)
        mean = (acc / n_batches).astype(np.float32)
        np.save(f"{GOLDENS}/tpurt_{tag}_mean_{W}x{H}_{SPP}spp_d{DEPTH}"
                f"_N{n_batches}.npy", mean)
        print(f"{tag} mean N={n_batches}: {mean.mean():.5f}")
        return mean

    @jax.jit
    def lax_chunk(b0):
        def body(i, acc):
            key = jax.random.fold_in(jax.random.key(77), b0 + i)
            return acc + render(scene, cam, key, width=W, height=H, spp=SPP,
                                max_depth=DEPTH, mode="v2", engine="lax")
        return jax.lax.fori_loop(0, CH, body, zeros)

    @jax.jit
    def mega_chunk(b0):
        def body(i, acc):
            return acc + render_pallas(scene, cam, (b0 + i) * STRIDE,
                                       width=W, height=H, spp=SPP,
                                       max_depth=DEPTH, n_active=9)
        return jax.lax.fori_loop(0, CH, body, zeros)

    pre = jax.block_until_ready(build_clusters(scene, n_active=9))

    @jax.jit
    def cluster_chunk(b0):
        def body(i, acc):
            return acc + render_cluster(scene, cam, (b0 + i) * STRIDE,
                                        width=W, height=H, spp=SPP,
                                        max_depth=DEPTH, n_active=9,
                                        prebuilt=pre)
        return jax.lax.fori_loop(0, CH, body, zeros)

    means = {
        "v2lax": mean_of(lax_chunk, "v2lax"),
        "mega": mean_of(mega_chunk, "mega"),
        "cluster": mean_of(cluster_chunk, "cluster"),
    }
    meta_path = f"{GOLDENS}/parity_meta.json"
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    meta["v2_engines"] = {"w": W, "h": H, "spp": SPP, "depth": DEPTH,
                          "n_batches": n_batches,
                          "device": str(dev)}
    json.dump(meta, open(meta_path, "w"), indent=2)
    oracle = means["v2lax"]
    for tag in ("mega", "cluster"):
        rmse = float(np.sqrt(((means[tag] - oracle) ** 2).mean()))
        print(f"RMSE-of-means {tag} vs v2lax: {rmse:.2e}")


def run_v2_cluster(n_batches: int) -> None:
    """Cluster-engine-only slice of run_v2: regenerate just the cluster
    golden (the v2lax/mega goldens already exist and stay untouched) and
    report its RMSE-of-means against the stored v2lax oracle mean."""
    import jax
    import jax.numpy as jnp

    import tpu_rt
    from tpu_rt.ops.pallas_cluster import build_clusters, render_cluster

    dev = jax.devices()[0]
    scene = jax.device_put(tpu_rt.demo_scene(), dev)
    cam = jax.device_put(tpu_rt.make_camera(aspect=W / H), dev)
    zeros = jnp.zeros((H, W, 3), jnp.float32)
    CH = 128
    assert n_batches % CH == 0
    STRIDE = 1 << 16  # must match run_v2 so streams line up with mega's

    pre = jax.block_until_ready(build_clusters(scene, n_active=9))

    @jax.jit
    def cluster_chunk(b0):
        def body(i, acc):
            return acc + render_cluster(scene, cam, (b0 + i) * STRIDE,
                                        width=W, height=H, spp=SPP,
                                        max_depth=DEPTH, n_active=9,
                                        prebuilt=pre)
        return jax.lax.fori_loop(0, CH, body, zeros)

    acc = np.zeros((H, W, 3), np.float64)
    for c in range(n_batches // CH):
        acc += np.asarray(cluster_chunk(jnp.int32(c * CH)), np.float64)
        print(f"batch {(c + 1) * CH}/{n_batches}", flush=True)
    mean = (acc / n_batches).astype(np.float32)
    np.save(f"{GOLDENS}/tpurt_cluster_mean_{W}x{H}_{SPP}spp_d{DEPTH}"
            f"_N{n_batches}.npy", mean)
    print(f"cluster mean N={n_batches}: {mean.mean():.5f}")

    oracle_path = (f"{GOLDENS}/tpurt_v2lax_mean_{W}x{H}_{SPP}spp_d{DEPTH}"
                   f"_N{n_batches}.npy")
    if os.path.exists(oracle_path):
        oracle = np.load(oracle_path)
        rmse = float(np.sqrt(((mean - oracle) ** 2).mean()))
        print(f"RMSE-of-means cluster vs v2lax: {rmse:.2e}")


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "cpp"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    if phase == "cpp":
        run_cpp(n)
    elif phase == "tpu":
        run_tpu(n)
    elif phase == "v2":
        run_v2(n)
    elif phase == "v2cluster":
        run_v2_cluster(n)
    else:
        raise SystemExit(f"unknown phase {phase}")
