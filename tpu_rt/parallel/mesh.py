"""Device mesh + sharded rendering.

TPU-native replacement for the reference's OpenMP fork/join data parallelism
(#pragma omp parallel, cpp_raytracer/raytracer_core.cpp:365-384): instead of
threads splitting a shared image buffer, a 2D ``jax.sharding.Mesh``
('tile', 'sample') splits the work across chips with XLA collectives over ICI
(SURVEY.md §2.3):

  * **tile axis** — image rows are sharded (image-space DP, the analogue of
    the reference's static pixel partitioning, raytracer_core.cpp:381-384).
    Each device renders its row block; the output stays sharded (no gather
    needed until display).
  * **sample axis** — samples-per-pixel are sharded (sample-space DP, the
    analogue of the reference's spp batching, interaction.py:589). Devices
    render the same rows with independent RNG streams (per-device fold_in
    replacing per-thread PCG32 seeds) and ``psum``-mean over ICI.

Rendering is embarrassingly parallel, so the only collective is the final
mean over the sample axis — laid out to ride ICI, never DCN.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..core import camera as cammod
from ..core.types import CameraP, SphereScene
from ..ops.integrator import trace


def make_mesh(
    n_tile: int | None = None,
    n_sample: int | None = None,
    devices=None,
) -> Mesh:
    """Build a ('tile', 'sample') mesh over the available devices.

    Default factorization puts as many devices as possible on the tile axis
    (output stays distributed) and the remainder on samples.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if n_tile is None and n_sample is None:
        n_sample = 1
        n_tile = n
    elif n_tile is None:
        n_tile = n // n_sample
    elif n_sample is None:
        n_sample = n // n_tile
    if n_tile * n_sample != n:
        raise ValueError(f"mesh {n_tile}x{n_sample} != {n} devices")
    dev_array = np.asarray(devices).reshape(n_tile, n_sample)
    return Mesh(dev_array, axis_names=("tile", "sample"))


@partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "spp", "max_depth", "mode",
                     "enable_refraction", "gamma", "engine", "n_active",
                     "interpret", "n_tri_active", "enable_dof", "use_bvh",
                     "nee", "stratify"),
)
def render_sharded(
    scene: SphereScene,
    cam: CameraP,
    key: jax.Array,
    mesh: Mesh,
    width: int = 1920,
    height: int = 1080,
    spp: int = 4,
    max_depth: int = 4,
    mode: str = "v2",
    enable_refraction: bool = False,
    gamma: bool = True,
    engine: str = "lax",
    n_active: int | None = None,
    interpret: bool = False,
    scene_mesh=None,
    n_tri_active: int | None = None,
    enable_dof: bool = False,
    use_bvh: bool = False,
    nee: bool = False,
    stratify: bool = False,
):
    """Render one frame over the mesh; returns (height, width, 3) f32.

    Requires ``height % n_tile == 0`` and ``spp % n_sample == 0``. The scene
    and camera are replicated (KBs — SURVEY.md §2.3), rows are sharded over
    'tile', spp over 'sample'; the result is psum-meaned over 'sample' and
    left sharded over 'tile'.

    ``engine`` selects the per-shard renderer: "lax" (general), "pallas"
    (fused megakernel, small scenes), or "cluster" (large scenes; needs the
    per-device row band to be a multiple of 32). All three accept
    ``scene_mesh`` (a replicated TriangleMesh rendered alongside the
    spheres); the lax engine additionally honors ``use_bvh`` — the single
    sharded entry point renders everything everywhere, matching the
    reference's one render() API (binding.cpp:99-101).

    ``nee`` (next-event estimation) and ``stratify`` (R2 pixel lattice)
    thread through to every engine (VERDICT r3 item 3). Under sample-axis
    sharding the lax engine stratifies across the GLOBAL spp (lattice
    index si*spp_per + s with a tile-keyed shift, so the sharded frame
    equals the single-device pattern); the Pallas engines stratify within
    each sample shard (per-shard seeds key their shifts), which preserves
    the estimator mean and most of the variance win.
    """
    n_tile = mesh.shape["tile"]
    n_sample = mesh.shape["sample"]
    if height % n_tile != 0:
        raise ValueError(f"height {height} not divisible by tile axis {n_tile}")
    if spp % n_sample != 0:
        raise ValueError(f"spp {spp} not divisible by sample axis {n_sample}")
    rows_per = height // n_tile
    spp_per = spp // n_sample

    def shard_fn(scene_rep: SphereScene, cam_rep: CameraP, key_rep: jax.Array,
                 *rest):
        mesh_rep = rest[0] if rest else None
        ti = jax.lax.axis_index("tile")
        si = jax.lax.axis_index("sample")
        # Per-device RNG stream: fold mesh coordinates into the frame key —
        # the deterministic replacement for PCG32(thread_id + 1)
        # (raytracer_core.cpp:377-378), independent of device count.
        dev_key = jax.random.fold_in(
            jax.random.fold_in(key_rep, ti), si + 1
        )
        row0 = ti * rows_per
        R = rows_per * width

        if engine == "cluster":
            from ..ops.pallas_cluster import render_cluster

            seed = jax.random.key_data(dev_key).ravel()[-1].astype(jnp.int32)
            band = render_cluster(
                scene_rep, cam_rep, seed, width=width, height=height,
                spp=spp_per, max_depth=max_depth,
                enable_refraction=enable_refraction, gamma=False,
                n_active=n_active, rows=rows_per, row_offset=row0,
                interpret=interpret, mesh=mesh_rep,
                n_tri_active=n_tri_active, enable_dof=enable_dof,
                nee=nee, stratify=stratify,
            )
            band = jax.lax.pmean(band, axis_name="sample")
            if gamma:
                band = jnp.clip(jnp.sqrt(jnp.maximum(band, 0.0)), 0.0, 1.0)
            return band

        if engine == "pallas":
            from ..ops.pallas_megakernel import render_pallas

            seed = jax.random.key_data(dev_key).ravel()[-1].astype(jnp.int32)
            band = render_pallas(
                scene_rep, cam_rep, seed, width=width, height=height,
                spp=spp_per, max_depth=max_depth,
                enable_refraction=enable_refraction, gamma=False,
                n_active=n_active, rows=rows_per, row_offset=row0,
                interpret=interpret, enable_dof=enable_dof,
                mesh=mesh_rep, n_tri_active=n_tri_active,
                nee=nee, stratify=stratify,
            )
            band = jax.lax.pmean(band, axis_name="sample")
            if gamma:
                band = jnp.clip(jnp.sqrt(jnp.maximum(band, 0.0)), 0.0, 1.0)
            return band

        if stratify:
            # per-pixel Cranley-Patterson shift, keyed WITHOUT the sample
            # index: sample-axis shards share it, so the union of their
            # global lattice indices reproduces the single-device pattern
            cp_shift = jax.random.uniform(
                jax.random.fold_in(jax.random.fold_in(key_rep, ti),
                                   0x7FFFABCD),
                (rows_per, width, 2), dtype=jnp.float32)
            r2_alpha = jnp.array([0.7548776662466927, 0.5698402909980532],
                                 jnp.float32)

        def sample_pass(carry, s):
            k_s = jax.random.fold_in(dev_key, s)
            k_jit, k_trace = jax.random.split(k_s)
            if stratify:
                s_g = (si * spp_per + s).astype(jnp.float32)
                xi = cp_shift + s_g * r2_alpha
                xi = xi - jnp.floor(xi)
            else:
                xi = jax.random.uniform(k_jit, (rows_per, width, 2),
                                        jnp.float32)
            jj, ii = jnp.meshgrid(
                jnp.arange(rows_per, dtype=jnp.float32) + row0,
                jnp.arange(width, dtype=jnp.float32),
                indexing="ij",
            )
            u = (ii + xi[..., 0]) / width
            v = (jj + xi[..., 1]) / height
            if enable_dof:
                lens = jax.random.uniform(jax.random.fold_in(k_s, 7),
                                          (R, 2), jnp.float32)
            else:
                lens = None
            o, d = cammod.generate_rays(cam_rep, u.reshape(R), v.reshape(R),
                                        lens_xi=lens)
            color = trace(
                scene_rep, o, d, k_trace, max_depth=max_depth, mode=mode,
                enable_refraction=enable_refraction,
                mesh=mesh_rep, use_bvh=use_bvh, nee=nee,
            )
            return carry + color, None

        # The accumulator is per-device state; mark it varying over both
        # mesh axes so the scan carry types line up.
        acc0 = jax.lax.pcast(jnp.zeros((R, 3), jnp.float32),
                             ("tile", "sample"), to="varying")
        acc, _ = jax.lax.scan(
            sample_pass, acc0, jnp.arange(spp_per, dtype=jnp.int32),
        )
        # Merge sample-shards over ICI; divide by global spp.
        acc = jax.lax.psum(acc, axis_name="sample")
        img = acc.reshape(rows_per, width, 3) / spp
        if gamma:
            img = jnp.clip(jnp.sqrt(jnp.maximum(img, 0.0)), 0.0, 1.0)
        return img

    operands = (scene, cam, key)
    in_specs = (P(), P(), P())
    if scene_mesh is not None:
        operands += (scene_mesh,)
        in_specs += (P(),)
    out = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P("tile", None, None),
        # The sharding type checker cannot cover Pallas kernels in JAX
        # 0.9.0: under check_vma=True the kernel jaxpr acquires `pvary`
        # ops, which Mosaic rejects ("Unimplemented primitive in Pallas
        # TPU lowering ... pvary") and the HLO interpreter rejects too
        # ("Primitive dynamic_slice requires varying manual axes to
        # match"), both with ask-to-file-an-issue errors. The engines
        # already accept a `vma=` out-shape annotation
        # (ops/pallas_*.py render_*), so flipping this on is a one-line
        # change once upstream lands pvary lowering. The psum/pmean
        # layering is identical to the (checked) lax branch.
        check_vma=(engine not in ("pallas", "cluster")),
    )(*operands)
    return out
