"""Multi-host (pod-scale) mesh construction: DCN-aware device layout.

Executes the design in docs/SCALING.md "Multi-host (pod-scale) path":
the ('tile', 'sample') mesh of :mod:`tpu_rt.parallel.mesh` is built so
that **hosts partition the tile axis** — each host's chips own a
contiguous block of image-row bands, and the only collective
(`pmean` over 'sample') stays WITHIN one host's chips, riding ICI.
Cross-host (DCN) traffic is limited to full-frame assembly on whichever
host displays/encodes — once per displayed frame, never per batch.

This is the TPU-native analogue of scaling the reference's OpenMP
fork/join (cpp_raytracer/raytracer_core.cpp:365-384) past one machine:
instead of MPI-style image compositing, the sharding layout makes the
cross-host cut a pure data-placement decision that XLA never has to
communicate across during rendering.

On real pods, call ``jax.distributed.initialize()`` first; here (one
real chip) the layout is validated on a virtual CPU mesh by simulating
host boundaries (``tests/test_parallel.py``): a (2 hosts x 4 chips)
simulated pod renders bit-identically to a single-host mesh, and the
device placement proves no 'sample' collective crosses a host boundary.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
from jax.sharding import Mesh

import jax


def group_devices_by_host(devices=None):
    """Devices grouped by owning process (host), process-id order.

    For a simulated pod (all devices in one process), pass an explicit
    ``host_of`` mapping to :func:`make_multihost_mesh` instead.
    """
    devices = jax.devices() if devices is None else devices
    by_host = defaultdict(list)
    for d in devices:
        by_host[d.process_index].append(d)
    return [by_host[p] for p in sorted(by_host)]


def make_multihost_mesh(
    n_hosts: int | None = None,
    devices=None,
    sample_per_host: int = 1,
) -> Mesh:
    """Build a ('tile', 'sample') mesh whose tile axis is host-major.

    Host h's chips occupy tile rows ``[h*tiles_per_host, (h+1)*...)`` of
    the mesh, so every 'sample'-axis collective group (one mesh row) is
    a subset of a single host's chips — the psum/pmean of
    ``render_sharded`` never leaves a host. Cross-host DCN traffic is
    only the final gather of the 'tile'-sharded output, which happens
    once per *displayed* frame (or never, if each host encodes its own
    band).

    ``n_hosts=None`` uses the real process topology
    (:func:`group_devices_by_host`); an explicit ``n_hosts`` slices the
    device list into equal contiguous blocks — the single-process
    simulation used by the tests.

    ``sample_per_host`` chips of each host go to the 'sample' axis
    (intra-host spp parallelism over ICI); the rest extend 'tile'.
    """
    if n_hosts is None:
        hosts = group_devices_by_host(devices)
    else:
        devices = list(jax.devices() if devices is None else devices)
        if len(devices) % n_hosts:
            raise ValueError(
                f"{len(devices)} devices not divisible by {n_hosts} hosts")
        per = len(devices) // n_hosts
        hosts = [devices[h * per:(h + 1) * per] for h in range(n_hosts)]

    per_host = len(hosts[0])
    if any(len(h) != per_host for h in hosts):
        raise ValueError("hosts have unequal device counts")
    if per_host % sample_per_host:
        raise ValueError(
            f"{per_host} chips/host not divisible by "
            f"sample_per_host={sample_per_host}")
    tiles_per_host = per_host // sample_per_host

    rows = []
    for h in hosts:
        rows.extend(
            h[t * sample_per_host:(t + 1) * sample_per_host]
            for t in range(tiles_per_host)
        )
    dev_array = np.asarray(rows, dtype=object)
    return Mesh(dev_array, axis_names=("tile", "sample"))


def sample_groups_are_host_local(mesh: Mesh, host_of=None) -> bool:
    """True iff every 'sample' collective group lives on ONE host.

    ``host_of``: device -> host id (defaults to ``process_index``).
    This is the property that keeps the per-batch all-reduce on ICI and
    off DCN; the multi-host test asserts it for simulated host blocks.
    """
    host_of = (lambda d: d.process_index) if host_of is None else host_of
    for row in mesh.devices:  # one row = one 'sample' group
        if len({host_of(d) for d in np.ravel(row)}) != 1:
            return False
    return True


def dcn_bytes_per_displayed_frame(width: int, height: int,
                                  n_hosts: int) -> int:
    """Bytes crossing DCN to assemble one displayed frame on one host.

    The 'tile'-sharded f32 output means each remote host ships only its
    own row band: (n_hosts-1)/n_hosts of the image, once per displayed
    frame. At 1080p over 2 hosts this is ~12 MB/frame — interactive
    display rates (~30 fps -> ~360 MB/s) sit far below DCN bandwidth,
    which is why the design needs no compositing tree.
    """
    frame = width * height * 3 * 4
    return frame * (n_hosts - 1) // n_hosts
