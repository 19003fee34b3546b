"""Driver-contract regression: __graft_entry__ must stay importable,
jittable single-chip, and multi-chip-dryrunnable on the virtual CPU mesh."""

import sys
import os

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == (512, 512, 3)


def test_dryrun_multichip_on_virtual_mesh():
    # conftest forces 8 virtual CPU devices
    graft.dryrun_multichip(4)
    graft.dryrun_multichip(2)
