"""Driver entry points must work hermetically (VERDICT.md weak #1).

Round 1's MULTICHIP check went red because dryrun_multichip trusted the
environment and initialized the TPU plugin instead of the virtual CPU mesh.
These tests call the real entry points the way the driver does.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

import __graft_entry__ as ge


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_4():
    # Smaller mesh than available devices must also work.
    ge.dryrun_multichip(4)


def test_entry_compiles():
    fn, (params, inputs) = ge.entry()
    out = jax.jit(fn)(params, inputs)
    out = np.asarray(out)
    assert out.shape == (1, 1, 6144)
    assert np.isfinite(out).all()
