"""Driver contract: entry() lowers single-chip; dryrun_multichip executes a
full sharded step on virtual CPU meshes."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft


def test_entry_returns_jittable_step():
    fn, args = graft.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None
    # shapes: flagship 256^2 padded state
    state = args[0]
    assert state.u.shape == (258, 258)


@pytest.mark.parametrize("n", [4, 8])
def test_dryrun_multichip(n):
    graft.dryrun_multichip(n)
