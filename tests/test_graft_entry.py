"""Driver entry points: single-chip forward and multichip dryrun shapes."""

import sys

sys.path.insert(0, ".")

import jax
import numpy as np
import pytest

import __graft_entry__ as graft


def test_entry_forward_jits():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 128, 80)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("n", [1, 4, 8])
def test_dryrun_multichip(n):
    graft.dryrun_multichip(n)
