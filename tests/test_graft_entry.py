"""Driver contract: entry() compile-check and multichip dryrun."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_entry_forward():
    import __graft_entry__ as ge
    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    assert out.shape == (8, 100)
    assert np.all(np.isfinite(np.asarray(out[:, :60])))


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
