"""Driver entry points stay green (the round harness compile-checks these)."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == (8, 4, 48, 48, 48)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
