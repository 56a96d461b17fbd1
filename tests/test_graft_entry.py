"""Driver entry points: single-chip forward + 8-virtual-device dry run."""

import jax
import jax.numpy as jnp


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (640, 640, 3)
    assert bool(jnp.isfinite(out).all())


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts internally
