"""Driver-contract checks: entry() compiles, dryrun_multichip runs on the
virtual 8-device CPU mesh."""

import sys

sys.path.insert(0, "/root/repo")


def test_entry_compiles():
    import jax
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 320, 320, 1)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
