"""The driver contract (__graft_entry__) must always work: entry() compiles
and dryrun_multichip executes a full sharded train step on the virtual mesh."""

import os
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_entry_compiles():
    import __graft_entry__ as g
    fn, (state, ids) = g.entry()
    compiled = jax.jit(fn).lower(state, ids).compile()
    assert compiled is not None


def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(len(jax.devices()))
