"""Driver-gate parity: run __graft_entry__.dryrun_multichip(8) VERBATIM.

The r2 regression (an even-width zero-slice inside shard_map tripping an
XLA sharding-override assert) shipped red because no fast test exercised
the exact code path the driver gates on. This test IS that path: same
function, same device count, same virtual-CPU mesh the driver uses. It
must stay in the FAST tier — with the persistent .jax_cache warm it runs
in seconds; keep it green before every commit.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_8():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn).lower(*args).compile()(*args)
    jax.block_until_ready(out)
