"""Driver entry points: forward compile check + 8-device dry run."""

import sys

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8_devices():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_returns_jittable():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    # trace-compile only (no execution): shape-level check is enough on CPU
    shapes = jax.eval_shape(fn, *args)
    assert shapes.shape == (64, 1000)
