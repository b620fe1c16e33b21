"""Driver entry points stay working (runs on the 8-device CPU mesh)."""
import sys
import pytest

sys.path.insert(0, "/root/repo")


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_shapes():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    cls, cnt, reg = out
    assert len(cls) == 5
    assert tuple(cls[0].shape) == (1, 64, 64, 20)
    assert tuple(reg[4].shape) == (1, 4, 4, 4)
