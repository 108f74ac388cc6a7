"""Driver entry points compile and run (single-chip + virtual multi-chip)."""
import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    jax.block_until_ready(out)
    label, n_total, r, t, err = out
    assert int(n_total) > 0
    assert r.shape == (3, 3)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
