"""Driver entry points stay healthy: entry() compiles, dryrun shards."""

import jax
import numpy as np
import pytest

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8(capsys):
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "sharded Adam step + L-BFGS segment OK" in out


def test_dryrun_multichip_too_many_devices():
    # Self-provisioning raises RuntimeError once the backend is already
    # initialized with fewer devices (provisioning only works pre-init).
    with pytest.raises(RuntimeError, match="need 9999 devices"):
        graft.dryrun_multichip(9999)
