"""Checkpoint I/O + reference pickle interop."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_elastodynamics_tpu.models.mlp import init_mlp, mlp_apply
from pinn_elastodynamics_tpu.train import checkpoint as ckpt

REF_UV = "/root/reference/PlateHoleQuarter/train/uvNN_float64.pickle"


def test_native_roundtrip(tmp_path):
    tree = {
        "params": init_mlp(jax.random.PRNGKey(0), [3, 8, 5], jnp.float32),
        "step": np.int64(42),
        "nested": {"m": jnp.ones((2, 3))},
    }
    path = str(tmp_path / "ck.pkl")
    ckpt.save_checkpoint(path, tree)
    loaded = ckpt.load_checkpoint(path)
    assert int(loaded["step"]) == 42
    np.testing.assert_allclose(loaded["nested"]["m"], 1.0)
    np.testing.assert_allclose(
        loaded["params"][0]["W"], tree["params"][0]["W"]
    )


def test_atomic_write_leaves_no_tmp(tmp_path):
    path = str(tmp_path / "ck.pkl")
    ckpt.save_checkpoint(path, {"a": jnp.zeros(3)})
    ckpt.save_checkpoint(path, {"a": jnp.ones(3)})  # overwrite
    files = os.listdir(tmp_path)
    assert files == ["ck.pkl"]
    assert float(ckpt.load_checkpoint(path)["a"][0]) == 1.0


def test_reference_pickle_roundtrip(tmp_path):
    params = init_mlp(jax.random.PRNGKey(1), [3, 20, 20, 5], jnp.float64)
    path = str(tmp_path / "ref.pickle")
    ckpt.save_reference_pickle(path, params)
    # Layout on disk is the reference's [weights, biases] with (1, out) biases
    # (train.py:288-289).
    with open(path, "rb") as f:
        w, b = pickle.load(f)
    assert [x.shape for x in w] == [(3, 20), (20, 20), (20, 5)]
    assert [x.shape for x in b] == [(1, 20), (1, 20), (1, 5)]
    back = ckpt.load_reference_pickle(path, jnp.float64)
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 3), jnp.float64)
    np.testing.assert_allclose(
        mlp_apply(params, x), mlp_apply(back, x), atol=1e-15
    )


def test_load_shipped_reference_pickle():
    """The reference's shipped uv network loads and has the documented
    architecture [3]+8×[70]+[5] (train.py:885)."""
    params = ckpt.load_reference_pickle(REF_UV, jnp.float64)
    ckpt.assert_layers_match(params, [3] + 8 * [70] + [5])
    x = jnp.asarray([[0.25, 0.25, 5.0]], jnp.float64)
    out = mlp_apply(params, x)
    assert out.shape == (1, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_layer_mismatch_raises(tmp_path):
    path = str(tmp_path / "bad.pickle")
    with open(path, "wb") as f:
        pickle.dump([[np.zeros((3, 4))], [np.zeros((1, 5))]], f)
    with pytest.raises(ValueError, match="shape mismatch"):
        ckpt.load_reference_pickle(path)
    params = init_mlp(jax.random.PRNGKey(0), [3, 8, 5], jnp.float32)
    with pytest.raises(AssertionError, match="layers"):
        ckpt.assert_layers_match(params, [3, 9, 5])
