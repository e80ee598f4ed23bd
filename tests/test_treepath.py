"""Dotted-path trainable selection (utils/treepath.py).

The reference's var_list freezing reaches whole sub-networks only
(/root/reference/PlateHoleQuarter/train/train.py:219-247); the dotted path
extends it inside a sub-network — the motivating use is freezing the Fourier
frequency matrix ``uv.B`` while training ``uv.mlp``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_elastodynamics_tpu.cases import wave_confined
from pinn_elastodynamics_tpu.cases.base import _phase_loss_fn
from pinn_elastodynamics_tpu.train.lbfgs_host import make_host_phase_vg
from pinn_elastodynamics_tpu.utils.treepath import path_get, path_set


def test_path_get_set_roundtrip():
    tree = {"a": {"b": [1, 2], "c": 3}, "d": 4}
    assert path_get(tree, "a.b") == [1, 2]
    out = path_set(tree, "a.b", [9])
    assert out["a"]["b"] == [9]
    # untouched branches are shared, originals unmodified
    assert tree["a"]["b"] == [1, 2]
    assert out["a"]["c"] is tree["a"]["c"]
    assert out["d"] is tree["d"]
    assert path_set(tree, "d", 7)["d"] == 7


@pytest.fixture(scope="module")
def tiny_fourier_case():
    case = wave_confined.build(
        scale=0.002, pad_to_multiple_of=8, fourier=8, fourier_scale=1.0,
        bc="hard",
    )
    params = case.init_params(0)
    return case, params


def test_dotted_trainable_freezes_B(tiny_fourier_case):
    case, params = tiny_fourier_case
    phase = dataclasses.replace(case.phases[-1], trainable="uv.mlp")
    sub_fn, sub0, merge = _phase_loss_fn(case, phase, params)
    # sub0 is the mlp list only — no B leaf in the trainable tree
    leaves = jax.tree.leaves(sub0)
    assert len(leaves) == len(jax.tree.leaves(params["uv"]["mlp"]))
    # loss at sub0 equals the full loss at params
    full_phase = dataclasses.replace(case.phases[-1], trainable=None)
    full_fn, _, _ = _phase_loss_fn(case, full_phase, params)
    np.testing.assert_allclose(
        float(sub_fn(sub0)), float(full_fn(params)), rtol=1e-6
    )
    # gradient flows through the mlp subtree
    g = jax.grad(sub_fn)(sub0)
    assert max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g)) > 0
    # merge writes back at the path without touching B
    moved = jax.tree.map(lambda a: a + 0.01, sub0)
    merged = merge(params, moved)
    np.testing.assert_array_equal(
        np.asarray(merged["uv"]["B"]), np.asarray(params["uv"]["B"])
    )
    np.testing.assert_allclose(
        np.asarray(merged["uv"]["mlp"][0]["W"]),
        np.asarray(params["uv"]["mlp"][0]["W"]) + 0.01,
        rtol=1e-6,
    )


def test_host_vg_dotted_trainable(tiny_fourier_case):
    case, params = tiny_fourier_case
    phase = dataclasses.replace(case.phases[-1], trainable="uv.mlp")
    host_vg, x0, unravel32 = make_host_phase_vg(
        case, phase, params, chunk_size=64
    )
    n_mlp = sum(
        np.prod(l.shape) for l in jax.tree.leaves(params["uv"]["mlp"])
    )
    assert x0.size == n_mlp
    f, g = host_vg(x0)
    assert np.isfinite(f) and f > 0
    assert g.shape == x0.shape and np.abs(g).max() > 0
    # consistency with the full-tree loss at the same point
    full_phase = dataclasses.replace(case.phases[-1], trainable=None)
    full_fn, _, _ = _phase_loss_fn(case, full_phase, params)
    f32 = params  # params already f32
    np.testing.assert_allclose(f, float(full_fn(f32)), rtol=1e-5)
