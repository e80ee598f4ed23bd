"""Residual-based adaptive sampling + debug utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_elastodynamics_tpu.banks import make_bank
from pinn_elastodynamics_tpu.geometry.adaptive import (
    pointwise_residual_norm,
    residual_resample,
    topk_refine,
)
from pinn_elastodynamics_tpu.models.fields import (
    FieldSpec, FIRST_ORDER, MLPFieldModel,
)
from pinn_elastodynamics_tpu.ops.elasticity import Material, PLANE_STRAIN
from pinn_elastodynamics_tpu.utils.debug import (
    assert_finite, nan_debugging, tree_max_abs_diff,
)

MAT = Material(E=2.5, mu=0.25, rho=1.0)


@pytest.fixture(scope="module")
def model_params():
    model = MLPFieldModel(
        spec=FieldSpec(ndim=2, formulation=FIRST_ORDER), hidden=(16, 16)
    )
    return model, model.init(jax.random.PRNGKey(0), jnp.float64)


def test_pointwise_residual_norm(model_params):
    model, params = model_params
    xyt = jax.random.uniform(jax.random.PRNGKey(1), (40, 3), jnp.float64)
    r = pointwise_residual_norm(model, params, MAT, PLANE_STRAIN, xyt)
    assert r.shape == (40,)
    assert (np.asarray(r) >= 0).all()


def test_topk_refine_prefers_padding_and_high_residual(model_params):
    model, params = model_params
    rng = np.random.default_rng(2)
    bank = make_bank(rng.uniform(size=(20, 3)), dtype=jnp.float64,
                     pad_to_multiple_of=8)  # 24 rows, 4 padding
    cands = rng.uniform(size=(100, 3))
    new_bank, info = topk_refine(model, params, MAT, PLANE_STRAIN,
                                 bank, cands, k=4)
    # All padding slots became real points; no real point evicted for k=4.
    assert float(new_bank.mask.sum()) == 24
    assert new_bank.xyt.shape == bank.xyt.shape
    assert info["replaced"] == 4
    # The inserted candidates have higher residual than the pool median.
    r_all = np.asarray(pointwise_residual_norm(
        model, params, MAT, PLANE_STRAIN, jnp.asarray(cands)))
    assert info["cand_residual_mean"] >= np.median(r_all)


def test_topk_refine_rejects_value_banks(model_params):
    model, params = model_params
    bank = make_bank(np.zeros((8, 3)), {"v": np.zeros(8)}, dtype=jnp.float64)
    with pytest.raises(ValueError, match="value-free"):
        topk_refine(model, params, MAT, PLANE_STRAIN, bank,
                    np.zeros((8, 3)), k=2)


def test_residual_resample_concentrates(model_params):
    model, params = model_params
    rng = np.random.default_rng(3)
    pool = rng.uniform(size=(2000, 3))
    out = residual_resample(model, params, MAT, PLANE_STRAIN, pool, 500,
                            power=2.0, uniform_floor=0.0, seed=1)
    assert out.shape == (500, 3)
    r_pool = np.asarray(pointwise_residual_norm(
        model, params, MAT, PLANE_STRAIN, jnp.asarray(pool)))
    r_out = np.asarray(pointwise_residual_norm(
        model, params, MAT, PLANE_STRAIN, jnp.asarray(out)))
    # Importance sampling shifts the mean residual up.
    assert r_out.mean() > r_pool.mean()


def test_assert_finite():
    assert_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_finite({"a": {"b": jnp.asarray([1.0, np.nan])}}, name="p")


def test_tree_max_abs_diff():
    a = {"x": jnp.zeros(3), "y": jnp.ones(2)}
    b = {"x": jnp.full(3, 0.5), "y": jnp.ones(2)}
    assert tree_max_abs_diff(a, b) == pytest.approx(0.5)


def test_nan_debugging_context():
    with nan_debugging(False):
        pass
    prev = jax.config.jax_debug_nans
    with nan_debugging(True):
        assert jax.config.jax_debug_nans
    assert jax.config.jax_debug_nans == prev
