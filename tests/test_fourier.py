"""Fourier-feature field model: jet correctness + PDE residual integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_elastodynamics_tpu.banks import make_bank
from pinn_elastodynamics_tpu.losses.terms import LossSpec, PDEResidual
from pinn_elastodynamics_tpu.models.fields import (
    FieldSpec, FIRST_ORDER, SECOND_ORDER,
)
from pinn_elastodynamics_tpu.models.fourier import FourierMLPFieldModel
from pinn_elastodynamics_tpu.ops.elasticity import Material, PLANE_STRAIN


def _autodiff_jet(apply_fn, x, order):
    f_single = lambda p: apply_fn(p[None])[0]
    jac = jax.vmap(jax.jacfwd(f_single))(x)
    d = jnp.transpose(jac, (2, 0, 1))
    dtt = None
    if order >= 2:
        hess = jax.vmap(jax.hessian(f_single))(x)
        dtt = hess[:, :, -1, -1]
    return d, dtt


@pytest.mark.parametrize("formulation", [SECOND_ORDER, FIRST_ORDER])
@pytest.mark.parametrize("normalize", [False, True])
def test_fourier_jet_matches_autodiff(formulation, normalize):
    spec = FieldSpec(ndim=2, formulation=formulation)
    model = FourierMLPFieldModel(
        spec=spec, hidden=(20, 20), n_features=8, feature_scale=0.7,
        normalize=normalize, lb=(0.0, 0.0, 0.0), ub=(2.0, 3.0, 10.0),
    )
    params = model.init(jax.random.PRNGKey(0), jnp.float64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (9, 3), jnp.float64,
                           0.1, 1.9)
    jet = model.jet(params, x)
    np.testing.assert_allclose(jet.f, model.apply(params, x), atol=1e-12)
    d, dtt = _autodiff_jet(lambda p: model.apply(params, p), x,
                           spec.jet_order)
    np.testing.assert_allclose(jet.d, d, atol=1e-10)
    if spec.jet_order >= 2:
        np.testing.assert_allclose(jet.dtt, dtt, atol=1e-9)


def test_fourier_model_trains_in_loss_pipeline():
    spec = FieldSpec(ndim=2, formulation=FIRST_ORDER)
    model = FourierMLPFieldModel(spec=spec, hidden=(16, 16), n_features=8)
    params = model.init(jax.random.PRNGKey(2), jnp.float64)
    rng = np.random.default_rng(0)
    banks = {"collocation": make_bank(rng.uniform(size=(64, 3)),
                                      dtype=jnp.float64)}
    loss_spec = LossSpec(
        terms=(("collocation", PDEResidual(plane=PLANE_STRAIN)),),
        weights=(("f_uv", 1.0), ("f_s", 1.0)),
    )
    mat = Material(E=2.5, mu=0.25, rho=1.0)

    def loss(p):
        total, _ = loss_spec.evaluate(model, p, mat, banks)
        return total

    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    l0 = float(loss(params))
    res = minimize(loss, params, maxiter=30)
    assert float(res.final_loss) < l0
    # B is a trainable leaf and participates in the optimization.
    assert not np.allclose(np.asarray(res.params["B"]),
                           np.asarray(params["B"]))
