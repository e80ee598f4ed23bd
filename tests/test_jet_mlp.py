"""Jet-propagation MLP vs nested autodiff — the framework's numerical core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_elastodynamics_tpu.models import mlp
from pinn_elastodynamics_tpu.models.fields import (
    CompositeFieldModel,
    FieldSpec,
    FIRST_ORDER,
    MLPFieldModel,
    SECOND_ORDER,
)
from pinn_elastodynamics_tpu.ops.jet import Jet, input_jet


def _autodiff_jet(apply_fn, x, order):
    f_single = lambda p: apply_fn(p[None])[0]
    jac = jax.vmap(jax.jacfwd(f_single))(x)  # (N, C, A)
    d = jnp.transpose(jac, (2, 0, 1))
    dtt = None
    if order >= 2:
        hess = jax.vmap(jax.hessian(f_single))(x)  # (N, C, A, A)
        dtt = hess[:, :, -1, -1]
    return apply_fn(x), d, dtt


@pytest.mark.parametrize("formulation", [SECOND_ORDER, FIRST_ORDER])
@pytest.mark.parametrize("normalize", [False, True])
def test_mlp_jet_matches_autodiff(formulation, normalize):
    spec = FieldSpec(ndim=2, formulation=formulation)
    model = MLPFieldModel(
        spec=spec, hidden=(24, 24, 24), normalize=normalize,
        lb=(0.0, 0.0, 0.0), ub=(2.0, 3.0, 10.0),
    )
    params = model.init(jax.random.PRNGKey(0), jnp.float64)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (11, 3), jnp.float64, 0.1, 1.9
    )
    jet = model.jet(params, x)
    f, d, dtt = _autodiff_jet(lambda p: model.apply(params, p), x, spec.jet_order)
    np.testing.assert_allclose(jet.f, f, atol=1e-12)
    np.testing.assert_allclose(jet.d, d, atol=1e-12)
    if spec.jet_order >= 2:
        np.testing.assert_allclose(jet.dtt, dtt, atol=1e-11)
    else:
        assert jet.dtt is None


def test_mlp_jet_3d():
    spec = FieldSpec(ndim=3, formulation=FIRST_ORDER)
    model = MLPFieldModel(spec=spec, hidden=(16, 16))
    params = model.init(jax.random.PRNGKey(2), jnp.float64)
    x = jax.random.uniform(jax.random.PRNGKey(3), (5, 4), jnp.float64)
    jet = model.jet(params, x)
    f, d, _ = _autodiff_jet(lambda p: model.apply(params, p), x, 1)
    assert jet.f.shape == (5, 12)
    np.testing.assert_allclose(jet.d, d, atol=1e-12)


def test_composite_jet_matches_autodiff():
    """u = P + D·ũ with derivatives by jet product rule (train.py:382-387)."""
    spec = FieldSpec(ndim=2, formulation=SECOND_ORDER)
    comp = CompositeFieldModel(
        spec=spec, uv_hidden=(20, 20), dist_hidden=(12, 12), part_hidden=(12,)
    )
    params = comp.init(jax.random.PRNGKey(4), jnp.float64)
    x = jax.random.uniform(jax.random.PRNGKey(5), (9, 3), jnp.float64)
    jet = comp.jet(params, x)
    f, d, dtt = _autodiff_jet(lambda p: comp.apply(params, p), x, 2)
    np.testing.assert_allclose(jet.f, f, atol=1e-12)
    np.testing.assert_allclose(jet.d, d, atol=1e-11)
    np.testing.assert_allclose(jet.dtt, dtt, atol=1e-10)


def test_xavier_init_stats():
    """Truncated-normal Xavier: zero-mean, stddev ≈ sqrt(2/(fan_in+fan_out)),
    support within ±2σ (train.py:269-274)."""
    w = mlp.truncated_normal_xavier(
        jax.random.PRNGKey(0), (400, 300), jnp.float64
    )
    std = float(np.sqrt(2.0 / 700.0))
    assert abs(float(w.mean())) < 0.001
    assert abs(float(w.std()) - std * 0.88) < 0.01  # truncation shrinks std
    assert float(jnp.abs(w).max()) <= 2.0 * std + 1e-12


def test_init_layer_shapes_and_bias_zero():
    params = mlp.init_mlp(jax.random.PRNGKey(0), [3, 20, 30, 5], jnp.float32)
    assert [tuple(l["W"].shape) for l in params] == [(3, 20), (20, 30), (30, 5)]
    for l in params:
        assert float(jnp.abs(l["b"]).max()) == 0.0
    assert mlp.mlp_layers(params) == [3, 20, 30, 5]


def test_jet_algebra_product_rule():
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mk = lambda k, shape: jax.random.normal(k, shape, dtype=jnp.float64)
    a = Jet(f=mk(k1, (4, 2)), d=mk(k2, (3, 4, 2)), dtt=mk(k3, (4, 2)))
    b = Jet(f=mk(k4, (4, 2)), d=mk(k1, (3, 4, 2)), dtt=mk(k2, (4, 2)))
    p = a * b
    np.testing.assert_allclose(p.f, a.f * b.f)
    np.testing.assert_allclose(p.d, a.d * b.f[None] + a.f[None] * b.d)
    np.testing.assert_allclose(
        p.dtt, a.dtt * b.f + 2 * a.d[-1] * b.d[-1] + a.f * b.dtt
    )
    s = a + b
    np.testing.assert_allclose(s.f, a.f + b.f)
    ch = a[1]
    assert ch.f.shape == (4, 1) and ch.d.shape == (3, 4, 1)


def test_input_jet_identity():
    x = jnp.arange(12.0).reshape(4, 3)
    jet = input_jet(x, order=2)
    np.testing.assert_allclose(jet.f, x)
    for i in range(3):
        expected = jnp.zeros((4, 3)).at[:, i].set(1.0)
        np.testing.assert_allclose(jet.d[i], expected)
    np.testing.assert_allclose(jet.dtt, 0.0)
