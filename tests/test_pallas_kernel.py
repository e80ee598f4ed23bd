"""Fused-jet Pallas kernel vs the XLA jet (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_elastodynamics_tpu.kernels.fused_jet import fused_jet, pack_params
from pinn_elastodynamics_tpu.models.mlp import init_mlp, mlp_jet


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("layers", [
    [3, 70, 70, 5],            # plate-hole style widths (padded to 128)
    [3, 140, 140, 140, 7],     # confined-wave style
    [4, 64, 12],               # 3D inputs
])
def test_fused_jet_matches_xla(order, layers):
    params = init_mlp(jax.random.PRNGKey(0), layers, jnp.float32)
    n = 333  # deliberately not a block multiple
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, layers[0]), jnp.float32)
    ref = mlp_jet(params, x, order=order)
    ker = fused_jet(params, x, order=order, block=128, interpret=True)
    np.testing.assert_allclose(ker.f, ref.f, atol=2e-6)
    np.testing.assert_allclose(ker.d, ref.d, atol=2e-6)
    if order >= 2:
        np.testing.assert_allclose(ker.dtt, ref.dtt, atol=2e-6)
    else:
        assert ker.dtt is None


def test_fused_jet_normalization_path():
    params = init_mlp(jax.random.PRNGKey(2), [3, 80, 80, 7], jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(3), (200, 3), jnp.float32) * 30
    kw = dict(lb=(0.0, 0.0, 0.0), ub=(30.0, 30.0, 20.0))
    ref = mlp_jet(params, x, order=1, **kw)
    ker = fused_jet(params, x, order=1, block=128, interpret=True, **kw)
    np.testing.assert_allclose(ker.f, ref.f, atol=2e-6)
    np.testing.assert_allclose(ker.d, ref.d, atol=2e-6)


def test_pack_params_padding_inert():
    """Zero-padding to 128 lanes must not change any output."""
    params = init_mlp(jax.random.PRNGKey(4), [3, 30, 30, 5], jnp.float32)
    ws, bs, meta = pack_params(params)
    assert ws.shape == (3, 128, 128)
    assert meta["dims"] == [3, 30, 30, 5]
    # Padded regions are zero.
    assert float(jnp.abs(ws[0, 3:, :]).max()) == 0.0
    assert float(jnp.abs(ws[1, 30:, :]).max()) == 0.0
    assert float(jnp.abs(ws[1, :, 30:]).max()) == 0.0


def test_fused_composite_matches_jet_algebra():
    """One-launch composite kernel == part + dist*uv by host jet algebra."""
    from pinn_elastodynamics_tpu.kernels.fused_jet import (
        fused_composite_jet,
        model_fused_jet,
    )
    from pinn_elastodynamics_tpu.models.fields import (
        SECOND_ORDER,
        CompositeFieldModel,
        FieldSpec,
    )

    model = CompositeFieldModel(
        spec=FieldSpec(ndim=2, formulation=SECOND_ORDER),
        uv_hidden=(70,) * 3,
        dist_hidden=(20,) * 2,
        part_hidden=(20,) * 2,
    )
    params = model.init(jax.random.PRNGKey(7))
    n = 300  # not a block multiple
    x = jax.random.uniform(jax.random.PRNGKey(8), (n, 3), jnp.float32)
    ref = model.jet(params, x)  # XLA jets + host product rule
    ker = fused_composite_jet(params, x, order=2, block=128, interpret=True)
    np.testing.assert_allclose(ker.f, ref.f, atol=3e-6)
    np.testing.assert_allclose(ker.d, ref.d, atol=3e-6)
    np.testing.assert_allclose(ker.dtt, ref.dtt, atol=3e-6)
    # model_fused_jet routes composites through the single launch.
    via_model = model_fused_jet(model, params, x, interpret=True)
    np.testing.assert_allclose(via_model.f, ker.f, atol=1e-7)


def test_fused_composite_order1_normalized():
    """The kernel's lb/ub path == XLA jet of per-net normalized MLPs; and
    CompositeFieldModel(normalize=True) without Fourier is a documented
    no-op (dist/part — and the plain uv net — always see raw coordinates,
    models/fields.py::_sub), so its jet equals the kernel WITHOUT lb/ub."""
    from pinn_elastodynamics_tpu.kernels.fused_jet import fused_composite_jet
    from pinn_elastodynamics_tpu.models.fields import (
        FIRST_ORDER,
        CompositeFieldModel,
        FieldSpec,
        MLPFieldModel,
    )

    spec = FieldSpec(ndim=2, formulation=FIRST_ORDER)
    lb, ub = (0.0, 0.0, 0.0), (30.0, 30.0, 20.0)
    hidden = {"uv": (40,) * 2, "dist": (16,) * 2, "part": (16,) * 2}
    nets = {k: MLPFieldModel(spec=spec, hidden=h, normalize=True,
                             lb=lb, ub=ub) for k, h in hidden.items()}
    key = jax.random.PRNGKey(9)
    params = {k: m.init(k2) for (k, m), k2 in
              zip(nets.items(), jax.random.split(key, 3))}
    x = jax.random.uniform(jax.random.PRNGKey(10), (150, 3), jnp.float32) * 20

    ref = (nets["part"].jet(params["part"], x, order=1)
           + nets["dist"].jet(params["dist"], x, order=1)
           * nets["uv"].jet(params["uv"], x, order=1))
    ker = fused_composite_jet(
        params, x, order=1, lb=lb, ub=ub, block=64, interpret=True,
    )
    np.testing.assert_allclose(ker.f, ref.f, atol=3e-6)
    np.testing.assert_allclose(ker.d, ref.d, atol=3e-6)
    assert ker.dtt is None

    # normalize=True on a plain (non-Fourier) composite is a no-op.
    model = CompositeFieldModel(
        spec=spec, uv_hidden=hidden["uv"], dist_hidden=hidden["dist"],
        part_hidden=hidden["part"], normalize=True, lb=lb, ub=ub,
    )
    raw = fused_composite_jet(params, x, order=1, block=64, interpret=True)
    mj = model.jet(params, x)
    np.testing.assert_allclose(np.asarray(mj.f), np.asarray(raw.f), atol=3e-6)
    np.testing.assert_allclose(np.asarray(mj.d), np.asarray(raw.d), atol=3e-6)
