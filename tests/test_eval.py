"""Rendering + metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_elastodynamics_tpu.eval.metrics import aggregate, field_errors, relative_l2
from pinn_elastodynamics_tpu.eval.render import predict_fields
from pinn_elastodynamics_tpu.models.fields import (
    FieldSpec, FIRST_ORDER, MLPFieldModel,
)


def test_relative_l2():
    a = np.array([3.0, 4.0])
    assert relative_l2(a, a) == 0.0
    assert relative_l2(np.zeros(2), a) == pytest.approx(1.0)
    assert relative_l2(2 * a, a) == pytest.approx(1.0)


def test_aggregate():
    out = aggregate([{"u": 0.1, "v": 0.3}, {"u": 0.3, "v": 0.5}])
    assert out == {"u": pytest.approx(0.2), "v": pytest.approx(0.4)}


def test_predict_fields_chunking_invariance():
    """Chunked rendering must equal single-shot (padding is sliced off)."""
    model = MLPFieldModel(
        spec=FieldSpec(ndim=2, formulation=FIRST_ORDER), hidden=(16, 16)
    )
    params = model.init(jax.random.PRNGKey(0), jnp.float64)
    xy = np.random.default_rng(0).uniform(size=(103, 2))
    a = predict_fields(model, params, xy, 0.7, chunk=32, dtype=np.float64)
    b = predict_fields(model, params, xy, 0.7, chunk=4096, dtype=np.float64)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-12, err_msg=k)
    # All channels + strains + amplitude come from one fused forward.
    assert set(a) >= {"u", "v", "ut", "vt", "s11", "s22", "s12",
                      "e11", "e22", "e12", "amp"}
    np.testing.assert_allclose(
        a["amp"], np.sqrt(a["u"] ** 2 + a["v"] ** 2), atol=1e-12
    )


def test_field_errors_selects_available():
    pred = {"u": np.ones(4), "v": np.ones(4)}
    ref = {"u": np.ones(4)}
    errs = field_errors(pred, ref, ("u", "v"))
    assert set(errs) == {"u"}
