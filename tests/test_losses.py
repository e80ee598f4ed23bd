"""Loss assembly: reference weighting, padding neutrality, term mechanics."""

import jax.numpy as jnp
import numpy as np
import pytest

from pinn_elastodynamics_tpu.banks import make_bank, masked_mean_square
from pinn_elastodynamics_tpu.cases import (
    plate_hole,
    wave_confined,
    wave_infinite,
    wave_semi_infinite,
)

SCALE = 0.002


def test_masked_mean_square_ignores_padding():
    r = jnp.asarray([1.0, 2.0, 3.0, 100.0])
    m = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    assert float(masked_mean_square(r, m)) == pytest.approx((1 + 4 + 9) / 3)


def test_make_bank_padding():
    b = make_bank(np.ones((10, 3)), {"v": np.ones(10)}, pad_to_multiple_of=8)
    assert b.n_total == 16
    assert float(b.mask.sum()) == 10
    assert b.values["v"].shape == (16, 1)


@pytest.mark.parametrize("mod", [
    plate_hole, wave_confined, wave_infinite, wave_semi_infinite
])
def test_loss_pad_invariance(mod):
    """Padding banks to shard-friendly sizes must not change the loss.

    f64 banks so the only possible difference is logic, not f32
    reduction-order noise from the changed summation shape.
    """
    c1 = mod.build(scale=SCALE, pad_to_multiple_of=1, dtype=np.float64)
    c8 = mod.build(scale=SCALE, pad_to_multiple_of=8, dtype=np.float64)
    params = c1.init_params(seed=7, dtype=jnp.float64)
    l1 = float(c1.loss_fn(c1.loss)(params))
    l8 = float(c8.loss_fn(c8.loss)(params))
    assert l1 == pytest.approx(l8, rel=1e-12)


def test_reference_weighting_plate_hole():
    """loss = 10·(f_uv + f_s + HOLE) exactly (train.py:217)."""
    case = plate_hole.build(scale=SCALE)
    params = case.init_params(seed=1)
    total, comps = case.loss.evaluate(
        case.model, params, case.material, case.banks
    )
    assert set(comps) == {"f_uv", "f_s", "HOLE"}
    expected = 10.0 * (comps["f_uv"] + comps["f_s"] + comps["HOLE"])
    assert float(total) == pytest.approx(float(expected), rel=1e-6)


def test_reference_weighting_waves():
    """Confined: 5·f_uv + 5·f_s + SRC + IC + FIX (:156); SemiInf:
    5·f_uv + 5·f_s + 2·(IC+SRC+NB) (:127); Infinite excludes NB (:119)."""
    c = wave_confined.build(scale=SCALE)
    p = c.init_params(seed=2)
    total, k = c.loss.evaluate(c.model, p, c.material, c.banks)
    assert float(total) == pytest.approx(float(
        5 * k["f_uv"] + 5 * k["f_s"] + k["SRC"] + k["IC"] + k["FIX"]
    ), rel=1e-6)

    c = wave_semi_infinite.build(scale=SCALE)
    p = c.init_params(seed=2)
    total, k = c.loss.evaluate(c.model, p, c.material, c.banks)
    assert float(total) == pytest.approx(float(
        5 * k["f_uv"] + 5 * k["f_s"] + 2 * (k["IC"] + k["SRC"] + k["NB"])
    ), rel=1e-6)

    c = wave_infinite.build(scale=SCALE)
    p = c.init_params(seed=2)
    total, k = c.loss.evaluate(c.model, p, c.material, c.banks)
    # NB computed but excluded from the total.
    assert "NB" in k and float(k["NB"]) > 0.0
    assert float(total) == pytest.approx(float(
        k["f_uv"] + k["f_s"] + k["IC"] + k["SRC"]
    ), rel=1e-6)


def test_pretraining_losses_plate_hole():
    """dist/part pretraining specs produce the right component names and are
    positive for a random init (train.py:194-215)."""
    case = plate_hole.build(scale=SCALE)
    params = case.init_params(seed=3)
    _, dcomp = plate_hole.dist_loss().evaluate(
        case.model, params, case.material, case.banks
    )
    assert set(dcomp) == {"DIST"} and float(dcomp["DIST"]) > 0
    _, pcomp = plate_hole.part_loss().evaluate(
        case.model, params, case.material, case.banks
    )
    assert set(pcomp) == {"PART"} and float(pcomp["PART"]) > 0


def test_dt_channel_targets():
    """FieldTarget 'dt:' channels hit the time derivative, not the value."""
    from pinn_elastodynamics_tpu.losses.terms import FieldTarget
    from pinn_elastodynamics_tpu.models.fields import (
        FieldSpec, MLPFieldModel, SECOND_ORDER,
    )
    import jax

    spec = FieldSpec(ndim=2, formulation=SECOND_ORDER)
    model = MLPFieldModel(spec=spec, hidden=(8,))
    params = model.init(jax.random.PRNGKey(0), jnp.float64)
    bank = make_bank(np.random.default_rng(0).uniform(size=(20, 3)))
    term = FieldTarget(name="X", channels=("dt:u",))
    (val,) = term.evaluate(model, params, None, bank).values()
    jet = model.jet(params, bank.xyt, order=1)
    expected = masked_mean_square(jet.dt[:, 0], bank.mask)
    assert float(val) == pytest.approx(float(expected), rel=1e-12)
