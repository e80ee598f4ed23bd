"""Exact analytic hard-BC composite (models/analytic_bc.py).

The closed-form D/P factors must (a) vanish exactly on the constrained
sets — the property the reference only approximates with regressed nets
(train.py:322-356) — and (b) produce a composite whose jet equals nested
autodiff, so the residual ops see correct derivatives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_elastodynamics_tpu.cases import plate_hole


def _rand_xyt(key, n=150):
    u = jax.random.uniform(key, (n, 3), jnp.float32)
    return u * jnp.asarray([0.5, 0.5, 10.0])


def test_analytic_dist_zero_sets_and_velocity_ic():
    n = 64
    rng = np.random.default_rng(0)
    xs = rng.uniform(0, 0.5, n).astype(np.float32)
    ys = rng.uniform(0, 0.5, n).astype(np.float32)
    ts = rng.uniform(0, 10, n).astype(np.float32)
    D = jax.vmap(plate_hole.analytic_dist)

    # u on x=0; v on y=0; s11 on x=.5; s22 on y=.5; every channel at t=0.
    assert np.allclose(D(np.stack([0 * xs, ys, ts], 1))[:, 0], 0.0)
    assert np.allclose(D(np.stack([xs, 0 * ys, ts], 1))[:, 1], 0.0)
    assert np.allclose(D(np.stack([0 * xs + 0.5, ys, ts], 1))[:, 2], 0.0)
    assert np.allclose(D(np.stack([xs, 0 * ys + 0.5, ts], 1))[:, 3], 0.0)
    at0 = D(np.stack([xs, ys, 0 * ts], 1))
    assert np.allclose(at0, 0.0)
    # s12 on all four edges.
    for pts in (np.stack([0 * xs, ys, ts], 1),
                np.stack([0 * xs + 0.5, ys, ts], 1),
                np.stack([xs, 0 * ys, ts], 1),
                np.stack([xs, 0 * ys + 0.5, ts], 1)):
        assert np.allclose(D(pts)[:, 4], 0.0)
    # Zero-velocity IC: dD/dt(t=0) = 0 for u and v (exact, not penalized).
    dDdt = jax.vmap(jax.jacfwd(plate_hole.analytic_dist))
    g = dDdt(np.stack([xs, ys, 0 * ts], 1).astype(np.float32))
    assert np.allclose(g[:, 0, 2], 0.0)
    assert np.allclose(g[:, 1, 2], 0.0)
    # Interior positivity (u channel away from its constraint sets).
    mid = D(np.asarray([[0.25, 0.25, 5.0]], np.float32))
    assert float(mid[0, 0]) > 0.05


def test_analytic_composite_bcs_exact_for_random_uv():
    """With an UNTRAINED uv net the composite already satisfies every hard
    IC/BC — the property that motivates the analytic variant."""
    model = plate_hole.build_model(jet_impl="xla", bc="analytic")
    params = model.init(jax.random.PRNGKey(7))
    n = 80
    rng = np.random.default_rng(1)
    ys = rng.uniform(0, 0.5, n).astype(np.float32)
    ts = rng.uniform(0, 10, n).astype(np.float32)

    lf = np.stack([0 * ys, ys, ts], 1)                 # x=0: u = 0
    u_lf = np.asarray(model.apply(params, lf))[:, 0]
    assert np.allclose(u_lf, 0.0, atol=1e-7)

    lw = np.stack([ys, 0 * ys, ts], 1)                 # y=0: v = 0
    v_lw = np.asarray(model.apply(params, lw))[:, 1]
    assert np.allclose(v_lw, 0.0, atol=1e-7)

    rt = np.stack([0 * ys + 0.5, ys, ts], 1)           # x=.5: s11 = load(t)
    s11_rt = np.asarray(model.apply(params, rt))[:, 2]
    from pinn_elastodynamics_tpu.geometry.sources import cyclic_tension

    np.testing.assert_allclose(s11_rt, cyclic_tension(ts), atol=1e-5)

    ic = np.stack([ys, ys[::-1], 0 * ts], 1)           # t=0: all fields 0
    f_ic = np.asarray(model.apply(params, ic))
    assert np.allclose(f_ic, 0.0, atol=1e-6)
    # t=0 velocity: du/dt = dv/dt = 0 through the composite.
    jet = model.jet(params, jnp.asarray(ic), order=1)
    assert np.allclose(np.asarray(jet.dt[:, 0]), 0.0, atol=1e-6)
    assert np.allclose(np.asarray(jet.dt[:, 1]), 0.0, atol=1e-6)


@pytest.mark.parametrize("order", [1, 2])
def test_analytic_composite_jet_matches_autodiff(order):
    model = plate_hole.build_model(jet_impl="xla", bc="analytic")
    params = model.init(jax.random.PRNGKey(3))
    x = _rand_xyt(jax.random.PRNGKey(4))
    jet = model.jet(params, x, order=order)

    f_ref = jax.vmap(lambda p: model.apply(params, p[None, :])[0])(x)
    np.testing.assert_allclose(np.asarray(jet.f), np.asarray(f_ref),
                               rtol=2e-5, atol=2e-6)
    J = jax.vmap(jax.jacfwd(lambda p: model.apply(params, p[None, :])[0]))(x)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(jet.d[i]),
                                   np.asarray(J[:, :, i]),
                                   rtol=2e-4, atol=2e-5)
    if order >= 2:
        H = jax.vmap(jax.jacfwd(jax.jacfwd(
            lambda p: model.apply(params, p[None, :])[0])))(x)
        np.testing.assert_allclose(np.asarray(jet.dtt),
                                   np.asarray(H[:, :, 2, 2]),
                                   rtol=2e-3, atol=2e-4)


def test_analytic_case_trains_single_phase():
    case = plate_hole.build(scale=0.02, pad_to_multiple_of=8,
                            jet_impl="xla", bc="analytic")
    assert tuple(p.name for p in case.phases) == ("uv",)
    params = case.init_params(seed=0)
    from pinn_elastodynamics_tpu.cases.base import _phase_loss_fn
    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    fn, sub, merge = _phase_loss_fn(case, case.phases[0], params)
    f0 = float(fn(sub))
    res = minimize(fn, sub, maxiter=40, segment=20, patience=100)
    assert float(res.final_loss) < 0.7 * f0


# ---------------------------------------------------------------------------
# Confined wave: hard edge/IC enforcement (cases/wave_confined.py bc="hard")
# ---------------------------------------------------------------------------

def test_confined_hard_bc_zero_sets_and_equivalence():
    from pinn_elastodynamics_tpu.cases import wave_confined as wc

    model = wc.build_model(jet_impl="xla", bc="hard")
    params = model.init(jax.random.PRNGKey(5))
    n = 60
    rng = np.random.default_rng(3)
    ys = rng.uniform(-15, 15, n).astype(np.float32)
    ts = rng.uniform(0, 14, n).astype(np.float32)

    # u, v, ut, vt vanish on all four edges for a RANDOM net.
    for pts in (np.stack([0 * ys - 15, ys, ts], 1),
                np.stack([0 * ys + 15, ys, ts], 1),
                np.stack([ys, 0 * ys - 15, ts], 1),
                np.stack([ys, 0 * ys + 15, ts], 1)):
        f = np.asarray(model.apply(params, pts))
        assert np.allclose(f[:, :4], 0.0, atol=1e-6)

    # Every channel zero at t=0; du/dt = dv/dt = 0 at t=0.
    ic = np.stack([ys, ys[::-1], 0 * ts], 1)
    assert np.allclose(np.asarray(model.apply(params, ic)), 0.0, atol=1e-6)
    jet = model.jet(params, jnp.asarray(ic), order=1)
    assert np.allclose(np.asarray(jet.dt[:, :2]), 0.0, atol=1e-6)

    # Soft-spec loss of the hard model == hard-spec loss (IC/FIX terms are
    # exactly zero), so the convergence bars stay comparable.
    case_h = wc.build(scale=0.003, pad_to_multiple_of=8, jet_impl="xla",
                      bc="hard")
    p = case_h.init_params(seed=0)
    soft = wc.main_loss("soft")
    hard = wc.main_loss("hard")
    lh, _ = hard.evaluate(case_h.model, p, case_h.material, case_h.banks)
    ls, comps = soft.evaluate(case_h.model, p, case_h.material, case_h.banks)
    assert float(comps["IC"]) < 1e-10
    assert float(comps["FIX"]) < 1e-10
    np.testing.assert_allclose(float(lh), float(ls), rtol=1e-6)


def test_confined_hard_jet_matches_autodiff():
    from pinn_elastodynamics_tpu.cases import wave_confined as wc

    model = wc.build_model(jet_impl="xla", bc="hard")
    params = model.init(jax.random.PRNGKey(9))
    u = jax.random.uniform(jax.random.PRNGKey(10), (100, 3), jnp.float32)
    x = u * jnp.asarray([30.0, 30.0, 14.0]) - jnp.asarray([15.0, 15.0, 0.0])
    jet = model.jet(params, x, order=1)
    J = jax.vmap(jax.jacfwd(lambda p: model.apply(params, p[None, :])[0]))(x)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(jet.d[i]),
                                   np.asarray(J[:, :, i]),
                                   rtol=2e-4, atol=2e-5)


def test_confined_hard_case_trains():
    from pinn_elastodynamics_tpu.cases import wave_confined as wc
    from pinn_elastodynamics_tpu.cases.base import _phase_loss_fn
    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    case = wc.build(scale=0.003, pad_to_multiple_of=8, jet_impl="xla",
                    bc="hard")
    params = case.init_params(seed=0)
    fn, sub, merge = _phase_loss_fn(case, case.phases[0], params)
    f0 = float(fn(sub))
    res = minimize(fn, sub, maxiter=40, segment=20, patience=100)
    assert float(res.final_loss) < 0.8 * f0


# ---------------------------------------------------------------------------
# Semi-infinite wave: hard IC + free-surface enforcement (bc="hard")
# ---------------------------------------------------------------------------

def test_semi_hard_bc_zero_sets_and_equivalence():
    from pinn_elastodynamics_tpu.cases import wave_semi_infinite as ws

    model = ws.build_model(jet_impl="xla", bc="hard")
    params = model.init(jax.random.PRNGKey(6))
    n = 60
    rng = np.random.default_rng(4)
    xs = rng.uniform(-15, 15, n).astype(np.float32)
    ts = rng.uniform(0, 16, n).astype(np.float32)

    # Free surface y=15: s22 = s12 = 0 for a RANDOM net.
    up = np.stack([xs, 0 * xs + 15.0, ts], 1)
    f_up = np.asarray(model.apply(params, up))
    assert np.allclose(f_up[:, 5:7], 0.0, atol=1e-6)

    # Every channel zero at t=0; du/dt = dv/dt = 0 at t=0.
    ic = np.stack([xs, xs[::-1], 0 * ts], 1)
    assert np.allclose(np.asarray(model.apply(params, ic)), 0.0, atol=1e-6)
    jet = model.jet(params, jnp.asarray(ic), order=1)
    assert np.allclose(np.asarray(jet.dt[:, :2]), 0.0, atol=1e-6)

    # Soft-spec loss of the hard model: IC and NB exactly zero.
    case_h = ws.build(scale=0.003, pad_to_multiple_of=8, jet_impl="xla",
                      bc="hard")
    p = case_h.init_params(seed=0)
    soft = ws.main_loss("soft")
    hard = ws.main_loss("hard")
    lh, _ = hard.evaluate(case_h.model, p, case_h.material, case_h.banks)
    ls, comps = soft.evaluate(case_h.model, p, case_h.material, case_h.banks)
    assert float(comps["IC"]) < 1e-10
    assert float(comps["NB"]) < 1e-10
    np.testing.assert_allclose(float(lh), float(ls), rtol=1e-6)


def test_semi_hard_case_trains():
    from pinn_elastodynamics_tpu.cases import wave_semi_infinite as ws
    from pinn_elastodynamics_tpu.cases.base import _phase_loss_fn
    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    case = ws.build(scale=0.003, pad_to_multiple_of=8, jet_impl="xla",
                    bc="hard")
    params = case.init_params(seed=0)
    fn, sub, merge = _phase_loss_fn(case, case.phases[0], params)
    f0 = float(fn(sub))
    res = minimize(fn, sub, maxiter=40, segment=20, patience=100)
    assert float(res.final_loss) < 0.8 * f0
