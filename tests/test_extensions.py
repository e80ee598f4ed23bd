"""Extension configs: 3D elastodynamics and the inverse problem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_elastodynamics_tpu.banks import make_bank
from pinn_elastodynamics_tpu.cases import elastic3d, inverse
from pinn_elastodynamics_tpu.cases.base import run_pipeline
from pinn_elastodynamics_tpu.models.fields import FieldSpec, SECOND_ORDER
from pinn_elastodynamics_tpu.ops.elasticity import (
    Material, PLANE_STRESS, plane_stress_stress,
)
from pinn_elastodynamics_tpu.ops.jet import Jet
from pinn_elastodynamics_tpu.train.lbfgs import minimize


def test_3d_case_builds_and_trains():
    case = elastic3d.build(scale=0.0005)
    banks = case.banks
    col = np.asarray(banks["collocation"].xyt)
    assert col.shape[1] == 4
    m = np.asarray(banks["collocation"].mask) > 0
    assert (np.linalg.norm(col[m, :3], axis=1) > 2.0).all()
    src = np.asarray(banks["src"].xyt)
    sm = np.asarray(banks["src"].mask) > 0
    np.testing.assert_allclose(
        np.linalg.norm(src[sm, :3], axis=1), 2.0, atol=1e-9
    )
    params = case.init_params(seed=0)
    loss0 = float(case.loss_fn(case.loss)(params))
    params, results = run_pipeline(case, params, maxiter_override={"uv": 10})
    assert float(case.loss_fn(case.loss)(params)) < loss0


class _AnalyticPlaneStressModel:
    """Analytic manufactured field whose stresses satisfy the constitutive
    law at E_true exactly — lets the inverse machinery be tested without
    training a network: the f_s residual as a function of E has its zero at
    E_true, and the momentum residual pins rho."""

    E_TRUE = 20.0
    RHO_TRUE = 1.3
    MU = 0.25

    spec = FieldSpec(ndim=2, formulation=SECOND_ORDER)

    def init(self, key, dtype=jnp.float64):
        return {}

    def apply(self, params, xyt):
        return self.jet(params, xyt).f

    def jet(self, params, xyt, order=None):
        mat = Material(E=self.E_TRUE, mu=self.MU, rho=self.RHO_TRUE)
        x, y, t = xyt[:, 0], xyt[:, 1], xyt[:, 2]
        u = x**2 + y * t**2
        v = x * y * t
        e11, e22, e12 = 2 * x, x * t, t**2 + y * t
        s11, s22, s12 = plane_stress_stress(mat, e11, e22, e12)
        zeros = jnp.zeros_like(x)
        du = (2 * x, t**2, 2 * y * t)
        dv = (y * t, x * t, x * y)
        de11 = (2 + zeros, zeros, zeros)
        de22 = (t, zeros, x)
        de12 = (zeros, t, 2 * t + y)
        ds = [plane_stress_stress(mat, de11[i], de22[i], de12[i])
              for i in range(3)]
        # Choose body-force-free dynamics: the *true* momentum residual is
        # zero when rho = RHO_TRUE only if s11_x + s12_y == rho·u_tt; here we
        # instead test that the E-recovery works through f_s and check rho
        # gradients flow.
        f = jnp.stack([u, v, s11, s22, s12], axis=1)
        d = jnp.stack(
            [jnp.stack([du[i], dv[i], ds[i][0], ds[i][1], ds[i][2]], axis=1)
             for i in range(3)], axis=0,
        )
        dtt = jnp.stack([2 * y, zeros, zeros, zeros, zeros], axis=1)
        return Jet(f=f, d=d, dtt=dtt)


def test_inverse_recovers_youngs_modulus():
    """With fields fixed at a manufactured solution, minimizing the
    constitutive residual over log E recovers E_true."""
    model = _AnalyticPlaneStressModel()
    prob = inverse.InverseProblem(
        name="analytic",
        model=model,
        plane=PLANE_STRESS,
        mu=model.MU,
        E_init=5.0,
        rho_init=1.0,
        weights=(("f_s", 1.0),),
    )
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.2, 1.0, (500, 3))
    banks = {
        "collocation": make_bank(pts, dtype=jnp.float64),
        "sensors": make_bank(
            pts[:50],
            {"uv": np.asarray(model.jet({}, jnp.asarray(pts[:50]))
                              .f[:, :2])},
            dtype=jnp.float64,
        ),
    }
    params = prob.init_params(seed=0, dtype=jnp.float64)

    # Only material params are trainable here (net is analytic/empty).
    def loss(mp):
        return prob.loss_fn(banks)({**params, **mp})

    res = minimize(
        loss,
        {"log_E": params["log_E"], "log_rho": params["log_rho"]},
        maxiter=200,
    )
    E_rec = float(jnp.exp(res.params["log_E"]))
    assert E_rec == pytest.approx(model.E_TRUE, rel=1e-4)


def test_inverse_build_with_fem_sensors():
    prob, banks = inverse.build(scale=0.001, n_sensor_frames=3,
                                sensors_per_frame=20)
    assert set(banks) == {"collocation", "sensors"}
    params = prob.init_params(seed=0)
    total, comps = prob.loss_and_aux(params, banks)
    assert np.isfinite(float(total))
    assert {"f_uv", "f_s", "DATA", "E", "rho"} <= set(comps)
    assert float(comps["E"]) == pytest.approx(1.0, rel=1e-5)
    # Material gradients flow.
    g = jax.grad(prob.loss_fn(banks))(params)
    assert abs(float(g["log_E"])) > 0
    assert abs(float(g["log_rho"])) >= 0


def test_inverse_accel_supervision():
    """accel_weight adds FD-acceleration sensors (DATA_TT) — the
    ρ-identifying observable (f64 probe verdict, docs/STATUS_r4.md)."""
    import jax

    prob, banks = inverse.build(scale=0.02, pad_to_multiple_of=8,
                                n_sensor_frames=3, sensors_per_frame=30,
                                accel_weight=2.0)
    assert "att" in banks["sensors"].values
    att = np.asarray(banks["sensors"].values["att"])
    assert att.shape[1] == 2 and np.isfinite(att).all()
    # FD accelerations carry real signal (the wave is live at some sensors)
    assert np.abs(att).max() > 1e-3
    assert dict(prob.weights)["DATA_TT"] == 2.0
    params = prob.init_params(seed=0)
    total, comps = prob.loss_and_aux(params, banks)
    assert np.isfinite(float(comps["DATA_TT"])) and float(comps["DATA_TT"]) > 0
    g = jax.grad(lambda p: prob.loss_and_aux(p, banks)[0])(params)
    assert np.isfinite(float(g["log_rho"]))
    # without the flag the objective is unchanged (no att bank, no term)
    prob0, banks0 = inverse.build(scale=0.02, pad_to_multiple_of=8,
                                  n_sensor_frames=3, sensors_per_frame=30)
    assert "att" not in banks0["sensors"].values
    assert "DATA_TT" not in dict(prob0.weights)
