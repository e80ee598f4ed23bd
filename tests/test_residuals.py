"""PDE residual correctness: manufactured solutions + autodiff cross-checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_elastodynamics_tpu.models.fields import (
    FieldSpec,
    FIRST_ORDER,
    MLPFieldModel,
    SECOND_ORDER,
)
from pinn_elastodynamics_tpu.ops import residuals as res_ops
from pinn_elastodynamics_tpu.ops import traction as trac_ops
from pinn_elastodynamics_tpu.ops.elasticity import (
    Material,
    PLANE_STRAIN,
    PLANE_STRESS,
    plane_strain_stress,
    plane_stress_stress,
)
from pinn_elastodynamics_tpu.ops.jet import Jet

MAT = Material(E=20.0, mu=0.25, rho=1.3)


def _manufactured_jet(xyt, plane):
    """Polynomial displacement field with stresses defined exactly by the
    constitutive law, so constitutive residuals vanish identically and the
    momentum residuals have closed forms.

      u = x² + y·t²,  v = x·y·t
      e11 = 2x, e22 = x·t, e12 = t² + y·t
    """
    x, y, t = xyt[:, 0], xyt[:, 1], xyt[:, 2]
    u = x**2 + y * t**2
    v = x * y * t
    e11, e22, e12 = 2 * x, x * t, t**2 + y * t
    fn = plane_stress_stress if plane == PLANE_STRESS else plane_strain_stress
    s11, s22, s12 = fn(MAT, e11, e22, e12)

    zeros = jnp.zeros_like(x)
    # First derivatives of every channel w.r.t. (x, y, t).
    du = (2 * x, t**2, 2 * y * t)
    dv = (y * t, x * t, x * y)
    de11 = (2 + zeros, zeros, zeros)
    de22 = (t, zeros, x)
    de12 = (zeros, t, 2 * t + y)

    def dstress(i):
        return fn(MAT, de11[i], de22[i], de12[i])

    ds = [dstress(i) for i in range(3)]  # [(s11_x, s22_x, s12_x), ...]
    u_tt = 2 * y
    v_tt = zeros

    f = jnp.stack([u, v, s11, s22, s12], axis=1)
    d = jnp.stack(
        [jnp.stack([du[i], dv[i], ds[i][0], ds[i][1], ds[i][2]], axis=1)
         for i in range(3)],
        axis=0,
    )
    dtt = jnp.stack([u_tt, v_tt, zeros, zeros, zeros], axis=1)
    jet = Jet(f=f, d=d, dtt=dtt)

    # Expected momentum residuals (plane_strain_stress handles constants).
    f_u = ds[0][0] + ds[1][2] - MAT.rho * u_tt  # s11_x + s12_y - rho u_tt
    f_v = ds[1][1] + ds[0][2] - MAT.rho * v_tt  # s22_y + s12_x - rho v_tt
    return jet, f_u, f_v


@pytest.mark.parametrize("plane", [PLANE_STRESS, PLANE_STRAIN])
def test_manufactured_solution_2d(plane):
    xyt = jax.random.uniform(jax.random.PRNGKey(0), (50, 3), jnp.float64)
    spec = FieldSpec(ndim=2, formulation=SECOND_ORDER)
    jet, f_u, f_v = _manufactured_jet(xyt, plane)
    res = res_ops.residuals(jet, spec, MAT, plane)
    # Stresses were constructed from the constitutive law → zero residual.
    for k in ("f_s11", "f_s22", "f_s12"):
        np.testing.assert_allclose(res[k], 0.0, atol=1e-12)
    np.testing.assert_allclose(res["f_u"], f_u, atol=1e-12)
    np.testing.assert_allclose(res["f_v"], f_v, atol=1e-12)


@pytest.mark.parametrize("plane", [PLANE_STRESS, PLANE_STRAIN])
def test_residuals_match_nested_autodiff(plane):
    """Residuals from the fused jet == residuals computed the reference way
    (nested per-point autodiff, train.py:404-439)."""
    spec = FieldSpec(ndim=2, formulation=SECOND_ORDER)
    model = MLPFieldModel(spec=spec, hidden=(16, 16))
    params = model.init(jax.random.PRNGKey(1), jnp.float64)
    xyt = jax.random.uniform(jax.random.PRNGKey(2), (7, 3), jnp.float64)

    res = res_ops.residuals(model.jet(params, xyt), spec, MAT, plane)

    f_single = lambda p: model.apply(params, p[None])[0]
    jac = jax.vmap(jax.jacfwd(f_single))(xyt)       # (N, 5, 3)
    hess = jax.vmap(jax.hessian(f_single))(xyt)     # (N, 5, 3, 3)
    u, v, s11, s22, s12 = [model.apply(params, xyt)[:, i] for i in range(5)]
    e11, e22 = jac[:, 0, 0], jac[:, 1, 1]
    e12 = jac[:, 0, 1] + jac[:, 1, 0]
    fn = plane_stress_stress if plane == PLANE_STRESS else plane_strain_stress
    sp11, sp22, sp12 = fn(MAT, e11, e22, e12)
    np.testing.assert_allclose(res["f_s11"], s11 - sp11, atol=1e-12)
    np.testing.assert_allclose(res["f_s22"], s22 - sp22, atol=1e-12)
    np.testing.assert_allclose(res["f_s12"], s12 - sp12, atol=1e-12)
    f_u = jac[:, 2, 0] + jac[:, 4, 1] - MAT.rho * hess[:, 0, 2, 2]
    f_v = jac[:, 3, 1] + jac[:, 4, 0] - MAT.rho * hess[:, 1, 2, 2]
    np.testing.assert_allclose(res["f_u"], f_u, atol=1e-11)
    np.testing.assert_allclose(res["f_v"], f_v, atol=1e-11)


def test_first_order_formulation_consistency():
    """7-output first-order residuals match the reference's definition
    (ElasticWaveConfined/ElasticWave.py:304-348): u_tt := d(ut)/dt and
    velocity-definition residuals f_ut = u_t − ut."""
    spec = FieldSpec(ndim=2, formulation=FIRST_ORDER)
    model = MLPFieldModel(spec=spec, hidden=(16, 16))
    params = model.init(jax.random.PRNGKey(3), jnp.float64)
    xyt = jax.random.uniform(jax.random.PRNGKey(4), (7, 3), jnp.float64)

    jet = model.jet(params, xyt)
    res = res_ops.residuals(jet, spec, MAT, PLANE_STRAIN)
    assert set(res) == {
        "f_u", "f_v", "f_ut", "f_vt", "f_s11", "f_s22", "f_s12"
    }
    f_single = lambda p: model.apply(params, p[None])[0]
    jac = jax.vmap(jax.jacfwd(f_single))(xyt)  # (N, 7, 3)
    fields = model.apply(params, xyt)
    np.testing.assert_allclose(
        res["f_ut"], jac[:, 0, 2] - fields[:, 2], atol=1e-12
    )
    np.testing.assert_allclose(
        res["f_vt"], jac[:, 1, 2] - fields[:, 3], atol=1e-12
    )
    # momentum with u_tt = d(ut)/dt
    f_u = jac[:, 4, 0] + jac[:, 6, 1] - MAT.rho * jac[:, 2, 2]
    np.testing.assert_allclose(res["f_u"], f_u, atol=1e-12)


def test_3d_residuals_shapes_and_autodiff():
    spec = FieldSpec(ndim=3, formulation=FIRST_ORDER)
    model = MLPFieldModel(spec=spec, hidden=(12, 12))
    params = model.init(jax.random.PRNGKey(5), jnp.float64)
    xyzt = jax.random.uniform(jax.random.PRNGKey(6), (5, 4), jnp.float64)
    res = res_ops.residuals(model.jet(params, xyzt), spec, MAT, "isotropic_3d")
    assert set(res) == {
        "f_u", "f_v", "f_w", "f_ut", "f_vt", "f_wt",
        "f_s11", "f_s22", "f_s33", "f_s12", "f_s13", "f_s23",
    }
    f_single = lambda p: model.apply(params, p[None])[0]
    jac = jax.vmap(jax.jacfwd(f_single))(xyzt)
    idx = {n: i for i, n in enumerate(spec.channels)}
    f_u = (jac[:, idx["s11"], 0] + jac[:, idx["s12"], 1]
           + jac[:, idx["s13"], 2] - MAT.rho * jac[:, idx["ut"], 3])
    np.testing.assert_allclose(res["f_u"], f_u, atol=1e-12)


def test_traction_circle_normals():
    """Hole traction convention n = (−x/r, −y/r) (train.py:452-461)."""
    theta = np.linspace(0, np.pi / 2, 10)
    x, y = 0.1 * np.cos(theta), 0.1 * np.sin(theta)
    nx, ny = trac_ops.circle_normals(x, y, r=0.1)
    np.testing.assert_allclose(nx, -np.cos(theta), atol=1e-12)
    np.testing.assert_allclose(ny, -np.sin(theta), atol=1e-12)

    spec = FieldSpec(ndim=2, formulation=SECOND_ORDER)
    fields = jnp.asarray(np.random.default_rng(0).normal(size=(10, 5)))
    tx, ty = trac_ops.traction_2d(fields, spec, jnp.asarray(nx), jnp.asarray(ny))
    s11, s22, s12 = fields[:, 2], fields[:, 3], fields[:, 4]
    np.testing.assert_allclose(tx, s11 * nx + s12 * ny, atol=1e-12)
    np.testing.assert_allclose(ty, s12 * nx + s22 * ny, atol=1e-12)
