"""Manufactured-solution oracle for 3D elastodynamics (VERDICT r2 missing #4).

A plane P-wave solves the homogeneous 3D equations exactly, so the
analytically constructed jet must zero every residual in residuals_3d — and
any perturbation must not.  This makes the 3D residual operator falsifiable
without FEM data (cf. the 2D manufactured-polynomial tests in
tests/test_residuals.py).
"""

import numpy as np
import pytest

from pinn_elastodynamics_tpu.cases import elastic3d
from pinn_elastodynamics_tpu.models.fields import FieldSpec, FIRST_ORDER
from pinn_elastodynamics_tpu.ops.elasticity import ISOTROPIC_3D
from pinn_elastodynamics_tpu.ops.jet import Jet
from pinn_elastodynamics_tpu.ops.residuals import residuals

SPEC = FieldSpec(ndim=3, formulation=FIRST_ORDER)


def _points(n=512, seed=3):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-1.0, 1.0, size=(n, 3))
    t = rng.uniform(0.0, 2.0, size=(n, 1))
    return np.concatenate([xyz, t], axis=1)


def test_plane_wave_zeros_every_residual():
    pts = _points()
    jet = elastic3d.mms_jet(pts, elastic3d.MMS_MATERIAL)
    res = residuals(jet, SPEC, elastic3d.MMS_MATERIAL, ISOTROPIC_3D)
    assert set(res) == {
        "f_u", "f_v", "f_w", "f_ut", "f_vt", "f_wt",
        "f_s11", "f_s22", "f_s33", "f_s12", "f_s13", "f_s23",
    }
    for name, r in res.items():
        assert float(np.max(np.abs(np.asarray(r)))) < 1e-4, name


def test_perturbed_wave_is_detected():
    pts = _points(256)
    jet = elastic3d.mms_jet(pts, elastic3d.MMS_MATERIAL)
    bad = Jet(f=jet.f * 1.02, d=jet.d, dtt=None)  # 2% field perturbation
    res = residuals(bad, SPEC, elastic3d.MMS_MATERIAL, ISOTROPIC_3D)
    worst = max(float(np.max(np.abs(np.asarray(r)))) for r in res.values())
    assert worst > 1e-3


def test_wrong_wave_speed_breaks_momentum_only():
    # A wave propagating at the wrong speed satisfies the constitutive law
    # (stresses are still derived from the strains) but not momentum.
    pts = _points(256)
    mat_wrong = elastic3d.Material(E=2.5, mu=0.25, rho=2.0)
    jet = elastic3d.mms_jet(pts, elastic3d.MMS_MATERIAL)
    res = residuals(jet, SPEC, mat_wrong, ISOTROPIC_3D)
    for name in ("f_s11", "f_s22", "f_s33", "f_s12", "f_s13", "f_s23",
                 "f_ut", "f_vt", "f_wt"):
        assert float(np.max(np.abs(np.asarray(res[name])))) < 1e-4, name
    assert max(
        float(np.max(np.abs(np.asarray(res[n])))) for n in ("f_u", "f_v", "f_w")
    ) > 1e-2


def test_mms_fields_match_jet_values():
    pts = _points(128)
    fields = elastic3d.mms_fields(pts, elastic3d.MMS_MATERIAL)
    jet = elastic3d.mms_jet(pts, elastic3d.MMS_MATERIAL)
    for c in SPEC.channels:
        np.testing.assert_allclose(
            np.asarray(jet.f[:, SPEC.index(c)]), fields[c], atol=1e-6
        )


def test_mms_case_trains_toward_truth():
    case = elastic3d.build_mms(scale=0.02, pad_to_multiple_of=8)
    params = case.init_params(seed=0)
    from pinn_elastodynamics_tpu.cases.base import run_pipeline

    f0 = float(case.loss_fn(case.loss)(params))
    params, results = run_pipeline(case, params,
                                   maxiter_override={"uv": 60}, segment=30)
    f1 = float(results["uv"].final_loss)
    assert f1 < 0.5 * f0
    errs = elastic3d.mms_errors(case.model, params, n=2000)
    assert all(np.isfinite(v) for v in errs.values())
