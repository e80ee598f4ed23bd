"""Case builders: bank geometry, config matrix parity, pipeline smoke."""

import jax.numpy as jnp
import numpy as np
import pytest

from pinn_elastodynamics_tpu.cases import (
    plate_hole,
    wave_confined,
    wave_infinite,
    wave_semi_infinite,
)
from pinn_elastodynamics_tpu.cases.base import run_pipeline
from pinn_elastodynamics_tpu.models.fields import FIRST_ORDER, SECOND_ORDER

SCALE = 0.002


def test_config_matrix_parity():
    """The §2.2 case matrix: formulations, widths, normalization, domains."""
    ph = plate_hole.build_model()
    assert ph.spec.formulation == SECOND_ORDER
    assert ph.uv_hidden == (70,) * 8
    assert ph.dist_hidden == (20,) * 4 and ph.part_hidden == (20,) * 4

    wc = wave_confined.build_model()
    assert wc.spec.formulation == FIRST_ORDER
    assert wc.hidden == (140,) * 6 and not wc.normalize

    wi = wave_infinite.build_model()
    assert wi.hidden == (80,) * 8 and wi.normalize
    assert wi.lb == (0.0, 0.0, 0.0) and wi.ub == (30.0, 30.0, 20.0)

    ws = wave_semi_infinite.build_model()
    assert ws.hidden == (100,) * 8 and not ws.normalize


def test_material_parity():
    assert plate_hole.build(scale=SCALE).material.E == 20.0
    for mod in (wave_confined, wave_infinite, wave_semi_infinite):
        c = mod.build(scale=SCALE)
        assert c.material.E == 2.5 and c.material.mu == 0.25


def test_plate_hole_banks_geometry():
    case = plate_hole.build(scale=0.01)
    b = case.banks
    # Collocation avoids the hole (boundary folds may sit at r = 0.1).
    col = np.asarray(b["collocation"].xyt)
    m = np.asarray(b["collocation"].mask) > 0
    d = np.sqrt(col[m, 0] ** 2 + col[m, 1] ** 2)
    assert (d >= 0.1 - 1e-9).all()
    # Hole bank sits on the r=0.1 arc with inward unit normals.
    hole = np.asarray(b["hole"].xyt)
    hm = np.asarray(b["hole"].mask) > 0
    r = np.sqrt(hole[hm, 0] ** 2 + hole[hm, 1] ** 2)
    np.testing.assert_allclose(r, 0.1, atol=1e-9)
    nrm = np.asarray(b["hole"].values["normals"])[hm]
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-6)
    # IC at t=0; RT on x=0.5 with the cyclic load attached.
    ic = np.asarray(b["ic"].xyt)
    icm = np.asarray(b["ic"].mask) > 0
    np.testing.assert_allclose(ic[icm, 2], 0.0, atol=1e-12)
    rt = np.asarray(b["rt"].xyt)
    rtm = np.asarray(b["rt"].mask) > 0
    np.testing.assert_allclose(rt[rtm, 0], 0.5, atol=1e-12)
    s11 = np.asarray(b["rt"].values["s11"])[rtm, 0]
    from pinn_elastodynamics_tpu.geometry.sources import cyclic_tension
    np.testing.assert_allclose(s11, cyclic_tension(rt[rtm, 2]), atol=1e-6)


def test_wave_confined_banks_geometry():
    case = wave_confined.build(scale=SCALE)
    b = case.banks
    fx = np.asarray(b["fixed"].xyt)
    fm = np.asarray(b["fixed"].mask) > 0
    on_edge = (
        (np.abs(fx[fm, 0]) == 15.0) | (np.abs(fx[fm, 1]) == 15.0)
    )
    assert on_edge.all()
    src = np.asarray(b["src"].xyt)
    sm = np.asarray(b["src"].mask) > 0
    r = np.sqrt(src[sm, 0] ** 2 + src[sm, 1] ** 2)
    np.testing.assert_allclose(r, 2.0, atol=1e-9)
    col = np.asarray(b["collocation"].xyt)
    cm = np.asarray(b["collocation"].mask) > 0
    d = np.sqrt(col[cm, 0] ** 2 + col[cm, 1] ** 2)
    assert (d > 2.0).all()


def test_semi_infinite_free_surface():
    case = wave_semi_infinite.build(scale=SCALE)
    up = np.asarray(case.banks["up"].xyt)
    um = np.asarray(case.banks["up"].mask) > 0
    np.testing.assert_allclose(up[um, 1], 15.0)


def test_frame_time_mapping():
    case = plate_hole.build(scale=SCALE)
    assert case.n_frames == 81
    assert case.frame_time(20) == pytest.approx(2.5)
    wc = wave_confined.build(scale=SCALE)
    assert wc.n_frames == 57
    assert wc.frame_time(12) == pytest.approx(3.0)


@pytest.mark.parametrize("mod,phase_names", [
    (plate_hole, ("dist", "part", "uv")),
    (wave_confined, ("uv",)),
])
def test_pipeline_smoke_reduces_loss(mod, phase_names):
    case = mod.build(scale=SCALE)
    assert tuple(p.name for p in case.phases) == phase_names
    params = case.init_params(seed=0)
    loss0 = float(case.loss_fn(case.loss)(params))
    params, results = run_pipeline(
        case, params, maxiter_override={n: 15 for n in phase_names}
    )
    loss1 = float(case.loss_fn(case.loss)(params))
    assert loss1 < loss0
    for n in phase_names:
        assert np.isfinite(float(results[n].final_loss))


def test_components_named_like_reference():
    case = plate_hole.build(scale=SCALE)
    comps = case.components(case.init_params(seed=0))
    assert set(comps) == {"f_uv", "f_s", "HOLE"}
