"""Visualization smoke tests (Agg backend, tiny inputs)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pinn_elastodynamics_tpu.cases import plate_hole
from pinn_elastodynamics_tpu.eval import plots
from pinn_elastodynamics_tpu.train.checkpoint import load_reference_pickle

REF = "/root/reference/PlateHoleQuarter/train"


@pytest.fixture(scope="module")
def case_and_params():
    case = plate_hole.build(scale=0.002)
    params = {
        "uv": load_reference_pickle(f"{REF}/uvNN_float64.pickle"),
        "dist": load_reference_pickle(f"{REF}/distNN_float64.pickle"),
        "part": load_reference_pickle(f"{REF}/partNN_float64.pickle"),
    }
    return case, params


def test_comparison_figure(case_and_params, tmp_path):
    case, params = case_and_params
    path = plots.comparison_figure(
        case, params, 20, str(tmp_path), fields=("u", "s11"), dpi=40
    )
    assert os.path.exists(path) and os.path.getsize(path) > 1000


def test_frame_sequence_and_gif(case_and_params, tmp_path):
    case, params = case_and_params
    paths = plots.frame_sequence(
        case, params, str(tmp_path), frames=[10, 20], fields=("u",), dpi=30
    )
    assert len(paths) == 2
    gif = plots.assemble_gif(paths, str(tmp_path / "out.gif"), fps=2)
    assert os.path.getsize(gif) > 500


def test_hole_edge_stress_figure(case_and_params, tmp_path):
    case, params = case_and_params
    out = plots.hole_edge_stress_figure(
        case, params, str(tmp_path / "hole.png"), times=(2.5,), dpi=40
    )
    assert os.path.getsize(out) > 1000


def test_residual_map_figure(case_and_params, tmp_path):
    case, params = case_and_params
    # Small grid for speed.
    case.eval_grid = case.eval_grid[::50]
    out = plots.residual_map_figure(
        case, params, 2.5, str(tmp_path / "res.png"), dpi=40
    )
    assert os.path.getsize(out) > 1000


def test_loss_history_figure(tmp_path):
    out = plots.loss_history_figure(
        {"f_uv": np.geomspace(1, 1e-4, 100), "f_s": np.geomspace(2, 1e-3, 100)},
        str(tmp_path / "loss.png"),
    )
    assert os.path.getsize(out) > 1000
