"""Determinism (SURVEY.md §2 #22): fixed seeds make everything reproducible."""

import jax
import numpy as np
import pytest

from pinn_elastodynamics_tpu.cases import plate_hole, wave_confined
from pinn_elastodynamics_tpu.utils.debug import tree_max_abs_diff


def test_banks_deterministic_per_seed():
    a = plate_hole.build_banks(seed=1111, scale=0.005)
    b = plate_hole.build_banks(seed=1111, scale=0.005)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k].xyt), np.asarray(b[k].xyt))
    c = plate_hole.build_banks(seed=2222, scale=0.005)
    assert not np.array_equal(np.asarray(a["collocation"].xyt),
                              np.asarray(c["collocation"].xyt))


def test_params_deterministic_per_seed():
    case = wave_confined.build(scale=0.002)
    p1 = case.init_params(seed=7)
    p2 = case.init_params(seed=7)
    assert tree_max_abs_diff(p1, p2) == 0.0
    p3 = case.init_params(seed=8)
    assert tree_max_abs_diff(p1, p3) > 0.0


def test_loss_deterministic():
    case = wave_confined.build(scale=0.002)
    params = case.init_params(seed=3)
    fn = jax.jit(case.loss_fn(case.loss))
    assert float(fn(params)) == float(fn(params))
