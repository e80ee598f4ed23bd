"""Native (C++/OpenMP) data-layer library — parity with the numpy semantics."""

import numpy as np
import pytest

from pinn_elastodynamics_tpu.geometry import distance, native, sampling as smp

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native library not built: {native.load_error()}",
)


def test_native_lhs_stratification():
    n = 128
    s = native.lhs(3, n, seed=42)
    assert s.shape == (n, 3)
    for j in range(3):
        strata = np.floor(s[:, j] * n).astype(int)
        assert sorted(strata) == list(range(n))


def test_native_lhs_deterministic():
    a = native.lhs(2, 50, seed=9)
    b = native.lhs(2, 50, seed=9)
    np.testing.assert_array_equal(a, b)
    c = native.lhs(2, 50, seed=10)
    assert not np.array_equal(a, c)


def test_native_lhs_box_bounds():
    lb, ub = (-2.0, 0.0, 1.0), (3.0, 0.5, 11.0)
    pts = native.lhs_box(lb, ub, 2000, seed=3)
    assert (pts.min(0) >= np.array(lb)).all()
    assert (pts.max(0) <= np.array(ub)).all()


def test_native_exclude_disk_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (5000, 3))
    for strict in (True, False):
        ours = native.exclude_disk(pts, xc=0.1, yc=-0.2, r=0.5, strict=strict)
        ref = smp.exclude_disk(pts, xc=0.1, yc=-0.2, r=0.5, strict=strict)
        np.testing.assert_array_equal(ours, ref)


def test_native_plate_hole_distance_parity():
    rng = np.random.default_rng(1)
    xyt = rng.uniform(0, 0.5, (3000, 3))
    xyt[:, 2] *= 20
    np.testing.assert_allclose(
        native.plate_hole_distance(xyt),
        distance.plate_hole_distance(xyt),
        atol=1e-15,
    )


def test_native_cross_time_parity():
    rng = np.random.default_rng(2)
    xy = rng.uniform(size=(37, 2))
    t = np.linspace(0, 10, 11)
    np.testing.assert_array_equal(
        native.cross_time(xy, t), smp.cross_time(xy, t)
    )
