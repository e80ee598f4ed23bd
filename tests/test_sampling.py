"""Geometry / sampling layer."""

import numpy as np

from pinn_elastodynamics_tpu.geometry import distance, sampling as smp
from pinn_elastodynamics_tpu.geometry.sources import (
    cyclic_tension,
    gaussian_pulse,
    radial_displacement,
    ricker_wavelet,
)


def test_lhs_stratification(rng):
    """Latin hypercube: exactly one sample per stratum per dimension."""
    n = 64
    s = smp.lhs(3, n, rng)
    assert s.shape == (n, 3)
    for j in range(3):
        strata = np.floor(s[:, j] * n).astype(int)
        assert sorted(strata) == list(range(n))


def test_lhs_box_bounds(rng):
    lb, ub = (-2.0, 0.0, 1.0), (3.0, 0.5, 11.0)
    pts = smp.lhs_box(lb, ub, 500, rng)
    assert (pts.min(0) >= np.array(lb) - 1e-12).all()
    assert (pts.max(0) <= np.array(ub) + 1e-12).all()


def test_exclude_disk(rng):
    pts = rng.uniform(-1, 1, (1000, 3))
    out = smp.exclude_disk(pts, xc=0, yc=0, r=0.5, strict=True)
    d = np.sqrt(out[:, 0] ** 2 + out[:, 1] ** 2)
    assert (d > 0.5).all()
    assert out.shape[0] < pts.shape[0]


def test_cross_time_ordering():
    xy = np.array([[1.0, 2.0], [3.0, 4.0]])
    t = np.array([0.0, 5.0])
    out = smp.cross_time(xy, t)
    expected = np.array(
        [[1, 2, 0], [3, 4, 0], [1, 2, 5], [3, 4, 5]], dtype=float
    )
    np.testing.assert_allclose(out, expected)


def test_circle_points_quarter():
    pts = smp.circle_points(xc=0, yc=0, r=0.1, n=5, theta1=np.pi / 2)
    r = np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2)
    np.testing.assert_allclose(r, 0.1, atol=1e-12)
    assert (pts >= -1e-12).all()  # first quadrant


def test_plate_hole_distance_matches_pointwise():
    """Vectorized distance targets == the reference's per-point min loop
    (train.py:650-654)."""
    rng = np.random.default_rng(0)
    xyt = rng.uniform(0, 0.5, (200, 3))
    xyt[:, 2] *= 20
    d = distance.plate_hole_distance(xyt)
    for i in range(xyt.shape[0]):
        x, y, t = xyt[i]
        assert d[i, 0] == min(t, x)
        assert d[i, 1] == min(t, y)
        assert d[i, 2] == min(t, 0.5 - x)
        assert d[i, 3] == min(t, 0.5 - y)
        assert d[i, 4] == min(t, y, 0.5 - y, x, 0.5 - x)


def test_confined_wave_distance():
    xyt = np.array([[0.0, 3.0, 5.0], [14.0, 0.0, 100.0]])
    d = distance.confined_wave_distance(xyt)
    # point 1: min(5, 3-2=1, 15, 15, 12, 18)/10 = 0.1
    np.testing.assert_allclose(d[0, 0], 0.1)
    # point 2: min(100, 14-2=12, 1, 29, 15, 15)/10 = 0.1
    np.testing.assert_allclose(d[1, 0], 0.1)
    np.testing.assert_allclose(d[:, 2:], 1.0)  # stress channels unused


def test_source_signatures():
    # Cyclic tension: zero at t=0, peak 1.0 at t=2.5, back to 0 at t=5.
    np.testing.assert_allclose(cyclic_tension(np.array([0.0])), 0.0, atol=1e-12)
    np.testing.assert_allclose(cyclic_tension(np.array([2.5])), 1.0, atol=1e-12)
    np.testing.assert_allclose(cyclic_tension(np.array([5.0])), 0.0, atol=1e-12)
    # Gaussian pulse peaks at t0 with given amplitude.
    assert gaussian_pulse(np.array([2.0]))[0] == 0.5
    # Ricker: value at t=ts is -amplitude.
    np.testing.assert_allclose(ricker_wavelet(np.array([3.0])), -1.0)
    # Radial displacement direction.
    uv = radial_displacement(np.array([[2.0, 0.0]]), np.array([[0.5]]), r=2.0)
    np.testing.assert_allclose(uv, [[0.5, 0.0]])


def test_grid_disk_complement():
    g = smp.grid_disk_complement(0, 0.5, 0, 0.5, 51, xc=0, yc=0, r=0.1)
    d = np.sqrt(g[:, 0] ** 2 + g[:, 1] ** 2)
    assert (d >= 0.1).all()


def test_shuffled_preserves_rows(rng):
    a = rng.normal(size=(50, 5))
    (b,) = smp.shuffled(rng, a)
    # Same multiset of rows, paired columns intact.
    assert sorted(map(tuple, a.tolist())) == sorted(map(tuple, b.tolist()))
