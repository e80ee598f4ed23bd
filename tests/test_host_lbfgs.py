"""Host-f64 L-BFGS engine + chunk-sum loss reconstruction tests.

The extended-precision endgame path: device = pure-f32 value+grad emitting
per-chunk partial sums, host = f64 two-loop/zoom-line-search optimizer
(train/lbfgs_host.py).  See banks.ChunkSumCollector for why f64 never
touches the device graph.
"""

import numpy as np

from pinn_elastodynamics_tpu.cases import plate_hole
from pinn_elastodynamics_tpu.train.lbfgs_host import (
    HostLBFGSResult,
    make_host_phase_vg,
    minimize_host,
)


def _rosen_vg(x):
    f = np.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)
    g = np.zeros_like(x)
    g[:-1] = -400.0 * x[:-1] * (x[1:] - x[:-1] ** 2) - 2 * (1 - x[:-1])
    g[1:] += 200.0 * (x[1:] - x[:-1] ** 2)
    return f, g


def test_rosenbrock_converges_to_machine_precision():
    res = minimize_host(_rosen_vg, np.full(20, -1.2), maxiter=1500,
                        patience=50)
    assert isinstance(res, HostLBFGSResult)
    assert res.final_loss < 1e-12
    # Healthy carried regime: ~1 eval per iteration, not a zoom storm.
    assert res.n_evals < 2.5 * res.n_iters


def test_carry_resume_continues_descent():
    A = np.diag(np.linspace(1.0, 300.0, 40))

    def quad(x):
        return 0.5 * x.dot(A @ x), A @ x

    r1 = minimize_host(quad, np.ones(40), maxiter=8)
    r2 = minimize_host(quad, r1.x, maxiter=300, init_carry=r1.carry)
    assert r2.final_loss < 1e-16
    # With curvature memory carried, resumption should not need more total
    # iterations than a fresh full run.
    r_full = minimize_host(quad, np.ones(40), maxiter=400)
    assert r1.n_iters + r2.n_iters <= r_full.n_iters + 10


def test_chunk_sum_reconstruction_matches_f64_truth():
    """Host-f64 total from f32 chunk sums ≈ the true f64 loss (forward noise
    only, ~1e-6 relative), and exactly reproduces the f32 component means."""
    import jax.numpy as jnp

    case = plate_hole.build(scale=0.05, pad_to_multiple_of=8, jet_impl="xla")
    params = case.init_params(seed=3)
    phase = case.phases[-1]
    host_vg, x0, unravel = make_host_phase_vg(case, phase, params)
    f_host, g = host_vg(x0)
    assert g.dtype == np.float64 and g.shape == x0.shape
    assert np.all(np.isfinite(g))

    # f32 reference value of the same loss.
    f32_val = float(case.loss_fn(phase.loss, phase.scale)(params))
    assert abs(f_host - f32_val) / max(abs(f32_val), 1e-30) < 1e-5

    # True f64 loss (CPU x64 path, f64 banks + params).
    case64 = plate_hole.build(scale=0.05, pad_to_multiple_of=8,
                              dtype=np.float64, jet_impl="xla")
    params64 = {k: [
        {kk: jnp.asarray(vv, jnp.float64) for kk, vv in layer.items()}
        for layer in v] for k, v in params.items()}
    f64_val = float(case64.loss_fn(phase.loss, phase.scale)(params64))
    assert abs(f_host - f64_val) / max(abs(f64_val), 1e-30) < 1e-4


def test_host_lbfgs_descends_on_plate_phase():
    case = plate_hole.build(scale=0.02, pad_to_multiple_of=8, jet_impl="xla")
    params = case.init_params(seed=0)
    phase = case.phases[-1]
    host_vg, x0, _ = make_host_phase_vg(case, phase, params)
    f0, _ = host_vg(x0)
    res = minimize_host(host_vg, x0, maxiter=30, patience=50)
    assert res.final_loss < 0.9 * f0
    assert res.converged in ("maxiter", "ftol", "gtol", "target",
                             "linesearch")


def test_host_problem_vg_matches_f32_loss_and_descends():
    """Inverse-problem host vg: f64 chunk-sum loss matches the f32 loss and
    the host engine descends the joint (net, E, rho) objective."""
    import jax.numpy as jnp

    from pinn_elastodynamics_tpu.cases.inverse import build
    from pinn_elastodynamics_tpu.train.lbfgs_host import make_host_problem_vg

    prob, banks = build(scale=0.02, pad_to_multiple_of=8,
                        n_sensor_frames=3, sensors_per_frame=40)
    params = prob.init_params(seed=0)
    host_vg, x0, unravel32 = make_host_problem_vg(prob, banks, params,
                                                  chunk_size=64)
    f64, g64 = host_vg(x0)
    f32 = float(prob.loss_fn(banks)(params))
    assert abs(f64 - f32) <= 1e-5 * max(abs(f32), 1.0)
    assert np.all(np.isfinite(g64)) and g64.size == x0.size

    res = minimize_host(host_vg, x0, maxiter=15, patience=50)
    assert res.final_loss < f64
    # Material leaves sit at the front of the flat vector (sorted dict keys:
    # log_E, log_rho, net) — the layout scripts/inverse_host.py relies on.
    p = unravel32(jnp.asarray(np.asarray(res.x, np.float32)))
    assert np.isclose(float(p["log_E"]), res.x[0], atol=1e-6)
    assert np.isclose(float(p["log_rho"]), res.x[1], atol=1e-6)


def test_preconditioned_vg_fixes_anisotropy():
    """Jacobi preconditioning: a badly scaled quadratic that starves plain
    L-BFGS within a tight budget is solved immediately once whitened."""
    from pinn_elastodynamics_tpu.train.lbfgs_host import (
        make_preconditioned_vg,
    )

    # f(x) = 0.5 sum(h_i x_i^2) with condition number 1e8
    h = np.array([1e8, 1.0, 1e-0, 1e4, 1e2], np.float64)

    def vg(x):
        return 0.5 * float(h @ (x * x)), h * x

    x0 = np.ones_like(h)
    plain = minimize_host(vg, x0, maxiter=3, patience=50)

    d = 1.0 / np.sqrt(h)  # exact whitening
    vg_u, to_u, from_u = make_preconditioned_vg(vg, d)
    pre = minimize_host(vg_u, to_u(x0), maxiter=3, patience=50)
    x_back = from_u(pre.x)
    assert pre.final_loss < 1e-12 * max(plain.final_loss, 1e-30) or (
        pre.final_loss < 1e-10)
    assert np.abs(x_back).max() < 1e-5
    # coordinate maps invert each other
    np.testing.assert_allclose(from_u(to_u(x0)), x0, rtol=1e-12)
