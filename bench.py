"""Benchmark harness: collocation-point residual evaluations/sec.

Measures the hot op of PINN training — one fused value+grad of the full
weighted loss (all residuals + BC/IC terms, every derivative from the jet
forward) on the flagship defected-plate case at reference scale (~105k
collocation points, composite 8x70 MLP; /root/reference/PlateHoleQuarter/
train/train.py:885,903-929) — plus the end-to-end device-resident L-BFGS
iteration rate (each iteration = 1 + #linesearch-trial full evaluations).

Prints ONE JSON line:
  {"metric": "collocation_evals_per_sec", "value": N, "unit": "evals/s",
   "vs_baseline": R, ...}

``vs_baseline`` is the TPU rate divided by the host-CPU rate for the same
jitted step (CPU measured on a 1/16-size bank, normalized per point) — a
stand-in for the reference's host-resident TF1-CPU execution (the reference
publishes no numbers; BASELINE.md: baselines must be measured, north star
>=50x vs CPU).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def _build(scale: float):
    from pinn_elastodynamics_tpu.cases import plate_hole
    from pinn_elastodynamics_tpu.train.step import make_loss_fn

    case = plate_hole.build(scale=scale, pad_to_multiple_of=8)
    loss_fn = make_loss_fn(case.model, case.loss, case.material)

    def scalar_loss(params, banks):
        total, _ = loss_fn(params, banks)
        return total

    params = case.init_params(seed=0)
    n_col = int(np.sum(np.asarray(case.banks["collocation"].mask)))
    return case, scalar_loss, params, n_col


def _rate_blocked(scalar_loss, params, banks, n_col, iters):
    vg = jax.jit(jax.value_and_grad(scalar_loss))
    jax.block_until_ready(vg(params, banks))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(vg(params, banks))
        best = min(best, (time.perf_counter() - t0) / iters)
    return n_col / best, best


def _lbfgs_iter_rate(case, params, iters):
    """End-to-end segmented L-BFGS per-iteration wall (excl. compile)."""
    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    loss = case.loss_fn(case.phases[-1].loss)
    # Warm segment (compiles the segment executable).
    minimize(loss, params, maxiter=2, segment=2)
    t0 = time.perf_counter()
    res = minimize(loss, params, maxiter=iters, segment=min(50, iters),
                   ftol=0.0)
    wall = time.perf_counter() - t0
    return res.n_iters / wall if wall > 0 else None, res.n_iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--blocked-iters", type=int, default=10)
    ap.add_argument("--lbfgs-iters", type=int, default=100)
    ap.add_argument("--cpu-scale", type=float, default=1 / 16)
    ap.add_argument("--cpu-iters", type=int, default=2)
    ap.add_argument("--skip-cpu", action="store_true")
    ap.add_argument("--skip-lbfgs", action="store_true")
    args = ap.parse_args()

    case, scalar_loss, params, n_col = _build(args.scale)
    banks = case.banks
    dev = jax.devices()[0]

    rate, step_s = _rate_blocked(
        scalar_loss, params, banks, n_col, args.blocked_iters
    )

    lbfgs_rate = None
    lbfgs_iters = None
    if not args.skip_lbfgs:
        try:
            lbfgs_rate, lbfgs_iters = _lbfgs_iter_rate(
                case, params, args.lbfgs_iters
            )
        except Exception:
            pass

    cpu_rate = None
    if not args.skip_cpu:
        try:
            cpu = jax.devices("cpu")[0]
            case_c, scalar_c, params_c, n_c = _build(
                args.scale * args.cpu_scale
            )
            with jax.default_device(cpu):
                params_cc = jax.device_put(params_c, cpu)
                banks_cc = jax.device_put(case_c.banks, cpu)
                vg = jax.jit(jax.value_and_grad(scalar_c))
                jax.block_until_ready(vg(params_cc, banks_cc))
                t0 = time.perf_counter()
                for _ in range(args.cpu_iters):
                    jax.block_until_ready(vg(params_cc, banks_cc))
                step_c = (time.perf_counter() - t0) / args.cpu_iters
            cpu_rate = n_c / step_c  # per-point rate, size-normalized
        except Exception:
            cpu_rate = None

    vs_baseline = rate / cpu_rate if cpu_rate else None
    print(json.dumps({
        "metric": "collocation_evals_per_sec",
        "value": round(rate, 1),
        "unit": "evals/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "device": str(dev),
        "n_collocation": n_col,
        "step_seconds": round(step_s, 6),
        "lbfgs_iters_per_sec": round(lbfgs_rate, 2) if lbfgs_rate else None,
        "lbfgs_iters_measured": lbfgs_iters,
        "cpu_evals_per_sec": round(cpu_rate, 1) if cpu_rate else None,
    }))


if __name__ == "__main__":
    main()
