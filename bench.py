"""Benchmark harness: collocation-point residual evaluations/sec.

Measures the hot op of PINN training — one fused value+grad of the full
weighted loss (all residuals + BC/IC terms, every derivative from the jet
forward) on the flagship defected-plate case at reference scale (~105k
collocation points, composite 8x70 MLP; /root/reference/PlateHoleQuarter/
train/train.py:885,903-929).

Two timings:
  * chained (primary): K steps self-feeding inside one jitted lax.scan —
    the amortized rate a device-resident optimizer loop actually achieves;
  * blocked: block_until_ready per call — what a host-driven loop (the
    reference's scipy L-BFGS ping-pong) would pay per iteration.

Prints ONE JSON line:
  {"metric": "collocation_evals_per_sec", "value": N, "unit": "evals/s",
   "vs_baseline": R, ...}

``vs_baseline`` = TPU chained rate / host-CPU rate on the same jitted step
(measured on a 1/16-size bank and normalized per point) — a stand-in for the
reference's host-resident TF1-CPU execution (the reference publishes no
numbers; BASELINE.md: baselines must be measured, north star >=50x vs CPU).
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
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


@partial(jax.jit, static_argnames=("scalar_loss", "k"))
def _chained_steps(scalar_loss, params, banks, k: int):
    """k value+grad steps, each feeding the next through a tiny param nudge
    (prevents any cross-step elision; mimics an optimizer update)."""

    def body(p, _):
        loss, grads = jax.value_and_grad(scalar_loss)(p, banks)
        p = jax.tree.map(lambda a, g: a - jnp.asarray(1e-12, a.dtype) * g,
                         p, grads)
        return p, loss

    p, losses = jax.lax.scan(body, params, None, length=k)
    return p, losses


def _rate_chained(scalar_loss, params, banks, n_col, k, repeats=3):
    p, losses = _chained_steps(scalar_loss, params, banks, k)  # compile
    jax.block_until_ready(losses)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        p, losses = _chained_steps(scalar_loss, params, banks, k)
        jax.block_until_ready(losses)
        best = min(best, (time.perf_counter() - t0) / k)
    return n_col / best, best


def _rate_blocked(scalar_loss, params, banks, n_col, iters):
    vg = jax.jit(jax.value_and_grad(scalar_loss))
    jax.block_until_ready(vg(params, banks))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(vg(params, banks))
    step = (time.perf_counter() - t0) / iters
    return n_col / step, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--chain", type=int, default=50)
    ap.add_argument("--blocked-iters", type=int, default=10)
    ap.add_argument("--cpu-scale", type=float, default=1 / 16,
                    help="CPU comparator bank size relative to --scale")
    ap.add_argument("--cpu-iters", type=int, default=2)
    ap.add_argument("--skip-cpu", action="store_true")
    args = ap.parse_args()

    case, scalar_loss, params, n_col = _build(args.scale)
    banks = case.banks
    dev = jax.devices()[0]

    rate_chained, step_chained = _rate_chained(
        scalar_loss, params, banks, n_col, args.chain
    )
    rate_blocked, step_blocked = _rate_blocked(
        scalar_loss, params, banks, n_col, args.blocked_iters
    )

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
            cpu_rate = n_c / step_c  # per-point rate; size-normalized
        except Exception:
            cpu_rate = None

    vs_baseline = rate_chained / cpu_rate if cpu_rate else None
    print(json.dumps({
        "metric": "collocation_evals_per_sec",
        "value": round(rate_chained, 1),
        "unit": "evals/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "device": str(dev),
        "n_collocation": n_col,
        "step_seconds_chained": round(step_chained, 6),
        "step_seconds_blocked": round(step_blocked, 6),
        "evals_per_sec_blocked": round(rate_blocked, 1),
        "cpu_evals_per_sec": round(cpu_rate, 1) if cpu_rate else None,
    }))


if __name__ == "__main__":
    main()
