"""Benchmark harness: collocation-point residual evaluations/sec.

Measures the hot op of PINN training — one fused value+grad of the full
weighted loss (all residuals + BC/IC terms, every derivative from the jet
forward) on the flagship defected-plate case at reference scale (~105k
collocation points, composite 8x70 MLP; /root/reference/PlateHoleQuarter/
train/train.py:885,903-929).

Prints ONE JSON line:
  {"metric": "collocation_evals_per_sec", "value": N, "unit": "evals/s",
   "vs_baseline": R, ...}

``vs_baseline`` is the TPU rate divided by the same jitted step measured on
this host's CPU — a stand-in for the reference's host-resident TF1-CPU
execution (the reference publishes no numbers; BASELINE.md requires measured
baselines, north star >=50x vs CPU).
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

    vg = jax.jit(jax.value_and_grad(scalar_loss))
    params = case.init_params(seed=0)
    n_col = int(np.sum(np.asarray(case.banks["collocation"].mask)))
    return case, vg, params, n_col


def _time_step(vg, params, banks, iters: int) -> float:
    # Warmup (compile) + sync.
    loss, grads = vg(params, banks)
    jax.block_until_ready((loss, grads))
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = vg(params, banks)
    jax.block_until_ready((loss, grads))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu-iters", type=int, default=2)
    ap.add_argument("--skip-cpu", action="store_true")
    args = ap.parse_args()

    case, vg, params, n_col = _build(args.scale)
    banks = case.banks

    dev = jax.devices()[0]
    step_s = _time_step(vg, params, banks, args.iters)
    evals_per_sec = n_col / step_s

    cpu_evals_per_sec = None
    if not args.skip_cpu:
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                params_c = jax.device_put(params, cpu)
                banks_c = jax.device_put(banks, cpu)
                step_c = _time_step(vg, params_c, banks_c, args.cpu_iters)
            cpu_evals_per_sec = n_col / step_c
        except Exception:
            cpu_evals_per_sec = None

    vs_baseline = (
        evals_per_sec / cpu_evals_per_sec if cpu_evals_per_sec else None
    )
    print(json.dumps({
        "metric": "collocation_evals_per_sec",
        "value": round(evals_per_sec, 1),
        "unit": "evals/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "device": str(dev),
        "n_collocation": n_col,
        "step_seconds": round(step_s, 6),
        "cpu_evals_per_sec": round(cpu_evals_per_sec, 1)
        if cpu_evals_per_sec else None,
    }))


if __name__ == "__main__":
    main()
