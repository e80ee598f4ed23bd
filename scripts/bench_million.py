"""BASELINE.json config #3 demonstration: 1M+ collocation points.

Builds the confined-wave case with a ~1.1M-point collocation bank, evaluates
the full loss with microbatched gradient accumulation (activations never all
live at once), and times L-BFGS iterations end-to-end on the device.

Run (TPU, takes a few minutes):  python scripts/bench_million.py
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=6.0,
                    help="collocation scale vs reference (~185k pts)")
    ap.add_argument("--microbatches", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from pinn_elastodynamics_tpu.cases import wave_confined
    from pinn_elastodynamics_tpu.train.lbfgs import minimize
    from pinn_elastodynamics_tpu.train.step import make_microbatched_loss_fn

    case = wave_confined.build(
        scale=args.scale, pad_to_multiple_of=8 * args.microbatches
    )
    n_col = int(np.sum(np.asarray(case.banks["collocation"].mask)))

    loss_fn = make_microbatched_loss_fn(
        case.model, case.loss, case.material,
        num_microbatches=args.microbatches,
    )

    def scalar(params):
        total, _ = loss_fn(params, case.banks)
        return total

    params = case.init_params(seed=0)

    # Warm (compile) then measure.
    t0 = time.perf_counter()
    minimize(scalar, params, maxiter=2, segment=2)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = minimize(scalar, params, maxiter=args.iters,
                   segment=min(10, args.iters), ftol=0.0)
    wall = time.perf_counter() - t0

    print(json.dumps({
        "metric": "million_point_lbfgs_iters_per_sec",
        "value": round(res.n_iters / wall, 3),
        "unit": "iters/s",
        "n_collocation": n_col,
        "microbatches": args.microbatches,
        "iters": res.n_iters,
        "final_loss": float(res.final_loss),
        "wall_seconds": round(wall, 1),
        "compile_seconds": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
