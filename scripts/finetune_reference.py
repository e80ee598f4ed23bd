"""Validate the training stack at the reference's converged optimum.

Loads the reference's shipped trained networks (uv + dist + part), evaluates
our loss at their optimum, then runs a bounded L-BFGS fine-tune.  If the
physics/loss implementation matches the reference, training from its optimum
must hold or improve the loss and FEM errors — a strong end-to-end check of
residuals + losses + optimizer beyond forward-pass golden parity.

Run on TPU: python scripts/finetune_reference.py --iters 300
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--segment", type=int, default=25)
    ap.add_argument("--out", default="runs/finetune_reference.json")
    args = ap.parse_args()

    import jax.numpy as jnp

    from pinn_elastodynamics_tpu.cases import plate_hole
    from pinn_elastodynamics_tpu.cases.base import _phase_loss_fn
    from pinn_elastodynamics_tpu.eval.compare import frame_errors
    from pinn_elastodynamics_tpu.train.checkpoint import load_reference_pickle
    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    base = "/root/reference/PlateHoleQuarter/train"
    case = plate_hole.build(scale=1.0, pad_to_multiple_of=8)
    params = {
        "uv": load_reference_pickle(f"{base}/uvNN_float64.pickle", jnp.float32),
        "dist": load_reference_pickle(f"{base}/distNN_float64.pickle", jnp.float32),
        "part": load_reference_pickle(f"{base}/partNN_float64.pickle", jnp.float32),
    }

    loss_before = case.components(params)
    errs_before = frame_errors(case, params, 20, dtype=np.float32)

    phase = case.phases[-1]  # uv only, dist/part frozen (reference protocol)
    sub_fn, sub0, merge = _phase_loss_fn(case, phase, params)
    res = minimize(sub_fn, sub0, maxiter=args.iters, segment=args.segment,
                   log_every=100)
    params = merge(params, res.params)

    loss_after = case.components(params)
    errs_after = frame_errors(case, params, 20, dtype=np.float32)

    report = {
        "iters": res.n_iters,
        "loss_before": loss_before,
        "loss_after": loss_after,
        "total_before": float(sum(10.0 * v for v in loss_before.values())),
        "total_after": float(res.final_loss),
        "fem_errors_frame20_before": errs_before,
        "fem_errors_frame20_after": errs_after,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print(json.dumps(report, default=float))


if __name__ == "__main__":
    main()
