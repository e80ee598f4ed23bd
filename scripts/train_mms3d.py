"""Train the 3D elastodynamics MMS case to a documented error bar.

VERDICT r2 next-step #6: cases/elastic3d.py gained a falsifiable
manufactured-solution oracle (plane P-wave, tests/test_mms3d.py); this trains
the MMS case end-to-end on TPU and reports per-channel relative-L2 errors
against the closed-form solution — the 3D analog of the 2D cases' FEM
comparison (no 3D FEM data exists; BASELINE.json config #4).

Usage:
  python scripts/train_mms3d.py --out runs/elastic3d --minutes 25
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--minutes", type=float, default=25.0)
    ap.add_argument("--scale", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=1111)
    ap.add_argument("--adam", type=int, default=2000)
    ap.add_argument("--block", type=int, default=1000)
    args = ap.parse_args()

    from pinn_elastodynamics_tpu.cases import elastic3d
    from pinn_elastodynamics_tpu.train.adam import run_adam
    from pinn_elastodynamics_tpu.train.checkpoint import save_checkpoint
    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    os.makedirs(args.out, exist_ok=True)
    mfile = open(os.path.join(args.out, "metrics.jsonl"), "a")

    def log(rec):
        rec["t"] = round(time.time(), 1)
        mfile.write(json.dumps(rec, default=float) + "\n")
        mfile.flush()
        print(rec, flush=True)

    t_end = time.time() + args.minutes * 60
    case = elastic3d.build_mms(scale=args.scale, seed=args.seed,
                               pad_to_multiple_of=8)
    params = case.init_params(seed=args.seed)
    spec = case.loss

    def loss_fn(p):
        return spec.evaluate(case.model, p, case.material, case.banks)[0]

    log({"event": "start", "scale": args.scale, "minutes": args.minutes,
         "n_col": case.banks["collocation"].n_total})

    r = run_adam(lambda p: spec.evaluate(
        case.model, p, case.material, case.banks), params,
        1e-3, iters=args.adam, segment=200)
    params = r.params
    log({"event": "adam_done", "loss": float(r.history["loss"][-1])})

    # Short first segments (cold zoom storms in one long while_loop trip the
    # device watchdog), then carried 50-iter segments.
    res = minimize(loss_fn, params, maxiter=100, segment=10, patience=100)
    params, carry = res.params, res.carry
    total = res.n_iters
    best = float(res.final_loss)
    log({"event": "warmup", "loss": best})
    while time.time() < t_end:
        res = minimize(loss_fn, params, maxiter=args.block, segment=50,
                       init_carry=carry, patience=100)
        params, carry = res.params, res.carry
        total += res.n_iters
        f_now = float(res.final_loss)
        log({"event": "block", "iters": total, "loss": f_now})
        if f_now < best:
            best = f_now
            save_checkpoint(os.path.join(args.out, "best.ckpt"),
                            {"params": params, "loss": best, "iters": total})
        if res.n_iters < args.block:
            break

    log({"event": "train_done", "loss": best, "iters": total})
    errs = elastic3d.mms_errors(case.model, params)
    log({"event": "mms_errors", **errs})
    with open(os.path.join(args.out, "mms_errors.json"), "w") as f:
        json.dump({"loss": best, "iters": total, "errors": errs,
                   "scale": args.scale}, f, indent=2)
    mfile.close()


if __name__ == "__main__":
    main()
