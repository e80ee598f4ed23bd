"""Adaptive alternating-cycle driver for the plate-hole uv phase.

Successor to adam_escape.py: instead of fixed stage budgets, alternates
L-BFGS (run until its descent rate flattens) with low-LR Adam escape stages
(run until they stop out-descending L-BFGS), under a wall-clock budget.
Always keeps the best-so-far checkpoint; streams JSONL metrics.

Rationale (round-1 measurements, docs/STATUS.md): at f32 plateaus the zoom
line search burns ~50 evals per tiny step while Adam progresses per single
evaluation; alternating cycles took the from-scratch loss 1.49 -> 0.42 and
were still descending.  The reference's own budget for this phase is 70k
f64 L-BFGS iterations (/root/reference/PlateHoleQuarter/train/train.py:220-247).

Usage:
  python scripts/cycle_driver.py CKPT_IN CKPT_OUT --hours 2.5 [--target 7e-4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from pinn_elastodynamics_tpu.cases import plate_hole
from pinn_elastodynamics_tpu.cases.base import _phase_loss_fn
from pinn_elastodynamics_tpu.train.adam import run_adam
from pinn_elastodynamics_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from pinn_elastodynamics_tpu.train.lbfgs import minimize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_in")
    ap.add_argument("ckpt_out")
    ap.add_argument("--hours", type=float, default=2.0)
    ap.add_argument("--target", type=float, default=7.08e-4)
    ap.add_argument("--lbfgs-block", type=int, default=500,
                    help="L-BFGS iterations per plateau check")
    ap.add_argument("--plateau-rel", type=float, default=3e-4,
                    help="relative loss drop per block below which L-BFGS "
                         "is declared plateaued")
    ap.add_argument("--patience", type=int, default=50,
                    help="consecutive flat f32 steps tolerated (unit-step "
                         "iterations cost ~50 ms; hundreds of flats are "
                         "cheaper than one cold restart)")
    ap.add_argument("--adam-block", type=int, default=4000)
    ap.add_argument("--bridge-iters", type=int, default=0,
                    help="one-time Adam bridge before the first L-BFGS run: "
                         "deliberately moves OFF a cold-start wedge point "
                         "(f32 cold L-BFGS can fail to build curvature at "
                         "low loss; carried L-BFGS built at a rougher point "
                         "rides back down through it)")
    ap.add_argument("--bridge-lr", type=float, default=1e-4)
    ap.add_argument("--precision", choices=["f32", "mixed"], default="f32",
                    help="'mixed' = f64 params/optimizer + f64 loss tail "
                         "over the f32 Pallas compute path (the endgame "
                         "regime where f32 loss-difference resolution "
                         "wedges the line search)")
    ap.add_argument("--metrics", default=None)
    args = ap.parse_args()

    if args.precision == "mixed":
        import jax

        jax.config.update("jax_enable_x64", True)

    t_end = time.time() + args.hours * 3600
    mpath = args.metrics or os.path.join(
        os.path.dirname(args.ckpt_out) or ".", "cycle_metrics.jsonl")
    mfile = open(mpath, "a")

    def log(rec):
        rec["t"] = round(time.time(), 1)
        mfile.write(json.dumps(rec) + "\n")
        mfile.flush()
        print(rec, flush=True)

    case = plate_hole.build(scale=1.0, pad_to_multiple_of=8)
    phase = case.phases[-1]
    if args.precision == "mixed":
        from pinn_elastodynamics_tpu.cases.base import mixed_precision_phase_fn

        params = load_checkpoint(args.ckpt_in, jnp.float64)["params"]
        sub_fn, sub, merge = mixed_precision_phase_fn(case, phase, params)
    else:
        params = load_checkpoint(args.ckpt_in, jnp.float32)["params"]
        sub_fn, sub, merge = _phase_loss_fn(case, phase, params)
    loss_aux = lambda s: (sub_fn(s), {})

    best = float(sub_fn(sub))
    log({"event": "start", "loss": best, "hours": args.hours})
    best_sub = sub

    def save_if_better(cand, val):
        nonlocal best, best_sub
        if val < best:
            best, best_sub = val, cand
            save_checkpoint(args.ckpt_out, {"params": merge(params, cand)})
            log({"event": "ckpt", "loss": val})

    cycle = 0
    carry = None
    if args.bridge_iters:
        r = run_adam(loss_aux, sub, args.bridge_lr, iters=args.bridge_iters,
                     segment=200)
        sub = r.params
        log({"event": "bridge", "lr": args.bridge_lr,
             "iters": args.bridge_iters,
             "loss": float(r.history["loss"][-1])})
    while time.time() < t_end and best > args.target:
        cycle += 1
        # --- L-BFGS until plateau (carrying curvature between blocks) ---
        lb_t0 = time.time()
        stale_blocks = 0
        while time.time() < t_end:
            res = minimize(sub_fn, sub, maxiter=args.lbfgs_block, segment=25,
                           init_carry=carry, target=args.target,
                           patience=args.patience)
            carry = res.carry
            sub = res.params
            f_now = float(res.final_loss)
            h = res.loss_history
            rel_drop = (float(h[0]) - f_now) / max(abs(float(h[0])), 1e-12) \
                if len(h) > 1 else 0.0
            rate = res.n_iters / max(time.time() - lb_t0, 1e-9)
            log({"event": "lbfgs_block", "cycle": cycle, "loss": f_now,
                 "iters": int(res.n_iters), "rel_drop": rel_drop,
                 "iters_per_sec": round(rate, 3)})
            save_if_better(sub, f_now)
            lb_t0 = time.time()
            if f_now <= args.target:
                break
            # Carried L-BFGS is ~10x cheaper per unit progress than a cold
            # restart (unit-step acceptance): only declare a plateau after
            # two consecutive stale blocks.
            stale_blocks = stale_blocks + 1 if rel_drop < args.plateau_rel \
                else 0
            if stale_blocks >= 2:
                break
        if best <= args.target or time.time() >= t_end:
            break

        # --- Adam escape: decreasing-LR blocks while they out-descend ---
        sub = best_sub  # escape from the best point, not a wandered one
        carry = None    # curvature is stale after Adam moves the point
        lr = 3e-5 if best > 3e-3 else 1e-5
        for _ in range(4):
            if time.time() >= t_end:
                break
            f_before = float(sub_fn(sub))
            r = run_adam(loss_aux, sub, lr, iters=args.adam_block, segment=200)
            f_after = float(r.history["loss"][-1])
            log({"event": "adam_block", "cycle": cycle, "lr": lr,
                 "loss": f_after, "iters": args.adam_block})
            if f_after < f_before:
                sub = r.params
                save_if_better(sub, f_after)
            else:
                lr *= 0.3
                if lr < 3e-6:
                    break

    # Final report from the best point.
    sub = best_sub
    full = merge(params, sub)
    save_checkpoint(args.ckpt_out, {"params": full})
    log({"event": "done", "loss": best, "cycles": cycle})
    from pinn_elastodynamics_tpu.eval.compare import frame_errors

    if args.precision == "mixed":
        # Render in f32: f64 matmuls don't belong on the TPU eval path.
        import jax

        full = jax.tree.map(lambda a: a.astype(jnp.float32), full)
    for frame in (10, 20, 60):
        errs = frame_errors(case, full, frame, dtype=np.float32)
        log({"event": "fem", "frame": frame,
             **{k: round(v, 4) for k, v in errs.items()}})
    mfile.close()


if __name__ == "__main__":
    main()
