"""From-scratch plate-hole run with Fourier features on the uv net.

The r2/r3 evidence says the plate's from-scratch floor (~0.029, 41x the
reference optimum) is structural: the small-magnitude stress fields (s22,
s12) stall — the classic PINN spectral-bias signature — and grinding the
optimizer (f32 carried, host-f64, CPU-f64) buys ~1e-7/iter near the floor.
This attacks the BASIN instead: random-Fourier-feature embedding on the uv
net (models/fourier.py, VERDICT r2 next-step #3) with everything else per
the reference recipe (dist/part pretrain at 1000x scale → uv phase,
train.py:958-968).

Usage:
  python scripts/plate_fourier.py --out runs/plate_fourier --minutes 70 \
      [--features 64] [--feature-scale 2.0]
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
    ap.add_argument("--minutes", type=float, default=70.0)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--feature-scale", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=1111)
    ap.add_argument("--pretrain-iters", type=int, default=2500)
    ap.add_argument("--adam", type=int, default=2000)
    ap.add_argument("--block", type=int, default=1000)
    ap.add_argument("--bc", default="net", choices=("net", "analytic"),
                    help="'analytic' = exact closed-form D/P composite "
                         "(models/analytic_bc.py): BCs hold by "
                         "construction, no pretraining phases")
    ap.add_argument("--dist-part-from", default=None,
                    help="checkpoint with f64-CPU-pretrained dist/part nets "
                         "for THIS build (scripts/pretrain_dist_part_f64.py "
                         "--fourier ...); defaults to "
                         "<out>/pretrain_norm.ckpt when present.  The f32 "
                         "TPU self-pretrain lands the dist net ~2600x worse "
                         "(phase loss 5.8e-1 vs 2.2e-4), silently breaking "
                         "hard-BC enforcement — BC error is invisible to "
                         "the uv loss.")
    args = ap.parse_args()

    import jax.numpy as jnp

    from pinn_elastodynamics_tpu.cases import plate_hole
    from pinn_elastodynamics_tpu.cases.base import _phase_loss_fn, run_pipeline
    from pinn_elastodynamics_tpu.train.adam import run_adam
    from pinn_elastodynamics_tpu.train.checkpoint import save_checkpoint
    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    os.makedirs(args.out, exist_ok=True)
    mfile = open(os.path.join(args.out, "metrics.jsonl"), "a")

    def log(rec):
        rec["t"] = round(time.time(), 1)
        mfile.write(json.dumps(rec) + "\n")
        mfile.flush()
        print(rec, flush=True)

    t_end = time.time() + args.minutes * 60
    case = plate_hole.build(
        scale=1.0, pad_to_multiple_of=8, fourier=args.features,
        fourier_scale=args.feature_scale, bc=args.bc,
    )
    # Crash-resume: the chip faults sporadically under sustained load; an
    # outer shell loop relaunches us and we continue from our best
    # checkpoint (pretrain + Adam are skipped on resume).
    best_path = os.path.join(args.out, "best.ckpt")
    resume = os.path.exists(best_path)
    if resume:
        from pinn_elastodynamics_tpu.train.checkpoint import load_checkpoint

        state = load_checkpoint(best_path)
        params = state["params"]
        log({"event": "resume", "loss": float(state.get("loss", np.nan)),
             "iters": int(state.get("iters", 0))})
    else:
        params = case.init_params(seed=args.seed)
    log({"event": "start", "features": args.features,
         "feature_scale": args.feature_scale, "minutes": args.minutes})

    if not resume and args.bc == "analytic":
        pass  # exact closed-form D/P: nothing to pretrain or load
    elif not resume:
        pre_path = args.dist_part_from or os.path.join(
            args.out, "pretrain_norm.ckpt")
        if not os.path.exists(pre_path):
            # dist/part see raw coordinates in every composite build
            # (models/fields.py::_sub), so the plain-build f64 pretrain is
            # directly reusable under the Fourier uv net.
            pre_path = "runs/pretrain_f64.ckpt"
        if os.path.exists(pre_path):
            from pinn_elastodynamics_tpu.train.checkpoint import (
                load_checkpoint,
            )

            pre = load_checkpoint(pre_path, jnp.float32)
            params = {**params, "dist": pre["params"]["dist"],
                      "part": pre["params"]["part"]}
            log({"event": "pretrain_loaded", "path": pre_path,
                 **{k: v for k, v in pre.get("pretrain_f64", {}).items()}})
        else:
            # dist/part pretrain (reference's 1000x-scaled phases).
            params, results = run_pipeline(
                case, params,
                maxiter_override={"dist": args.pretrain_iters,
                                  "part": args.pretrain_iters, "uv": 0},
                segment=50, log_every=500,
            )
            log({"event": "pretrain_done",
                 **{k: float(v.final_loss) for k, v in results.items()
                    if k != "uv"}})

    phase = case.phases[-1]
    sub_fn, sub, merge = _phase_loss_fn(case, phase, params)
    if args.adam and not resume:
        r = run_adam(lambda p: (sub_fn(p), {}), sub, 1e-3, iters=args.adam,
                     segment=200)
        sub = r.params
        log({"event": "adam_done", "loss": float(r.history["loss"][-1])})

    best = float(state.get("loss", np.inf)) if resume else float("inf")
    # Resume the curvature carry when the checkpoint holds one (cold L-BFGS
    # restarts at low loss wedge — CLAUDE.md); else warm up with short
    # segments (a cold zoom storm in one long while_loop execution trips
    # the device watchdog).
    carry = state.get("carry") if resume else None
    if carry is None:
        res = minimize(sub_fn, sub, maxiter=100, segment=10, patience=100)
        sub, carry = res.params, res.carry
        total = (int(state.get("iters", 0)) if resume else 0) + res.n_iters
        log({"event": "warmup", "loss": float(res.final_loss)})
    else:
        total = int(state.get("iters", 0))
        log({"event": "carry_resume", "iters": total})
    # Per-segment fault insurance (hybrid_endgame.py pattern): the chip
    # faults sporadically under sustained load, and a cold carry at
    # moderate loss runs zoom storms — a 50-iter segment then becomes a
    # multi-minute device execution that trips the TPU watchdog.  Short
    # segments + >=30s checkpoint cadence mean a fault costs <1 min and
    # the relaunch resumes the carried optimizer (no cold restart).
    last_save = [time.time()]

    def seg_ckpt(k, seg_params, hist, *, carry=None):
        now = time.time()
        if now - last_save[0] < 30.0 or carry is None:
            return
        last_save[0] = now
        save_checkpoint(os.path.join(args.out, "best.ckpt"),
                        {"params": merge(params, seg_params),
                         "loss": float(hist[-1]) if len(hist) else best,
                         "iters": total + int(k), "carry": carry})

    while time.time() < t_end:
        res = minimize(sub_fn, sub, maxiter=args.block, segment=25,
                       init_carry=carry, patience=100, on_segment=seg_ckpt)
        sub, carry = res.params, res.carry
        total += res.n_iters
        f_now = float(res.final_loss)
        log({"event": "block", "iters": total, "loss": f_now})
        if f_now < best:
            best = f_now
            save_checkpoint(os.path.join(args.out, "best.ckpt"),
                            {"params": merge(params, sub), "loss": best,
                             "iters": total, "carry": carry})
        if res.n_iters < args.block:
            break

    log({"event": "train_done", "loss": best, "iters": total})
    full = merge(params, sub)
    save_checkpoint(os.path.join(args.out, "best.ckpt"),
                    {"params": full, "loss": best, "iters": total,
                     "carry": carry})

    from pinn_elastodynamics_tpu.eval.compare import (
        compare_frames,
        hole_edge_errors,
    )

    cmp = compare_frames(case, full, frames=[10, 20, 30, 60],
                         dtype=np.float32)
    he = hole_edge_errors(case, full, dtype=np.float32)
    log({"event": "fem", **cmp["aggregate"]})
    log({"event": "fem_mid", **cmp["aggregate_mid"]})
    log({"event": "hole_edge", **he["aggregate"]})
    with open(os.path.join(args.out, "fem_errors.json"), "w") as f:
        json.dump({"frames": cmp, "hole_edge": he}, f, indent=2,
                  default=float)
    mfile.close()


if __name__ == "__main__":
    main()
