"""Equal-wall-clock ablation: baseline vs Fourier features vs Fourier + RAR.

VERDICT r2 weak-point #3: models/fourier.py and geometry/adaptive.py were
built and unit-tested but never used in a real training run.  This runs the
named basin-quality levers head-to-head on the semi-infinite wave case (the
worst-converging case) under an equal wall-clock budget and scores every
config on the SAME held-out loss banks (fresh seed, no adaptation) plus
mid-pulse FEM errors — the evidence for wiring a winner into the production
drivers.

Configs:
  baseline     plain MLP (production Pallas path)
  fourier      random-Fourier-feature embedding (XLA jet; models/fourier.py)
  fourier_rar  fourier + periodic residual-importance collocation refresh
               (geometry/adaptive.py::topk_refine); refresh recompiles the
               loss (bank contents are jit constants) — that cost is charged
               against the config's budget, as it would be in production.

Usage:
  python scripts/ablation.py --out runs/ablation_semi --minutes 8 \
      [--configs baseline fourier fourier_rar] [--max-t 8] [--scale 0.5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_config(name, args, log):
    import jax.numpy as jnp

    from pinn_elastodynamics_tpu.cases import wave_semi_infinite as mod
    from pinn_elastodynamics_tpu.geometry import sampling as smp
    from pinn_elastodynamics_tpu.geometry.adaptive import topk_refine
    from pinn_elastodynamics_tpu.train.adam import run_adam
    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    fourier = 0 if name == "baseline" else args.fourier
    case = mod.build(
        max_t=args.max_t, scale=args.scale, seed=args.seed,
        pad_to_multiple_of=8, fourier=fourier,
        fourier_scale=args.fourier_scale,
    )
    banks = dict(case.banks)
    params = case.init_params(seed=args.seed)
    spec = case.loss

    def make_loss(banks_now):
        def fn(p):
            return spec.evaluate(case.model, p, case.material, banks_now)[0]
        return fn

    # Adam warmup runs BEFORE the clock starts: the budget is equal L-BFGS
    # wall-clock per config.  Compile latency through the axon remote-compile
    # tunnel varied 68 s → 9 min for the identical baseline build within one
    # hour (measured 2026-08-17); charging it to the config would let
    # environment noise, not config merit, decide the table.  The per-config
    # wall_seconds still reports the total including warmup/compile.
    r = run_adam(lambda p: spec.evaluate(
        case.model, p, case.material, banks), params,
        1e-3, iters=args.adam, segment=200)
    params = r.params
    log({"event": "warmup", "config": name,
         "loss": float(r.history["loss"][-1])})
    t_end = time.time() + args.minutes * 60.0

    carry = None
    it_total = 0
    rng = np.random.default_rng(args.seed + 7)
    while time.time() < t_end:
        res = minimize(make_loss(banks), params, maxiter=args.block,
                       segment=50, init_carry=carry, patience=100)
        params, carry = res.params, res.carry
        it_total += res.n_iters
        log({"event": "block", "config": name, "iters": it_total,
             "loss": float(res.final_loss)})
        if res.n_iters == 0:
            break
        if name == "fourier_rar" and time.time() < t_end:
            col = banks["collocation"]
            cand = smp.lhs_box(case.lb, case.ub,
                               max(1024, col.n_total // 4), rng)
            k = max(256, col.n_total // 10)
            new_col, info = topk_refine(
                case.model, params, case.material, case.plane,
                col, cand, k,
            )
            banks = {**banks, "collocation": new_col}
            carry = None  # loss function changed; curvature is stale
            log({"event": "rar_refresh", "config": name, **info})

    # Held-out scoring: fixed banks from an independent seed, no adaptation.
    heldout = mod.build(
        max_t=args.max_t, scale=args.scale, seed=args.eval_seed,
        pad_to_multiple_of=8,
    )
    ho_loss = float(spec.evaluate(
        case.model, params, case.material, heldout.banks)[0])

    from pinn_elastodynamics_tpu.eval.compare import compare_frames

    cmp = compare_frames(case, params, frames=[], dtype=np.float32)
    return {
        "config": name, "iters": it_total, "heldout_loss": ho_loss,
        "fem_mid": cmp["aggregate_mid"], "minutes": args.minutes,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--minutes", type=float, default=8.0)
    ap.add_argument("--configs", nargs="+",
                    default=["baseline", "fourier", "fourier_rar"])
    ap.add_argument("--max-t", type=float, default=8.0)
    ap.add_argument("--scale", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=1111)
    ap.add_argument("--eval-seed", type=int, default=999)
    ap.add_argument("--adam", type=int, default=500)
    ap.add_argument("--block", type=int, default=500)
    ap.add_argument("--fourier", type=int, default=64)
    ap.add_argument("--fourier-scale", type=float, default=1.0)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    mfile = open(os.path.join(args.out, "ablation_metrics.jsonl"), "a")

    def log(rec):
        rec["t"] = round(time.time(), 1)
        mfile.write(json.dumps(rec, default=float) + "\n")
        mfile.flush()
        print(rec, flush=True)

    # Crash-resume: a transient axon remote-compile fault must not void the
    # finished configs — resume skips configs already scored.
    res_path = os.path.join(args.out, "ablation.json")
    results = []
    if os.path.exists(res_path):
        with open(res_path) as f:
            results = json.load(f)
        done = {r["config"] for r in results}
        log({"event": "resume", "done": sorted(done)})
    else:
        done = set()
    for name in args.configs:
        if name in done:
            continue
        t0 = time.time()
        try:
            r = run_config(name, args, log)
        except Exception as e:
            log({"event": "config_fault", "config": name,
                 "error": repr(e)[:200]})
            # Dead JAX client: exit and let the outer loop relaunch us.
            mfile.close()
            sys.exit(3)
        r["wall_seconds"] = round(time.time() - t0, 1)
        results.append(r)
        log({"event": "config_done", **r})
        with open(res_path, "w") as f:
            json.dump(results, f, indent=2, default=float)
    mfile.close()


if __name__ == "__main__":
    main()
