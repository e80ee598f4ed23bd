"""Plate-hole endgame: host-f64 L-BFGS over the f32 TPU Pallas step.

The round-3 extended-precision engine (VERDICT r2 next-step #1).  Device =
one compiled f32 value+grad emitting per-chunk loss sums; host = float64
two-loop + strong-Wolfe zoom (train/lbfgs_host.py).  Targets the reference's
f64-trained optimum (uv-phase loss 7.08e-4 on our banks,
/root/reference/PlateHoleQuarter/train/train.py:115,219-247).

Usage:
  python scripts/host_endgame.py CKPT_IN CKPT_OUT --hours 1.5 \
      [--target 7.08e-4] [--case plate_hole] [--chunk 512]
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
    ap.add_argument("ckpt_in")
    ap.add_argument("ckpt_out")
    ap.add_argument("--hours", type=float, default=1.5)
    ap.add_argument("--target", type=float, default=7.08e-4)
    ap.add_argument("--case", default="plate_hole",
                    help="case module name (plate_hole, wave_confined, "
                         "wave_semi_infinite, wave_infinite)")
    ap.add_argument("--max-t", type=float, default=None,
                    help="horizon override for wave cases (final curriculum "
                         "horizon)")
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--memory", type=int, default=50)
    ap.add_argument("--patience", type=int, default=200)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--build-kwargs", default=None,
                    help='extra case-builder kwargs as JSON, e.g. '
                         '\'{"fourier": 64, "fourier_scale": 2.0}\'')
    args = ap.parse_args()

    import importlib

    import jax.numpy as jnp

    from pinn_elastodynamics_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from pinn_elastodynamics_tpu.train.lbfgs_host import (
        make_host_phase_vg,
        minimize_host,
    )

    mod = importlib.import_module(
        f"pinn_elastodynamics_tpu.cases.{args.case}")

    mpath = args.metrics or os.path.join(
        os.path.dirname(args.ckpt_out) or ".", "host_endgame.jsonl")
    mfile = open(mpath, "a")

    def log(rec):
        rec["t"] = round(time.time(), 1)
        mfile.write(json.dumps(rec) + "\n")
        mfile.flush()
        print(rec, flush=True)

    build_kwargs = dict(scale=1.0, pad_to_multiple_of=8)
    if args.max_t is not None:
        build_kwargs["max_t"] = args.max_t
    if args.build_kwargs:
        build_kwargs.update(json.loads(args.build_kwargs))
    case = mod.build(**build_kwargs)
    params = load_checkpoint(args.ckpt_in, jnp.float32)["params"]
    phase = case.phases[-1]
    from pinn_elastodynamics_tpu.cases.base import _phase_loss_fn

    _, _, merge = _phase_loss_fn(case, phase, params)
    host_vg, x0, unravel32 = make_host_phase_vg(
        case, phase, params, chunk_size=args.chunk
    )
    # Full-precision resume: the raw pickle keeps x64_flat as float64
    # (load_checkpoint would cast it with the rest of the tree).
    import pickle

    with open(args.ckpt_in, "rb") as f:
        raw = pickle.load(f)
    if isinstance(raw, dict) and "x64_flat" in raw:
        x0 = np.asarray(raw["x64_flat"], np.float64)
        print(f"resuming from x64_flat (f64, {x0.size} params)", flush=True)

    from pinn_elastodynamics_tpu.utils import compileguard

    t0 = time.perf_counter()
    # First eval carries the chunk-sum value+grad compile; bound it against
    # the erratic axon remote-compile hang (PINN_COMPILE_DEADLINE env var).
    with compileguard.guard("host-engine value+grad compile"):
        f0, g0 = host_vg(x0)
    log({"event": "start", "loss": f0, "grad_norm": float(np.linalg.norm(g0)),
         "first_eval_s": round(time.perf_counter() - t0, 1),
         "n_params": int(x0.size), "hours": args.hours})

    state = {"best": f0, "best_x": x0.copy(), "last_log": time.perf_counter(),
             "iters_at_log": 0}

    def save_best(x, f, k):
        sub32 = unravel32(jnp.asarray(np.asarray(x, np.float32)))
        full = merge(params, sub32)
        save_checkpoint(args.ckpt_out, {
            "params": full, "loss": f, "iters": k,
            "x64_flat": np.asarray(x, np.float64),
        })

    def on_iter(k, x, f):
        if f < state["best"]:
            state["best"] = f
            state["best_x"] = x.copy()
        if k % args.log_every == 0:
            now = time.perf_counter()
            rate = (k - state["iters_at_log"]) / max(
                now - state["last_log"], 1e-9)
            state["last_log"], state["iters_at_log"] = now, k
            log({"event": "iter", "k": k, "loss": f, "best": state["best"],
                 "iters_per_sec": round(rate, 2)})
        if k % args.ckpt_every == 0:
            save_best(state["best_x"], state["best"], k)

    init_carry = raw.get("host_carry") if isinstance(raw, dict) else None
    if init_carry:
        log({"event": "carry_resume", "pairs": len(init_carry["S"])})
    res = minimize_host(
        host_vg, x0, maxiter=10_000_000, memory_size=args.memory,
        patience=args.patience, target=args.target,
        wall_budget=args.hours * 3600, on_iter=on_iter,
        init_carry=init_carry,
    )
    if res.final_loss < state["best"]:
        state["best"], state["best_x"] = res.final_loss, res.x
    save_best(state["best_x"], state["best"], res.n_iters)
    # Persist curvature memory for cross-process resumption (only meaningful
    # if the run ended AT the best point; a best-point jump invalidates it).
    if res.final_loss <= state["best"] * (1 + 1e-12):
        with open(args.ckpt_out, "rb") as f:
            ck = pickle_load_raw(f)
        ck["host_carry"] = res.carry
        save_checkpoint(args.ckpt_out, ck)
    log({"event": "done", "loss": state["best"], "iters": res.n_iters,
         "evals": res.n_evals, "status": res.converged,
         "evals_per_iter": round(res.n_evals / max(res.n_iters, 1), 2)})
    mfile.close()


def pickle_load_raw(f):
    import pickle

    return pickle.load(f)


if __name__ == "__main__":
    main()
