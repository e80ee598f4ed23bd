"""Acceleration-supervised inverse run: the ρ-bias fix attempt (CPU f64).

The pure-f64 probe (scripts/inverse_f64_cpu.py, runs/inverse/
f64_cpu_metrics.jsonl) established the ρ bias is a property of the
objective: loss descends 26 % in honest f64 while ρ error oscillates at
~4.6 % with no trend toward truth.  ρ is identified only through
div σ = ρ·u_tt, where u_tt is the net's unanchored second derivative —
so this run adds DATA_TT: finite-difference accelerations from adjacent
FEM frames supervising the net's u_tt at the sensors
(cases/inverse.py::build(accel_weight=...)).  Ground truth E=2.5, ρ=1.0
(/root/reference/ElasticWaveConfined/ElasticWave.py:33-35); bar: ρ ≤ 2 %.

Usage:
  python scripts/inverse_accel.py [--minutes 40] [--scale 0.25]
      [--accel-weight 10.0]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/inverse")
    ap.add_argument("--minutes", type=float, default=40.0)
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--accel-weight", type=float, default=10.0)
    ap.add_argument("--block", type=int, default=200)
    ap.add_argument("--segment", type=int, default=50)
    ap.add_argument("--patience", type=int, default=400)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from pinn_elastodynamics_tpu.utils.cpucache import enable_cpu_compile_cache

    enable_cpu_compile_cache(jax)
    import jax.numpy as jnp
    import numpy as np

    from pinn_elastodynamics_tpu.cases.inverse import build
    from pinn_elastodynamics_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    mfile = open(os.path.join(args.out, "accel_metrics.jsonl"), "a")

    def log(rec):
        rec["t"] = round(time.time(), 1)
        mfile.write(json.dumps(rec) + "\n")
        mfile.flush()
        print(rec, flush=True)

    prob, banks = build(scale=args.scale, seed=1111, pad_to_multiple_of=8,
                        dtype=np.float64, accel_weight=args.accel_weight)

    ck_out = os.path.join(args.out, "accel.ckpt")
    ck_in = None
    for name in ("accel.ckpt", "f64_cpu.ckpt", "inverse_host.ckpt",
                 "inverse.ckpt"):
        p = os.path.join(args.out, name)
        if os.path.exists(p):
            ck_in = p
            break
    if ck_in is None:
        sys.exit(f"no resume checkpoint found in {args.out} "
                 "(expected one of accel/f64_cpu/inverse_host/inverse.ckpt); "
                 "run the forward inverse pipeline first")
    state = load_checkpoint(ck_in, jnp.float64)
    params = state["params"]
    # Resume curvature only from this objective's own checkpoint AND the
    # same accel weight: the DATA_TT term (and its weight) changes the
    # landscape, so any other engine's memory is stale.
    resume_carry = (state.get("carry")
                    if (ck_in.endswith("accel.ckpt")
                        and state.get("accel_weight") == args.accel_weight)
                    else None)
    log({"event": "start", "from": ck_in, "scale": args.scale,
         "accel_weight": args.accel_weight,
         "resumed_carry": resume_carry is not None,
         "minutes": args.minutes})

    fn = prob.loss_fn(banks)

    def em(p):
        return float(jnp.exp(p["log_E"])), float(jnp.exp(p["log_rho"]))

    def errs(p):
        E, rho = em(p)
        return abs(E - 2.5) / 2.5 * 100, abs(rho - 1.0) * 100

    t_end = time.time() + args.minutes * 60
    t0 = time.perf_counter()
    f0 = float(fn(params))
    e0, r0 = errs(params)
    log({"event": "baseline", "loss": f0, "E_err_pct": round(e0, 4),
         "rho_err_pct": round(r0, 4),
         "first_eval_s": round(time.perf_counter() - t0, 1)})

    carry, total, best = resume_carry, int(state.get("iters", 0)), f0
    while time.time() < t_end:
        res = minimize(fn, params, maxiter=args.block, segment=args.segment,
                       init_carry=carry, patience=args.patience)
        params, carry = res.params, res.carry
        total += res.n_iters
        f_now = float(res.final_loss)
        e_err, r_err = errs(params)
        log({"event": "block", "iters": total, "loss": f_now,
             "E_err_pct": round(e_err, 4), "rho_err_pct": round(r_err, 4)})
        if f_now < best:
            best = f_now
            save_checkpoint(ck_out, {"params": params, "loss": best,
                                     "iters": total, "carry": carry,
                                     "accel_weight": args.accel_weight})
        if res.n_iters < args.block:
            log({"event": "converged_or_patience", "iters": total})
            break

    E, rho = em(params)
    e_err, r_err = errs(params)
    verdict = ("accel supervision moves rho toward truth"
               if r_err < r0 - 0.5 else
               "accel supervision does not remove the rho bias")
    log({"event": "done", "loss": best, "iters": total, "E": E, "rho": rho,
         "E_err_pct": round(e_err, 4), "rho_err_pct": round(r_err, 4),
         "verdict": verdict})

    rec_path = os.path.join(args.out, "recovery.json")
    rec = json.load(open(rec_path)) if os.path.exists(rec_path) else {}
    rec["accel_probe"] = {
        "loss": best, "iters": total, "E": E, "rho": rho,
        "E_err_pct": e_err, "rho_err_pct": r_err, "verdict": verdict,
        "accel_weight": args.accel_weight,
        "start_loss": f0, "start_rho_err_pct": r0,
    }
    with open(rec_path, "w") as f:
        json.dump(rec, f, indent=2)
    mfile.close()


if __name__ == "__main__":
    main()
