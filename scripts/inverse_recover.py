"""Inverse-problem demo: recover E and rho from FEM displacement sensors.

BASELINE.json config #5 made real: starting from E=1.0, rho=0.5 (the true
values are the reference's E=2.5, rho=1.0 —
/root/reference/ElasticWaveConfined/ElasticWave.py:33-35), jointly optimize
the wave network and the log-material parameters against sparse FEM sensors
plus PDE residuals.  Staged: Adam fits the data term fast and pulls the
materials into the basin; L-BFGS polishes the joint problem.

Usage: python scripts/inverse_recover.py [--scale 0.25] [--out runs/inverse]
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
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--out", default="runs/inverse")
    ap.add_argument("--adam-iters", type=int, default=12000)
    ap.add_argument("--lbfgs-iters", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=1111)
    args = ap.parse_args()

    import jax.numpy as jnp

    from pinn_elastodynamics_tpu.cases.inverse import build
    from pinn_elastodynamics_tpu.train.adam import run_adam
    from pinn_elastodynamics_tpu.train.checkpoint import save_checkpoint
    from pinn_elastodynamics_tpu.train.lbfgs import minimize
    from pinn_elastodynamics_tpu.utils.logging import MetricLogger

    os.makedirs(args.out, exist_ok=True)
    logger = MetricLogger(os.path.join(args.out, "metrics.jsonl"), echo=True)

    problem, banks = build(scale=args.scale, seed=args.seed,
                           pad_to_multiple_of=8)
    params = problem.init_params(seed=args.seed)
    loss_aux = lambda p: problem.loss_and_aux(p, banks)
    loss = problem.loss_fn(banks)

    def report(tag, p):
        E = float(jnp.exp(p["log_E"]))
        rho = float(jnp.exp(p["log_rho"]))
        rec = {"event": tag, "E": E, "rho": rho,
               "E_err_pct": abs(E - 2.5) / 2.5 * 100,
               "rho_err_pct": abs(rho - 1.0) / 1.0 * 100}
        logger.log(rec)
        return rec

    logger.log({"event": "start", "scale": args.scale,
                "E_init": problem.E_init, "rho_init": problem.rho_init,
                "banks": {k: b.n_total for k, b in banks.items()}})
    report("init", params)

    t0 = time.perf_counter()
    for lr, iters in [(1e-3, args.adam_iters // 2),
                      (3e-4, args.adam_iters // 2)]:
        r = run_adam(loss_aux, params, lr, iters=iters, segment=200)
        params = r.params
        logger.log({"event": "adam_stage", "lr": lr, "iters": iters,
                    "loss": float(r.history["loss"][-1]),
                    "wall": time.perf_counter() - t0})
        report("adam", params)
        save_checkpoint(os.path.join(args.out, "inverse.ckpt"),
                        {"params": params})

    res = minimize(loss, params, maxiter=args.lbfgs_iters, segment=25,
                   log_every=250, patience=50)
    params = res.params
    logger.log({"event": "lbfgs", "iters": int(res.n_iters),
                "final_loss": float(res.final_loss),
                "wall": time.perf_counter() - t0})
    final = report("final", params)
    save_checkpoint(os.path.join(args.out, "inverse.ckpt"), {"params": params})
    with open(os.path.join(args.out, "recovery.json"), "w") as f:
        json.dump({**final, "loss": float(res.final_loss),
                   "wall_seconds": time.perf_counter() - t0,
                   "E_true": 2.5, "rho_true": 1.0,
                   "E_init": problem.E_init, "rho_init": problem.rho_init},
                  f, indent=2)
    logger.close()


if __name__ == "__main__":
    main()
