"""Continue an inverse recovery from runs/inverse/inverse.ckpt with low-LR
Adam stages (tightens E/rho after the coarse joint fit)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from pinn_elastodynamics_tpu.cases.inverse import build
from pinn_elastodynamics_tpu.train.adam import run_adam
from pinn_elastodynamics_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "runs/inverse"
    prob, banks = build(scale=0.25, seed=1111, pad_to_multiple_of=8)
    params = load_checkpoint(os.path.join(out, "inverse.ckpt"),
                             jnp.float32)["params"]
    la = lambda p: prob.loss_and_aux(p, banks)
    t0 = time.perf_counter()
    for lr, iters in [(1e-4, 16000), (3e-5, 16000)]:
        r = run_adam(la, params, lr, iters=iters, segment=200)
        params = r.params
        E = float(jnp.exp(params["log_E"]))
        rho = float(jnp.exp(params["log_rho"]))
        print({"lr": lr, "loss": float(r.history["loss"][-1]),
               "E": round(E, 4), "rho": round(rho, 4),
               "E_err_pct": round(abs(E - 2.5) / 2.5 * 100, 2),
               "rho_err_pct": round(abs(rho - 1.0) * 100, 2),
               "wall": round(time.perf_counter() - t0)}, flush=True)
        save_checkpoint(os.path.join(out, "inverse.ckpt"),
                        {"params": params})
    E = float(jnp.exp(params["log_E"]))
    rho = float(jnp.exp(params["log_rho"]))
    with open(os.path.join(out, "recovery.json"), "w") as f:
        json.dump({"E": E, "rho": rho, "E_true": 2.5, "rho_true": 1.0,
                   "E_err_pct": abs(E - 2.5) / 2.5 * 100,
                   "rho_err_pct": abs(rho - 1.0) * 100,
                   "E_init": 1.0, "rho_init": 0.5,
                   "wall_seconds": time.perf_counter() - t0,
                   "continued": True}, f, indent=2)
    print("done", flush=True)


if __name__ == "__main__":
    main()
