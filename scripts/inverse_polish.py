"""Inverse-problem polish: carried L-BFGS on the joint (net, E, rho) fit +
identifiability sensitivity study.

r2 left rho at 4.6% (E 0.01%) with the low-LR Adam continuation still
improving (VERDICT r2 weak-point #6).  Adam's fixed step is the wrong tool
for the narrow joint valley; carried L-BFGS tightens both.  The sensitivity
table (sensor count / stress sensing / data weight) documents WHY rho is the
hard parameter: it is identified through the momentum residual against
interpolated acceleration, whereas E is anchored directly by the stress
sensors through the constitutive residual.

Usage: python scripts/inverse_polish.py [--out runs/inverse] [--minutes 22]
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
    ap.add_argument("--out", default="runs/inverse")
    ap.add_argument("--minutes", type=float, default=22.0)
    ap.add_argument("--sens-iters", type=int, default=2000)
    ap.add_argument("--skip-sensitivity", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from pinn_elastodynamics_tpu.cases.inverse import build
    from pinn_elastodynamics_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    prob, banks = build(scale=0.25, seed=1111, pad_to_multiple_of=8)
    params = load_checkpoint(os.path.join(args.out, "inverse.ckpt"),
                             jnp.float32)["params"]

    def em(p):
        return (float(jnp.exp(p["log_E"])), float(jnp.exp(p["log_rho"])))

    def errs(p):
        E, rho = em(p)
        return (abs(E - 2.5) / 2.5 * 100, abs(rho - 1.0) * 100)

    loss_fn = prob.loss_fn(banks)
    t_end = time.time() + args.minutes * 60
    t0 = time.perf_counter()
    # Watchdog-safe warmup, then carried blocks.
    res = minimize(loss_fn, params, maxiter=60, segment=10, patience=100)
    params, carry = res.params, res.carry
    total = res.n_iters
    print({"warmup_loss": float(res.final_loss), "E_rho": em(params)},
          flush=True)
    while time.time() < t_end:
        res = minimize(loss_fn, params, maxiter=400, segment=50,
                       init_carry=carry, patience=100)
        params, carry = res.params, res.carry
        total += res.n_iters
        e_err, r_err = errs(params)
        print({"iters": total, "loss": float(res.final_loss),
               "E_err_pct": round(e_err, 3), "rho_err_pct": round(r_err, 3),
               "wall": round(time.perf_counter() - t0)}, flush=True)
        save_checkpoint(os.path.join(args.out, "inverse.ckpt"),
                        {"params": params})
        if res.n_iters < 400:
            break

    E, rho = em(params)
    e_err, r_err = errs(params)
    out = {
        "E": E, "rho": rho, "E_true": 2.5, "rho_true": 1.0,
        "E_err_pct": e_err, "rho_err_pct": r_err,
        "E_init": 1.0, "rho_init": 0.5,
        "method": "adam coarse + low-LR adam + carried L-BFGS polish",
        "lbfgs_polish_iters": total,
        "wall_seconds": time.perf_counter() - t0,
    }

    if not args.skip_sensitivity:
        # Each config: short carried L-BFGS from the SAME polished state with
        # modified supervision; reports where E/rho drift — the
        # identifiability fingerprint.
        from pinn_elastodynamics_tpu.banks import PointBank

        def with_sensors(transform_values, weights=None):
            b = dict(banks)
            sens = banks["sensors"]
            vals = transform_values(dict(sens.values))
            b["sensors"] = PointBank(xyt=sens.xyt, mask=sens.mask,
                                     values=vals)
            p2 = prob if weights is None else __import__(
                "dataclasses").replace(prob, weights=weights)
            return p2.loss_fn(b)

        sens_configs = {
            "half_sensors": None,  # handled via mask below
            "no_stress_sensors": with_sensors(
                lambda v: {k: x for k, x in v.items() if k != "s"}),
            "double_data_weight": with_sensors(
                lambda v: v,
                weights=(("f_uv", 5.0), ("f_s", 5.0), ("DATA", 20.0),
                         ("DATA_S", 20.0))),
        }
        sens = banks["sensors"]
        half_mask = np.asarray(sens.mask).copy()
        keep = np.nonzero(half_mask)[0][::2]
        hm = np.zeros_like(half_mask)
        hm[keep] = 1.0
        b_half = dict(banks)
        b_half["sensors"] = PointBank(xyt=sens.xyt,
                                      mask=jnp.asarray(hm, jnp.float32),
                                      values=sens.values)
        sens_configs["half_sensors"] = prob.loss_fn(b_half)

        table = {}
        for name, fn in sens_configs.items():
            r0 = minimize(fn, params, maxiter=40, segment=10, patience=100)
            r1 = minimize(fn, r0.params, maxiter=args.sens_iters - 40,
                          segment=50, init_carry=r0.carry, patience=100)
            e_e, r_e = errs(r1.params)
            table[name] = {
                "loss": float(r1.final_loss),
                "E_err_pct": round(e_e, 3), "rho_err_pct": round(r_e, 3),
            }
            print({name: table[name]}, flush=True)
        out["sensitivity"] = table

    with open(os.path.join(args.out, "recovery.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("done", out, flush=True)


if __name__ == "__main__":
    main()
