"""f64 CPU pretraining of the plate's dist/part nets for any build variant.

The hard-BC composite u = P + D·ũ (train.py:382-387) enforces boundary
conditions ONLY through the dist net vanishing on them and the part net
matching their values — errors there are invisible to the uv training loss
(no boundary terms exist in the hard-BC formulation) but directly violate
the BCs of the final solution.  f32 line searches floor the tiny 4x20 nets
~4 orders above the reference's f64 pretraining quality (SURVEY.md §7.3),
so pretraining runs in float64 on the host CPU (x64 is CPU-only here).

Round-3 motivation: the from-scratch Fourier run self-pretrained dist in
f32/TPU and landed 2600x worse than the f64 pretrain used by the plain-
build runs (phase loss 5.8e-1 vs 2.2e-4 at scale 1000) — this regenerates
the pretrain for the *normalized* input pipeline the Fourier build turns on
(cases/plate_hole.py:49).

Usage:
  python scripts/pretrain_dist_part_f64.py --out runs/plate_fourier/pretrain_norm.ckpt \
      --fourier 64 --feature-scale 2.0 [--maxiter 20000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from pinn_elastodynamics_tpu.utils.cpucache import enable_cpu_compile_cache  # noqa: E402

enable_cpu_compile_cache(jax)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--fourier", type=int, default=0)
    ap.add_argument("--feature-scale", type=float, default=1.0)
    ap.add_argument("--maxiter", type=int, default=20000,
                    help="L-BFGS budget per net (reference: 20k, "
                         "train.py:220-236)")
    ap.add_argument("--seed", type=int, default=1111)
    ap.add_argument("--segment", type=int, default=200)
    args = ap.parse_args()

    from pinn_elastodynamics_tpu.cases import plate_hole
    from pinn_elastodynamics_tpu.cases.base import _phase_loss_fn
    from pinn_elastodynamics_tpu.train.checkpoint import save_checkpoint
    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    kwargs = dict(scale=1.0, pad_to_multiple_of=8, jet_impl="xla")
    if args.fourier:
        kwargs.update(fourier=args.fourier, fourier_scale=args.feature_scale)
    case = plate_hole.build(**kwargs)
    params = case.init_params(seed=args.seed, dtype=jnp.float64)

    report = {}
    for phase in case.phases:
        if phase.name == "uv":
            continue
        fn, sub, merge = _phase_loss_fn(case, phase, params)
        t0 = time.perf_counter()
        carry = None
        done = 0
        f_last = float(fn(sub))
        print(f"{phase.name}: start loss {f_last:.6e}", flush=True)
        while done < args.maxiter:
            block = min(2000, args.maxiter - done)
            res = minimize(fn, sub, maxiter=block, segment=args.segment,
                           init_carry=carry, patience=500,
                           ftol=phase.ftol)
            sub, carry = res.params, res.carry
            done += res.n_iters
            print(f"{phase.name}: {done} iters, loss "
                  f"{float(res.final_loss):.6e} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
            if res.n_iters < block:
                break
        params = merge(params, sub)
        report[phase.name] = {"loss": float(res.final_loss), "iters": done,
                              "wall_s": round(time.perf_counter() - t0, 1)}

    save_checkpoint(args.out, {"params": params, "pretrain_f64": report,
                               "build_kwargs": {k: v for k, v in
                                                kwargs.items()
                                                if k != "jet_impl"}})
    print(json.dumps(report), flush=True)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
