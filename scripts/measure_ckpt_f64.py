"""Append a host-f64 loss measurement of a checkpoint to a metrics JSONL.

The r5 semi wedge A/B records pure-L-BFGS descent; the freezeb arm's
trajectory lives in f32_block events (the sprint never pauses for a host
measure before its wall timeout), so scripts/pick_wedge_flags.py — which per
ADVICE r4 trusts only f64-measured events — would under-credit the arm by
~80 percentage points of relative drop.  This script closes that gap with a
ground-truth measurement: load the checkpoint's merged params, rebuild the
identical case, and evaluate the host-f64 chunk-sum loss on the CPU backend
(safe while the single-tenant TPU runs another arm).

Usage:
  python scripts/measure_ckpt_f64.py CKPT --case wave_semi_infinite \
      --max-t 16 --build-kwargs '{"fourier":64,"fourier_scale":1.0,"bc":"hard"}' \
      --metrics runs/wave_semi_fourier/ab_freezeb_metrics.jsonl \
      --note final_ckpt_f64_cpu
"""

import argparse
import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--case", default="wave_semi_infinite")
    ap.add_argument("--max-t", type=float, default=None)
    ap.add_argument("--build-kwargs", default=None)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--metrics", default=None,
                    help="JSONL to append the 'measure' event to")
    ap.add_argument("--note", default="ckpt_f64_cpu")
    ap.add_argument("--tpu", action="store_true",
                    help="allow the default (TPU) backend; default forces CPU "
                         "so this can run while the chip is busy")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pinn_elastodynamics_tpu.train.checkpoint import load_checkpoint
    from pinn_elastodynamics_tpu.train.lbfgs_host import make_host_phase_vg

    mod = importlib.import_module(
        f"pinn_elastodynamics_tpu.cases.{args.case}")
    build_kwargs = dict(scale=1.0, pad_to_multiple_of=8)
    if args.max_t is not None:
        build_kwargs["max_t"] = args.max_t
    if args.build_kwargs:
        build_kwargs.update(json.loads(args.build_kwargs))
    case = mod.build(**build_kwargs)
    phase = case.phases[-1]
    params = load_checkpoint(args.ckpt, jnp.float32)["params"]
    host_vg, x0, _unravel32 = make_host_phase_vg(
        case, phase, params, chunk_size=args.chunk)
    t0 = time.time()
    f64, _g = host_vg(x0)
    rec = {"event": "measure", "note": args.note, "loss_f64": float(f64),
           "ckpt": args.ckpt, "backend": jax.devices()[0].platform,
           "eval_s": round(time.time() - t0, 1), "t": round(time.time(), 1)}
    print(json.dumps(rec), flush=True)
    if args.metrics:
        with open(args.metrics, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
