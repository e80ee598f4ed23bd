"""Evidence run: does f64 descend where the f32 plate basin floors (~0.029)?

The from-scratch f32 plate trajectory wedges near loss 0.029 (zoom line
searches fail; see docs/STATUS_r2.md).  f64 on TPU is unavailable (axon
remote-compile hangs on the full-scale f64 value+grad), and full-scale f64
on CPU is ~1 min/iter.  This runs CPU f64 L-BFGS from the wedged f32
checkpoint on reduced banks (same LHS distribution, so the loss agrees in
expectation) to test the hypothesis that the floor is an f32 optimization
artifact, not a property of the basin — the decision gate for investing in
an f64 path next round.

Usage: python scripts/f64_cpu_polish.py [--scale 0.25] [--minutes 35]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--minutes", type=float, default=35.0)
    ap.add_argument("--ckpt", default="runs/plate_v2/adam_escape.ckpt")
    ap.add_argument("--out", default="runs/plate_v2/f64_polish.ckpt")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from pinn_elastodynamics_tpu.utils.cpucache import enable_cpu_compile_cache

    enable_cpu_compile_cache(jax)
    import jax.numpy as jnp
    import numpy as np

    from pinn_elastodynamics_tpu.cases import plate_hole
    from pinn_elastodynamics_tpu.cases.base import _phase_loss_fn
    from pinn_elastodynamics_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    case = plate_hole.build(scale=args.scale, pad_to_multiple_of=8,
                            dtype=np.float64, jet_impl="xla")
    params = load_checkpoint(args.ckpt, jnp.float64)["params"]
    phase = case.phases[-1]
    sub_fn, sub0, merge = _phase_loss_fn(case, phase, params)
    f0 = float(jax.jit(sub_fn)(sub0))
    print(f"f64 loss at f32 checkpoint (scale {args.scale}): {f0:.6f}",
          flush=True)

    t_end = time.time() + args.minutes * 60
    carry, total, res = None, 0, None
    while res is None or time.time() < t_end:
        # First block runs unconditionally so the report below always has a
        # result even with --minutes <= 0.
        res = minimize(sub_fn, sub0 if carry is None else res.params,
                       maxiter=200, segment=25, init_carry=carry,
                       patience=100)
        carry = res.carry
        total += res.n_iters
        print(f"f64 it {total}: loss {float(res.final_loss):.6e}", flush=True)
        save_checkpoint(args.out, {"params": merge(params, res.params)})
        if res.n_iters == 0:
            break
    rel = (f0 - float(res.final_loss)) / f0
    print(f"f64 verdict: {total} iters, {f0:.4f} -> "
          f"{float(res.final_loss):.6f} ({100*rel:.1f}% drop) — "
          f"{'DESCENDS past the f32 floor' if rel > 0.02 else 'floored too'}",
          flush=True)


if __name__ == "__main__":
    main()
