"""Precision lab: which extended-precision path descends past the f32 floor
on the REAL TPU, and at what cost?

Round-2 evidence (docs/STATUS_r2.md): the from-scratch f32 plate trajectory
wedges at loss ~0.029 — 41x above the reference's f64 optimum (7.08e-4,
/root/reference/PlateHoleQuarter/train/train.py:115 trains in float64) —
and CPU-f64 L-BFGS descends from the same point, so the floor is an
optimization-precision artifact.  Full-graph f64 on TPU hangs the axon
remote compile.  This lab times + descent-tests the candidate fixes from
the wedged checkpoint, one process per mode (x64 is process-global):

  f32    control: everything f32, Pallas jet (expected: flat)
  tail   f32 params/jets (Pallas) + float64 square-and-reduce tail
         (LossSpec.accum_dtype) — loss resolution only
  mixed  f64 params cast to f32 at the model boundary + f64 tail: L-BFGS
         two-loop recursion, curvature pairs, and line search all in f64
  f64    full f64, XLA jet, microbatched scan (graph small enough to
         dodge the compile hang?)

Usage: python scripts/precision_lab.py --mode {f32,tail,mixed,f64}
       [--iters 150] [--ckpt runs/plate_v2/f64_polish.ckpt]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["f32", "tail", "mixed", "f64"])
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--segment", type=int, default=25)
    ap.add_argument("--ckpt", default="runs/plate_v2/f64_polish.ckpt")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--microbatches", type=int, default=8)
    args = ap.parse_args()

    import jax

    if args.mode != "f32":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from pinn_elastodynamics_tpu.cases import plate_hole
    from pinn_elastodynamics_tpu.train.checkpoint import load_checkpoint
    from pinn_elastodynamics_tpu.train.lbfgs import minimize
    from pinn_elastodynamics_tpu.train.step import make_microbatched_loss_fn

    bank_dtype = np.float64 if args.mode == "f64" else np.float32
    param_dtype = jnp.float32 if args.mode in ("f32", "tail") else jnp.float64
    jet_impl = "xla" if args.mode == "f64" else "auto"

    t0 = time.perf_counter()
    case = plate_hole.build(
        scale=args.scale, dtype=bank_dtype,
        pad_to_multiple_of=args.microbatches, jet_impl=jet_impl,
    )
    params = load_checkpoint(args.ckpt, param_dtype)["params"]
    frozen = {k: v for k, v in params.items() if k != "uv"}
    phase = case.phases[-1]
    spec = phase.loss
    if args.mode in ("tail", "mixed"):
        spec = dataclasses.replace(spec, accum_dtype="float64")

    if args.mode == "f64":
        full = make_microbatched_loss_fn(
            case.model, spec, case.material,
            num_microbatches=args.microbatches,
        )

        def sub_fn(uv):
            return full({**frozen, "uv": uv}, case.banks)[0]
    else:
        def sub_fn_f32(uv):
            return spec.evaluate(
                case.model, {**frozen, "uv": uv}, case.material, case.banks
            )[0]

        if args.mode == "mixed":
            frozen32 = jax.tree.map(
                lambda a: a.astype(jnp.float32), frozen
            )
            frozen.update(frozen32)

            def sub_fn(uv64):
                uv32 = jax.tree.map(
                    lambda a: a.astype(jnp.float32), uv64
                )
                return sub_fn_f32(uv32)
        else:
            sub_fn = sub_fn_f32

    uv0 = params["uv"]
    print(f"[{args.mode}] setup {time.perf_counter()-t0:.1f}s; "
          f"bank_dtype={np.dtype(bank_dtype).name} "
          f"param_dtype={jnp.dtype(param_dtype).name} jet={jet_impl}",
          flush=True)

    t0 = time.perf_counter()
    f0 = float(jax.jit(sub_fn)(uv0))
    t_loss_compile = time.perf_counter() - t0
    print(f"[{args.mode}] loss at ckpt: {f0:.8f} "
          f"(first eval incl compile {t_loss_compile:.1f}s)", flush=True)

    seg_walls = []
    last_t = [time.perf_counter()]

    def on_segment(k, p, hist):
        now = time.perf_counter()
        w = now - last_t[0]
        last_t[0] = now
        seg_walls.append(w)
        print(f"[{args.mode}] it {k}: loss {hist[-1]:.8e}  segment {w:.1f}s "
              f"({w/max(len(hist),1):.2f} s/it)", flush=True)

    res = minimize(
        sub_fn, uv0, maxiter=args.iters, segment=args.segment,
        patience=10_000, on_segment=on_segment,
    )
    done = res.n_iters
    f_end = float(res.final_loss)
    steady = seg_walls[2:] or seg_walls[1:] or seg_walls
    out = {
        "mode": args.mode,
        "f0": f0,
        "f_end": f_end,
        "iters": done,
        "rel_drop": (f0 - f_end) / f0 if f0 else 0.0,
        "compile_s": round(t_loss_compile, 1),
        "first_segment_s": round(seg_walls[0], 1) if seg_walls else None,
        "steady_s_per_iter": round(
            sum(steady) / max(1, len(steady)) / args.segment, 3
        ) if steady else None,
    }
    print("PRECISION_LAB " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
