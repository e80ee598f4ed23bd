"""Plateau escape: low-LR Adam stages from an L-BFGS plateau, then polish.

At f32 plateaus the zoom line search burns ~50 loss evaluations per tiny
L-BFGS step; Adam makes progress per single evaluation.  This driver runs
staged low-LR Adam from the newest plate checkpoint (uv net only, hard-BC
nets frozen), then an L-BFGS polish, saving checkpoints between stages.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax.numpy as jnp
import numpy as np

from pinn_elastodynamics_tpu.cases import plate_hole
from pinn_elastodynamics_tpu.cases.base import _phase_loss_fn
from pinn_elastodynamics_tpu.eval.compare import frame_errors
from pinn_elastodynamics_tpu.train.adam import run_adam
from pinn_elastodynamics_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from pinn_elastodynamics_tpu.train.lbfgs import minimize


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "runs/plate_v2/plate_hole_quarter_live.ckpt"
    out = sys.argv[2] if len(sys.argv) > 2 else "runs/plate_v2/adam_escape.ckpt"

    case = plate_hole.build(scale=1.0, pad_to_multiple_of=8,
                            jet_impl="pallas")
    params = load_checkpoint(src, jnp.float32)["params"]
    phase = case.phases[-1]
    sub_fn, sub0, merge = _phase_loss_fn(case, phase, params)
    loss_aux = lambda sub: (sub_fn(sub), {})

    best = float(sub_fn(sub0))
    print(f"start loss: {best:.5f}", flush=True)
    sub = sub0

    def save_if_better(cand, loss_val):
        # Never overwrite the checkpoint with a worse model — Adam stages
        # can wander upward before the polish recovers.
        nonlocal best
        if loss_val < best:
            best = loss_val
            save_checkpoint(out, {"params": merge(params, cand)})
            print(f"  checkpointed (loss {loss_val:.5f})", flush=True)

    for lr, iters in [(1e-4, 20000), (3e-5, 20000), (1e-5, 20000)]:
        t0 = time.perf_counter()
        r = run_adam(loss_aux, sub, lr, iters=iters, segment=200)
        sub = r.params
        last = float(r.history["loss"][-1])
        print(f"adam lr={lr}: {iters} iters in {time.perf_counter()-t0:.0f}s,"
              f" loss {float(r.history['loss'][0]):.5f} -> {last:.5f}",
              flush=True)
        save_if_better(sub, last)

    res = minimize(sub_fn, sub, maxiter=3000, segment=25, log_every=500)
    sub = res.params
    print(f"lbfgs polish: iters={res.n_iters} "
          f"final={float(res.final_loss):.6f}", flush=True)
    save_if_better(sub, float(res.final_loss))
    full = merge(params, sub)

    for frame in (10, 20, 60):
        errs = frame_errors(case, full, frame, dtype=np.float32)
        print(f"frame {frame}:", {k: round(v, 3) for k, v in errs.items()},
              flush=True)


if __name__ == "__main__":
    main()
