"""Regenerate committed run artifacts from their checkpoints.

Every committed run directory must carry a fem_errors.json that matches its
checkpoint (VERDICT r1 #9: a stale diverged evaluation contradicted the
commit message).  Re-evaluates each known run dir's best checkpoint against
the FEM ground truth and rewrites fem_errors.json (+ hole-edge metrics for
the plate case).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    only = sys.argv[1:]  # optional run-dir filter (substring match)

    import jax.numpy as jnp

    from pinn_elastodynamics_tpu.cases import (
        plate_hole,
        wave_confined,
        wave_infinite,
        wave_semi_infinite,
    )
    from pinn_elastodynamics_tpu.eval.compare import (
        compare_frames,
        hole_edge_errors,
    )
    from pinn_elastodynamics_tpu.train.checkpoint import load_checkpoint

    jobs = [
        # (run dir, ckpt, case builder, builder kwargs, frames)
        # Each run dir's BEST checkpoint (r3: hybrid/host endgame outputs
        # supersede the curriculum finals they started from).
        ("runs/plate_v2", "hybrid_best.ckpt", plate_hole, {},
         [10, 20, 30, 50, 60, 70]),
        ("runs/wave_infinite", "wave_infinite_final.ckpt", wave_infinite,
         {"max_t": 20.0}, [10, 20, 30, 40, 60]),
        ("runs/wave_semi", "endgame_best.ckpt",
         wave_semi_infinite, {"max_t": 16.0}, [8, 16, 24, 32, 48]),
        ("runs/wave_confined", "host_best.ckpt", wave_confined,
         {"max_t": 14.0}, [6, 12, 18, 24, 40]),
        # r4 structural-lever runs (first existing checkpoint wins:
        # endgame output > curriculum final > last stage > live).
        ("runs/plate_analytic",
         ("hybrid_best.ckpt", "best.ckpt"), plate_hole,
         {"fourier": 64, "fourier_scale": 2.0, "bc": "analytic"},
         [10, 20, 30, 50, 60, 70]),
        ("runs/wave_semi_fourier",
         ("hybrid_best2.ckpt", "ab_freezeb.ckpt", "hybrid_best.ckpt",
          "wave_semi_infinite_final.ckpt", "stage_1_T16.ckpt",
          "stage_1_live.ckpt", "stage_0_T8.ckpt", "stage_0_live.ckpt"),
         wave_semi_infinite,
         {"max_t": 16.0, "fourier": 64, "fourier_scale": 1.0, "bc": "hard"},
         [8, 16, 24, 32, 48]),
        ("runs/wave_confined_fourier",
         ("hybrid_best.ckpt",
          "wave_confined_final.ckpt", "stage_1_T14.ckpt",
          "stage_1_live.ckpt", "stage_0_T7.ckpt", "stage_0_live.ckpt"),
         wave_confined,
         {"max_t": 14.0, "fourier": 64, "fourier_scale": 1.0, "bc": "hard"},
         [6, 12, 18, 24, 40]),
    ]
    for run_dir, ck, mod, kwargs, frames in jobs:
        if only and not any(o in run_dir for o in only):
            continue
        if isinstance(ck, tuple):
            ck = next(
                (c for c in ck
                 if os.path.exists(os.path.join(run_dir, c))), ck[-1]
            )
        path = os.path.join(run_dir, ck)
        if not os.path.exists(path):
            print(f"skip {path} (absent)")
            continue
        case = mod.build(scale=0.002, pad_to_multiple_of=1, **kwargs)
        params = load_checkpoint(path, jnp.float32)["params"]
        cmp = compare_frames(case, params, frames, dtype=np.float32)
        cmp["checkpoint"] = ck
        if mod is plate_hole:
            cmp["hole_edge"] = hole_edge_errors(
                case, params, dtype=np.float64
            )
        out = os.path.join(run_dir, "fem_errors.json")
        with open(out, "w") as f:
            json.dump(cmp, f, indent=2, default=float)
        print(out, json.dumps(cmp["aggregate"], default=float))


if __name__ == "__main__":
    main()
