"""From-scratch wave-case training through the time-horizon curriculum.

Reproduces the reference's wave training runs (the artifacts behind its
shipped pickles) on TPU via train/curriculum.py:

  ElasticWaveInfinite:     10s -> 20s, 10k L-BFGS iters/stage, f32
                           (/root/reference/ElasticWaveInfinite/ElasticWave.py:636,742-747)
  ElasticWaveConfined:     7s -> 14s, reference budget 100k f64 iters
                           (/root/reference/ElasticWaveConfined/ElasticWave.py:884,1003)
  ElasticWaveSemiInfinite: 8s -> 16s (/root/reference/ElasticWaveSemiInfinite/
                           ElasticWave.py:670-672,780)

Usage:
  python scripts/train_wave.py --case wave_infinite --out runs/wave_infinite \
      --stages 10:10000 20:10000 [--adam 2000] [--eval-frames 20 40 60]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASES = ("wave_infinite", "wave_confined", "wave_semi_infinite")


def parse_stages(items, adam_iters, target):
    from pinn_elastodynamics_tpu.train.curriculum import Stage

    stages = []
    for it in items:
        t, _, n = it.partition(":")
        stages.append(Stage(max_t=float(t), maxiter=int(n),
                            adam_iters=adam_iters, adam_lr=1e-3,
                            target=target))
    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", choices=CASES, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--stages", nargs="+", required=True, metavar="T:ITERS")
    ap.add_argument("--adam", type=int, default=0,
                    help="Adam warmup iters per stage (lr 1e-3)")
    ap.add_argument("--target", type=float, default=-float("inf"),
                    help="early-stop loss per stage (e.g. the reference "
                         "pickle's loss on the same banks)")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=1111)
    ap.add_argument("--log-every", type=int, default=250)
    ap.add_argument("--eval-frames", type=int, nargs="*", default=None)
    ap.add_argument("--warm-start", default=None)
    ap.add_argument("--fourier", type=int, default=0,
                    help="random-Fourier-feature count on the uv net "
                         "(builder knob; 0 = plain MLP)")
    ap.add_argument("--fourier-scale", type=float, default=1.0)
    ap.add_argument("--bc", default=None, choices=("soft", "hard"),
                    help="confined/semi: 'hard' = analytic hard enforcement "
                         "of edge/IC/free-surface conditions "
                         "(models/analytic_bc.py); IC/FIX/NB terms drop "
                         "from the loss spec as exactly zero")
    args = ap.parse_args()

    import importlib

    import jax

    from pinn_elastodynamics_tpu.eval.compare import compare_frames
    from pinn_elastodynamics_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from pinn_elastodynamics_tpu.train.curriculum import run_time_curriculum
    from pinn_elastodynamics_tpu.utils.logging import MetricLogger

    mod = importlib.import_module(f"pinn_elastodynamics_tpu.cases.{args.case}")
    os.makedirs(args.out, exist_ok=True)
    logger = MetricLogger(os.path.join(args.out, "metrics.jsonl"), echo=True)
    logger.log({"event": "start", "case": args.case,
                "devices": [str(d) for d in jax.devices()],
                "stages": args.stages, "scale": args.scale})

    params = None
    if args.warm_start:
        params = load_checkpoint(args.warm_start)["params"]

    stages = parse_stages(args.stages, args.adam, args.target)
    builder_kwargs = dict(
        scale=args.scale, seed=args.seed,
        pad_to_multiple_of=len(jax.devices()),
    )
    if args.fourier:
        builder_kwargs.update(fourier=args.fourier,
                              fourier_scale=args.fourier_scale)
    if args.bc is not None:
        builder_kwargs["bc"] = args.bc
    params, summaries = run_time_curriculum(
        mod.build, stages, params=params, seed=args.seed,
        checkpoint_dir=args.out, resume=True, log_every=args.log_every,
        logger=logger, builder_kwargs=builder_kwargs,
    )
    save_checkpoint(os.path.join(args.out, f"{args.case}_final.ckpt"),
                    {"params": params, "summaries": summaries})

    # FEM comparison at the final horizon.
    case = mod.build(max_t=stages[-1].max_t, **builder_kwargs)
    frames = args.eval_frames
    if frames is None:
        frames = sorted(set(
            [case.n_frames // 4, case.n_frames // 2, (3 * case.n_frames) // 4]
        ))
    cmp = compare_frames(case, params, frames, dtype=np.float32)
    logger.log({"event": "fem_errors", **cmp["aggregate"]})
    with open(os.path.join(args.out, "fem_errors.json"), "w") as f:
        json.dump(cmp, f, indent=2, default=float)
    logger.close()


if __name__ == "__main__":
    main()
