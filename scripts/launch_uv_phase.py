"""Assemble a warm-start checkpoint: f64 CPU-pretrained dist/part + chosen uv.

The tiny dist/part networks are pretrained in float64 on the host (f32 line
searches floor out ~4 orders above the reference's pretraining loss;
SURVEY.md §7.3) and cast to f32 here; the uv phase then trains on TPU.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
from pinn_elastodynamics_tpu.utils.cpucache import enable_cpu_compile_cache  # noqa: E402

enable_cpu_compile_cache(jax)

import jax.numpy as jnp  # noqa: E402

from pinn_elastodynamics_tpu.train.checkpoint import (  # noqa: E402
    load_checkpoint,
    save_checkpoint,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain", default="runs/pretrain_f64.ckpt")
    ap.add_argument("--uv-from", default=None,
                    help="optional checkpoint whose uv net to reuse")
    ap.add_argument("--out", default="runs/warmstart_f32.ckpt")
    args = ap.parse_args()

    state = load_checkpoint(args.pretrain, dtype=jnp.float32)
    params = state["params"]
    if args.uv_from:
        other = load_checkpoint(args.uv_from, dtype=jnp.float32)
        params["uv"] = other["params"]["uv"]
    save_checkpoint(args.out, {"params": params})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
