"""Probe: compile time + eval time of the extended-precision value_and_grad
on the real TPU (f64 params cast to f32 at the model boundary, Pallas jets,
f64 reduction tail).  This is the device-side unit of the host-driven f64
L-BFGS plan; the full f64 optimizer graph hangs the axon remote compile, so
the optimizer math moves to the host and only this function runs on device.

Usage: python scripts/vg_compile_probe.py [--mode mixed|tail32]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="mixed", choices=["mixed", "tail32"])
    ap.add_argument("--ckpt", default="runs/plate_v2/f64_polish.ckpt")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from pinn_elastodynamics_tpu.cases import plate_hole
    from pinn_elastodynamics_tpu.cases.base import mixed_precision_phase_fn
    from pinn_elastodynamics_tpu.train.checkpoint import load_checkpoint

    t0 = time.perf_counter()
    case = plate_hole.build(scale=1.0, pad_to_multiple_of=8)
    params = load_checkpoint(args.ckpt, jnp.float64)["params"]
    phase = case.phases[-1]
    sub_fn, sub0, _ = mixed_precision_phase_fn(case, phase, params)
    if args.mode == "tail32":
        # f32 params, f64 tail only: grads come back f32.
        sub0 = jax.tree.map(lambda a: a.astype(jnp.float32), sub0)
    print(f"setup {time.perf_counter()-t0:.1f}s", flush=True)

    vg = jax.jit(jax.value_and_grad(sub_fn))
    t0 = time.perf_counter()
    f, g = vg(sub0)
    jax.block_until_ready(g)
    print(f"[{args.mode}] value_and_grad compile+first: "
          f"{time.perf_counter()-t0:.1f}s  f={float(f):.8f}", flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        f, g = vg(sub0)
        jax.block_until_ready(g)
        print(f"[{args.mode}] eval {time.perf_counter()-t0:.3f}s", flush=True)
    gflat = jax.flatten_util.ravel_pytree(g)[0]
    print(f"[{args.mode}] grad dtype {gflat.dtype} norm "
          f"{float(jnp.linalg.norm(gflat)):.6e}", flush=True)


if __name__ == "__main__":
    main()
