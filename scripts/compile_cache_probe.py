"""Probe: does JAX's persistent compilation cache work on this TPU stack?

The axon remote compiler's latency is erratic (identical graphs measured at
68 s and 31+ min on the same evening, docs/STATUS_r3.md item 3), and every
crash-relaunch of an endgame run pays a fresh compile.  If the persistent
cache (jax_compilation_cache_dir) captures executables across processes,
relaunches become cheap and the Fourier-semi L-BFGS compile hang only needs
to be paid once.

Run twice in separate processes: first populates, second should hit.

  python scripts/compile_cache_probe.py          # TPU, default cache dir
  python scripts/compile_cache_probe.py --tag x  # distinguishes runs in log
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = "/root/repo/.jax_cache"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="")
    ap.add_argument("--scale", type=float, default=0.1)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from pinn_elastodynamics_tpu.cases import plate_hole
    from pinn_elastodynamics_tpu.cases.base import _phase_loss_fn
    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    case = plate_hole.build(scale=args.scale, pad_to_multiple_of=8)
    params = case.init_params(seed=0)
    phase = case.phases[-1]
    sub_fn, sub, _ = _phase_loss_fn(case, phase, params)

    t0 = time.perf_counter()
    res = minimize(sub_fn, sub, maxiter=3, segment=3, patience=10)
    dt = time.perf_counter() - t0
    n_files = sum(len(fs) for _, _, fs in os.walk(CACHE_DIR))
    print(f"PROBE[{args.tag}] first-minimize wall {dt:.1f}s "
          f"loss={float(res.final_loss):.4f} cache_files={n_files}",
          flush=True)


if __name__ == "__main__":
    main()
