"""MFU / step-rate experiment (VERDICT r3 weak #7 / next #8).

Measures where the training step's time actually goes and whether cheaper
MXU passes buy wall clock, at reference scale (~104k collocation points,
/root/reference/PlateHoleQuarter/train/train.py:912-921):

  * component profile — jet forward vs loss vs value+grad vs L-BFGS iter;
  * matmul-precision arms — HIGHEST (6 bf16 MXU passes, production) vs
    HIGH (3) vs DEFAULT (1): throughput, and 300-iter carried L-BFGS
    descent from the same checkpoint (does the line search still certify?);
  * flagship config (analytic BC + Fourier) vs plain composite.

Each arm runs in its own subprocess because PINN_KERNEL_PRECISION is read
at trace time (kernels/fused_jet.py::kernel_precision) and the chip is
single-tenant (serial arms).  Results append to runs/mfu/results.jsonl.

Usage (idle host, nothing else on the TPU):
  python scripts/mfu_experiment.py                 # all arms
  python scripts/mfu_experiment.py --arm profile   # one arm, in-process
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "runs/mfu/results.jsonl"


def _emit(rec):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    rec["t"] = round(time.time(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def _case_and_loss(flagship: bool, scale: float = 1.0):
    from pinn_elastodynamics_tpu.cases import plate_hole
    from pinn_elastodynamics_tpu.cases.base import _phase_loss_fn

    kw = dict(scale=scale, pad_to_multiple_of=8)
    if flagship:
        kw.update(fourier=64, fourier_scale=2.0, bc="analytic")
    import numpy as np

    case = plate_hole.build(**kw)
    params = case.init_params(seed=0)
    phase = case.phases[-1]
    sub_fn, sub, merge = _phase_loss_fn(case, phase, params)
    n_col = int(np.sum(np.asarray(case.banks["collocation"].mask)))
    return case, sub_fn, sub, merge, params, n_col


def _median_rate(fn, arg, n_col, reps=20):
    import jax
    import numpy as np

    jax.block_until_ready(fn(arg))
    jax.block_until_ready(fn(arg))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        ts.append(time.perf_counter() - t0)
    sec = float(np.median(ts))
    return sec, n_col / sec


def arm_profile(flagship: bool, scale: float = 1.0):
    """Component-level timing: where does the value+grad step go?"""
    import jax

    case, sub_fn, sub, merge, params, n_col = _case_and_loss(flagship, scale)
    label = "flagship" if flagship else "plain"
    xyt = case.banks["collocation"].xyt

    jet = jax.jit(lambda p: case.model.jet(merge(params, p), xyt).f)
    s, r = _median_rate(jet, sub, n_col)
    _emit({"arm": f"profile/{label}", "what": "jet_forward",
           "sec": round(s, 5), "evals_per_sec": round(r, 1)})

    loss = jax.jit(sub_fn)
    s, r = _median_rate(loss, sub, n_col)
    _emit({"arm": f"profile/{label}", "what": "loss_only",
           "sec": round(s, 5), "evals_per_sec": round(r, 1)})

    vg = jax.jit(jax.value_and_grad(sub_fn))
    s, r = _median_rate(vg, sub, n_col)
    _emit({"arm": f"profile/{label}", "what": "value_and_grad",
           "sec": round(s, 5), "evals_per_sec": round(r, 1),
           "precision_env": os.environ.get("PINN_KERNEL_PRECISION",
                                           "highest")})


def arm_vg(flagship: bool):
    """value+grad throughput only (for precision-arm subprocesses)."""
    import jax

    case, sub_fn, sub, merge, params, n_col = _case_and_loss(flagship)
    vg = jax.jit(jax.value_and_grad(sub_fn))
    s, r = _median_rate(vg, sub, n_col)
    _emit({"arm": "vg", "flagship": flagship,
           "precision_env": os.environ.get("PINN_KERNEL_PRECISION",
                                           "highest"),
           "sec": round(s, 5), "evals_per_sec": round(r, 1)})


def arm_descent(ckpt: str, iters: int):
    """Carried L-BFGS descent from a checkpoint under the env precision.

    Discriminates throughput wins that survive training from ones the line
    search rejects (docs/ARCHITECTURE.md: DEFAULT stalls; HIGH untested).
    """
    from pinn_elastodynamics_tpu.train.checkpoint import load_checkpoint
    from pinn_elastodynamics_tpu.train.lbfgs import minimize

    flagship = "analytic" in ckpt or "fourier" in ckpt
    case, sub_fn, sub, merge, params, n_col = _case_and_loss(flagship)
    state = load_checkpoint(ckpt)
    full = state["params"]
    phase = case.phases[-1]
    sub = full[phase.trainable] if phase.trainable is not None else full
    t0 = time.time()
    res = minimize(sub_fn, sub, maxiter=iters, segment=25,
                   init_carry=state.get("carry"), patience=iters)
    wall = time.time() - t0
    _emit({"arm": "descent",
           "precision_env": os.environ.get("PINN_KERNEL_PRECISION",
                                           "highest"),
           "ckpt": ckpt, "loss_start": float(state.get("loss", float("nan"))),
           "loss_end": float(res.final_loss), "iters": int(res.n_iters),
           "wall_sec": round(wall, 1),
           "iters_per_sec": round(res.n_iters / wall, 2)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", default=None,
                    choices=(None, "profile", "profile_flagship", "vg",
                             "vg_flagship", "descent"))
    ap.add_argument("--ckpt", default="runs/plate_analytic/best.ckpt")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()

    if args.arm == "profile":
        return arm_profile(False, args.scale)
    if args.arm == "profile_flagship":
        return arm_profile(True, args.scale)
    if args.arm == "vg":
        return arm_vg(False)
    if args.arm == "vg_flagship":
        return arm_vg(True)
    if args.arm == "descent":
        return arm_descent(args.ckpt, args.iters)

    # Orchestrate all arms as serial subprocesses (single-tenant chip;
    # precision env is trace-time).  The tail queue kills this orchestrator
    # with `timeout`, which signals only THIS process — forward termination
    # to the active child so no orphaned TPU process collides with the next
    # queue step, and stop launching arms once the deadline is near.
    import signal

    active = [None]

    def _terminate(signum, frame):
        if active[0] is not None and active[0].poll() is None:
            active[0].terminate()
            try:
                active[0].wait(timeout=20)
            except subprocess.TimeoutExpired:
                active[0].kill()
        sys.exit(143)

    signal.signal(signal.SIGTERM, _terminate)
    signal.signal(signal.SIGINT, _terminate)
    deadline = float(os.environ.get("STEP_DEADLINE_EPOCH",
                                    os.environ.get("MFU_DEADLINE_EPOCH",
                                                   "0"))) or None

    def run(arm, precision="highest", extra=()):
        if deadline is not None and time.time() > deadline - 120:
            print(f"=== skip {arm} (deadline) ===", flush=True)
            return
        env = dict(os.environ, PINN_KERNEL_PRECISION=precision)
        cmd = [sys.executable, os.path.abspath(__file__), "--arm", arm,
               *extra]
        print(f"=== {arm} precision={precision} ===", flush=True)
        active[0] = subprocess.Popen(cmd, env=env)
        try:
            active[0].wait(timeout=2400)
        except subprocess.TimeoutExpired:
            active[0].terminate()
            try:
                active[0].wait(timeout=20)
            except subprocess.TimeoutExpired:
                active[0].kill()
        active[0] = None

    run("profile")
    run("profile_flagship")
    for prec in ("high", "default"):
        run("vg", prec)
        run("vg_flagship", prec)
    if os.path.exists("runs/plate_analytic/best.ckpt"):
        for prec in ("highest", "high"):
            run("descent", prec, ("--ckpt", "runs/plate_analytic/best.ckpt",
                                  "--iters", "300"))


if __name__ == "__main__":
    main()
