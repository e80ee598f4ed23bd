"""Hybrid plate endgame: device-f32 L-BFGS sprints + host-f64 L-BFGS drills.

Measured regimes (round 3, this TPU):
  * device-resident f32 carried L-BFGS: ~16-25 it/s, but near the optimum it
    stops certifying descent (f32 loss-difference resolution; the round-2
    wedge at ~0.029).
  * host-f64 L-BFGS over the pure-f32 chunk-sum step (scripts/host_endgame.py
    machinery): ~1.7-1.9 it/s, immune to the resolution floor — and moving
    the point in f64 has been observed to UN-wedge the f32 engine
    (the f64-polish evidence, docs/STATUS_r2.md).

So: sprint with the f32 engine while it makes progress; when it goes stale,
drill with the host engine for a fixed block; retry the sprint.  All
best-point bookkeeping is done with the host engine's f64 loss measure.

Usage:
  python scripts/hybrid_endgame.py CKPT_IN CKPT_OUT --hours 2.5 \
      [--target 7.08e-4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_in")
    ap.add_argument("ckpt_out")
    ap.add_argument("--hours", type=float, default=2.5)
    ap.add_argument("--target", type=float, default=7.08e-4)
    ap.add_argument("--case", default="plate_hole",
                    help="case module name (plate_hole, wave_semi_infinite, "
                         "wave_confined, wave_infinite)")
    ap.add_argument("--max-t", type=float, default=None,
                    help="horizon override for wave cases (final curriculum "
                         "horizon)")
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--f32-block", type=int, default=1000)
    ap.add_argument("--f32-segment", type=int, default=25,
                    help="device iterations per jitted while_loop dispatch "
                         "in the production sprint.  50 was watchdog-bait: "
                         "in a zoom storm one iteration costs up to 50 "
                         "full-batch evals, and a 50-iter segment became a "
                         "multi-minute monolithic device execution that "
                         "kernel-faulted the TPU worker (r4 semi hybrid "
                         "crash loop, same pathology the curriculum fixed "
                         "with Stage.segment=25)")
    ap.add_argument("--f32-stale-rel", type=float, default=2e-4,
                    help="relative drop per f32 block below which the f32 "
                         "engine is stale")
    ap.add_argument("--host-block", type=int, default=400)
    ap.add_argument("--host-blocks", type=int, default=2)
    ap.add_argument("--adam-block", type=int, default=4000)
    ap.add_argument("--escape-rel", type=float, default=1e-3,
                    help="relative f_best drop per full sprint+drill round "
                         "below which BOTH engines count as wedged and an "
                         "Adam escape fires (the round-1 alternating-cycle "
                         "lever: at moderate loss the zoom search burns ~50 "
                         "evals per zero step while Adam progresses per "
                         "single evaluation)")
    ap.add_argument("--host-first", action="store_true",
                    help="start with host-f64 drills (cases already wedged "
                         "for the f32 engine: cold f32 warmups at low loss "
                         "burn tens of minutes for ~0 drop)")
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--build-kwargs", default=None,
                    help='extra case-builder kwargs as JSON, e.g. '
                         '\'{"fourier": 64, "fourier_scale": 2.0}\'')
    ap.add_argument("--host-precond", action="store_true",
                    help="Jacobi per-block whitening in the host drill "
                         "(equalize per-leaf gradient RMS; wedge lever B)")
    ap.add_argument("--trainable", default=None,
                    help="override the phase's trainable subtree with a "
                         "dotted path, e.g. 'uv.mlp' to freeze the Fourier "
                         "B matrix (wedge-mechanism A/B, STATUS_r4 handoff "
                         "item 3)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend in-process (the axon "
                         "sitecustomize ignores JAX_PLATFORMS=cpu) — for "
                         "de-risk drives while the single-tenant chip is "
                         "busy")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from pinn_elastodynamics_tpu.cases.base import _phase_loss_fn
    from pinn_elastodynamics_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from pinn_elastodynamics_tpu.train.lbfgs import minimize
    from pinn_elastodynamics_tpu.train.lbfgs_host import (
        make_host_phase_vg,
        make_preconditioned_vg,
        minimize_host,
    )

    mpath = args.metrics or os.path.join(
        os.path.dirname(args.ckpt_out) or ".", "hybrid_endgame.jsonl")
    mfile = open(mpath, "a")

    def log(rec):
        rec["t"] = round(time.time(), 1)
        mfile.write(json.dumps(rec) + "\n")
        mfile.flush()
        print(rec, flush=True)

    t_end = time.time() + args.hours * 3600
    # Crash-resume: the axon tunnel/chip faults sporadically under sustained
    # load.  Round 4's relaunch loops paid a full process restart (~5-7 min
    # backend init + recompile) per fault; here we first attempt IN-PROCESS
    # recovery (r4 handoff item 1): probe the device, then (rung A) retry the
    # existing compiled closures — instant if the fault was a transient
    # tunnel error and the worker kept its state — and if that faults again
    # (rung B) rebuild the case/closures in this process, paying the
    # recompile but not the restart.  Only if both rungs fail do we exit(3)
    # for the outer relaunch loop.  Resume from our own output checkpoint
    # when present.
    if os.path.exists(args.ckpt_out):
        args.ckpt_in = args.ckpt_out
    import importlib

    class _Fault(Exception):
        pass

    def build_problem():
        """(Re)build the case and all device closures.

        Case builders are seeded/deterministic, so a rebuild after a TPU
        worker restart reconstructs the identical problem; only the device
        buffers (banks, frozen sub-nets) are re-uploaded.
        """
        mod = importlib.import_module(
            f"pinn_elastodynamics_tpu.cases.{args.case}")
        build_kwargs = dict(scale=1.0, pad_to_multiple_of=8)
        if args.max_t is not None:
            build_kwargs["max_t"] = args.max_t
        if args.build_kwargs:
            build_kwargs.update(json.loads(args.build_kwargs))
        case = mod.build(**build_kwargs)
        phase = case.phases[-1]
        if args.trainable:
            import dataclasses

            phase = dataclasses.replace(phase, trainable=args.trainable)
        params = load_checkpoint(args.ckpt_in, jnp.float32)["params"]
        sub_fn, _sub0, merge = _phase_loss_fn(case, phase, params)
        host_vg, x0, unravel32 = make_host_phase_vg(
            case, phase, params, chunk_size=args.chunk
        )
        return case, phase, params, sub_fn, merge, host_vg, unravel32, x0

    def device_probe(max_tries=4):
        """Is the device dispatchable again?  Returns probe seconds or None."""
        for i in range(max_tries):
            try:
                t0 = time.time()
                z = jax.jit(lambda a: a * 2.0 + 1.0)(
                    jnp.zeros((8,), jnp.float32))
                jax.block_until_ready(z)
                return round(time.time() - t0, 2)
            except Exception as e:  # noqa: BLE001
                log({"event": "recover_probe_fail", "try": i,
                     "error": repr(e)[:160]})
                time.sleep(10.0 * (i + 1))
        return None

    (case, phase, params, sub_fn, merge, host_vg, unravel32, x0) = \
        build_problem()
    state = load_checkpoint(args.ckpt_in)
    # Resume at full precision — but only when the checkpoint's flat vector
    # matches this run's trainable subtree (a --trainable override, e.g.
    # "uv.mlp" freezing the Fourier B matrix, changes the dimension; then
    # the params pytree path above is the resume source).
    if "x64_flat" in state and np.asarray(state["x64_flat"]).size == x0.size:
        x0 = np.asarray(state["x64_flat"], np.float64)  # resume at full prec
        # One-shot f32 carry resume: a relaunch (fault/timeout) must not pay
        # the 20-40 min cold zoom-storm warmup again — the carry saved
        # alongside x64_flat matches x0, so the first sprint continues where
        # it left off.
        f32_resume_carry = state.get("f32_carry")
    else:
        f32_resume_carry = None

    f_best, _ = host_vg(x0)
    x_best = x0.copy()
    log({"event": "start", "loss": f_best, "hours": args.hours,
         "n_params": int(x0.size)})

    def save_best(k_note):
        full = merge(params, unravel32(
            jnp.asarray(np.asarray(x_best, np.float32))))
        save_checkpoint(args.ckpt_out, {
            "params": full, "loss": f_best, "note": k_note,
            "x64_flat": x_best,
        })

    def consider(x, note):
        nonlocal f_best, x_best
        f64, _ = host_vg(x)
        fault_streak[0] = 0  # a successful full eval counts as progress
        if f64 < f_best:
            f_best, x_best = f64, x.copy()
            save_best(note)
        log({"event": "measure", "note": note, "loss_f64": f64,
             "best": f_best})
        return f64

    x = x0.copy()
    host_carry = None
    total_f32 = total_host = 0
    first_round = True
    # Per-segment fault insurance inside f32 sprints: a kill/fault mid-block
    # must not cost more than ~30 s of progress (the confined run lost a full
    # 50-min budget to a mid-block timeout).
    last_seg_save = [time.time()]
    # Last fault's error string, for repeated-deterministic-bug detection.
    last_err = [None]
    # Consecutive device faults with no checkpointable progress between them.
    # Any successful ≥30 s segment run resets it (seg_ckpt below), so a long
    # fault storm with real progress between faults stays in-process forever;
    # only a truly dead device (4 faults, zero progress) exits for the outer
    # relaunch loop.
    fault_streak = [0]

    # Test-only fault injection: PINN_TEST_FAULT=<n> raises n synthetic
    # device faults from inside the sprint, exercising recovery rung A
    # (retry same closures) then rung B (rebuild closures) on CPU.
    fault_inject = [int(os.environ.get("PINN_TEST_FAULT", "0"))]

    def seg_ckpt(k_total, seg_params, hist, *, carry=None):
        if fault_inject[0] > 0:
            fault_inject[0] -= 1
            raise RuntimeError("injected test fault (PINN_TEST_FAULT)")
        now = time.time()
        fault_streak[0] = 0
        if now - last_seg_save[0] < 30.0:
            return
        last_seg_save[0] = now
        x_seg = np.asarray(ravel_pytree(seg_params)[0], np.float64)
        save_checkpoint(args.ckpt_out, {
            "params": merge(params, seg_params),
            "loss": float(hist[-1]) if len(hist) else float("nan"),
            "x64_flat": x_seg, "note": "segment",
            **({"f32_carry": carry} if carry is not None else {}),
        })

    while time.time() < t_end and f_best > args.target:
        try:
            f_round0 = f_best
            skip_sprint = args.host_first and first_round
            first_round = False
            if not skip_sprint:
                # ---- f32 sprint ----
                sub = unravel32(jnp.asarray(np.asarray(x, np.float32)))
                carry, f32_resume_carry = f32_resume_carry, None
                stale = 0
                sprint_iters = 0
                # Cold L-BFGS at low loss burns ~100 zoom evals/iteration; a
                # 50-iter segment is then a multi-minute monolithic device
                # execution and trips the TPU watchdog (observed: "TPU worker
                # crashed").  Warm up with short segments, then stretch once the
                # carry steps at ~1 eval/iteration.
                try:
                    if carry is None:
                        res = minimize(sub_fn, sub, maxiter=100, segment=10,
                                       init_carry=None, patience=100,
                                       target=args.target, on_segment=seg_ckpt)
                        sub, carry = res.params, res.carry
                        sprint_iters += res.n_iters
                        log({"event": "f32_warmup", "iters": sprint_iters,
                             "loss_f32": float(res.final_loss)})
                        # Wedge detect: a warmup with ~zero relative decrease
                        # means the f32 engine cannot certify descent here at
                        # all — skip the production sprint (it would only burn
                        # the slot in zoom storms) and hand straight to the
                        # host-f64 drill.  The decision compares f64 against
                        # f64 (ADVICE r4: an f32-vs-f64 systematic offset
                        # larger than f32-stale-rel could falsely trigger or
                        # suppress the skip when mixing precisions).
                        x_w = np.asarray(ravel_pytree(sub)[0], np.float64)
                        f64_w = consider(x_w, "f32_warmup")
                        wrel = (f_round0 - f64_w) / max(abs(f_round0), 1e-30)
                        if wrel < args.f32_stale_rel:
                            log({"event": "f32_wedged_skip", "rel_drop": wrel})
                            x = x_w
                            raise StopIteration  # to the host drill
                    else:
                        log({"event": "f32_carry_resume"})
                    while time.time() < t_end:
                        res = minimize(sub_fn, sub, maxiter=args.f32_block,
                                       segment=args.f32_segment, init_carry=carry,
                                       patience=100, target=args.target,
                                       on_segment=seg_ckpt)
                        sub, carry = res.params, res.carry
                        sprint_iters += res.n_iters
                        h = res.loss_history
                        rel = ((float(h[0]) - float(res.final_loss))
                               / max(abs(float(h[0])), 1e-30)) if len(h) > 1 else 0.0
                        log({"event": "f32_block", "iters": sprint_iters,
                             "loss_f32": float(res.final_loss), "rel_drop": rel})
                        # Fault insurance: persist every block (a mid-sprint chip
                        # crash must not cost the sprint).
                        x_blk = np.asarray(ravel_pytree(sub)[0], np.float64)
                        save_checkpoint(args.ckpt_out, {
                            "params": merge(params, sub),
                            "loss": float(res.final_loss), "x64_flat": x_blk,
                            "note": f"sprint_{total_f32 + sprint_iters}",
                            "f32_carry": carry,
                        })
                        if float(res.final_loss) <= args.target:
                            break
                        stale = stale + 1 if rel < args.f32_stale_rel else 0
                        if stale >= 2 or res.n_iters < args.f32_block:
                            break
                    total_f32 += sprint_iters
                    x = np.asarray(ravel_pytree(sub)[0], np.float64)
                    consider(x, f"f32_sprint_{total_f32}")
                except StopIteration:
                    total_f32 += sprint_iters  # wedged warmup: fall through
                except Exception as e:
                    # Device fault mid-sprint; block checkpoints preserved the
                    # progress — hand to the in-process recovery.
                    log({"event": "f32_fault", "error": repr(e)[:200]})
                    raise _Fault(e)
                if f_best <= args.target or time.time() >= t_end:
                    break

            # ---- host-f64 drill ----
            x = x_best.copy()
            host_carry = None  # x jumped to best; stale memory
            drill_vg, to_u, from_u = host_vg, None, None
            if args.host_precond:
                # Jacobi per-leaf whitening: equalize gradient RMS across
                # parameter blocks (the Fourier B matrix carries ~6x the MLP
                # blocks' gradient RMS at the full-scale semi wedge).
                try:
                    _, g0 = host_vg(x)
                except Exception as e:
                    log({"event": "host_fault", "error": repr(e)[:200]})
                    raise _Fault(e)
                sizes = [int(np.prod(l.shape)) for l in jax.tree.leaves(
                    unravel32(jnp.zeros((x.size,), jnp.float32)))]
                d_parts, off = [], 0
                rmses = []
                for sz in sizes:
                    blk = g0[off:off + sz]
                    rmses.append(max(float(np.sqrt((blk * blk).mean())),
                                     1e-30))
                    off += sz
                ref_rms = float(np.median(rmses))
                for sz, r in zip(sizes, rmses):
                    d_parts.append(np.full(sz, ref_rms / r, np.float64))
                d = np.concatenate(d_parts)
                log({"event": "host_precond", "d_min": float(d.min()),
                     "d_max": float(d.max())})
                drill_vg, to_u, from_u = make_preconditioned_vg(host_vg, d)
            x_opt = to_u(x) if to_u is not None else x
            for b in range(args.host_blocks):
                if time.time() >= t_end:
                    break
                try:
                    hres = minimize_host(
                        drill_vg, x_opt, maxiter=args.host_block,
                        patience=200, target=args.target,
                        init_carry=host_carry,
                        wall_budget=max(30.0, t_end - time.time()),
                    )
                except Exception as e:
                    log({"event": "host_fault", "error": repr(e)[:200]})
                    raise _Fault(e)
                host_carry = hres.carry
                x_opt = hres.x
                x = from_u(x_opt) if from_u is not None else x_opt
                total_host += hres.n_iters
                fault_streak[0] = 0  # a completed host block is progress
                log({"event": "host_block", "iters": total_host,
                     "loss_f64": hres.final_loss, "status": hres.converged,
                     "evals_per_iter": round(
                         hres.n_evals / max(hres.n_iters, 1), 2)})
                if hres.final_loss < f_best:
                    f_best, x_best = hres.final_loss, x.copy()
                    save_best(f"host_{total_host}")
                if hres.final_loss <= args.target:
                    break

            # ---- Adam escape (third rung) ----
            # A wedge far above the f32 resolution floor (slot A: loss 0.373)
            # stalls BOTH gradient-descent engines: the zoom line search fails
            # along every L-BFGS direction while per-step decreases are still
            # ~1e-3 relative.  Adam takes a step per single evaluation and
            # measurably un-wedges (round-1 cycles: 1.49 -> 0.42;
            # scripts/cycle_driver.py).  Fire it only when the whole
            # sprint+drill round went stale.
            rel_round = (f_round0 - f_best) / max(abs(f_round0), 1e-30)
            if (rel_round < args.escape_rel and time.time() < t_end
                    and f_best > args.target):
                from pinn_elastodynamics_tpu.train.adam import run_adam

                sub = unravel32(jnp.asarray(np.asarray(x_best, np.float32)))
                loss_aux = lambda s: (sub_fn(s), {})  # noqa: E731
                # LR keyed to the wedge's loss magnitude: a wedge at 0.373
                # (plate slot A) needs the curriculum-warmup LR scale, not the
                # endgame one — 3e-5 there moves ~nothing in 4k iters, while
                # the consider() guard already rejects any LR that overshoots.
                if f_best > 3e-2:
                    lr = 3e-4
                elif f_best > 3e-4:
                    lr = 3e-5
                else:
                    lr = 1e-5
                try:
                    # When Adam is the only engine moving (both line-search
                    # engines wedged), the sprint+drill probe between escapes
                    # is pure overhead — stay in the escape while blocks keep
                    # being accepted.
                    for _ in range(10):
                        if time.time() >= t_end:
                            break
                        r = run_adam(loss_aux, sub, lr, iters=args.adam_block,
                                     segment=200)
                        f_after = float(r.history["loss"][-1])
                        log({"event": "adam_escape", "lr": lr,
                             "iters": args.adam_block, "loss_f32": f_after})
                        f64 = consider(
                            np.asarray(ravel_pytree(r.params)[0], np.float64),
                            "adam_escape")
                        if f64 < f_round0 * (1 - args.escape_rel):
                            sub = r.params
                        else:
                            lr *= 0.3
                            if lr < 3e-6:
                                break
                except Exception as e:
                    log({"event": "adam_fault", "error": repr(e)[:200]})
                    raise _Fault(e)
                # Restart both engines from the (possibly moved) best point
                # with fresh state: curvature built elsewhere is stale here.
                x = x_best.copy()
                host_carry = None
        except (_Fault, Exception) as e:  # noqa: BLE001
            inner = (e.args[0] if isinstance(e, _Fault) and e.args else e)
            if not isinstance(e, _Fault):
                log({"event": "round_fault", "error": repr(e)[:200]})
            # A deterministic bug is not a device fault: retrying it through
            # probe+rebuild cycles burns multi-minute recompiles for nothing
            # (ADVICE r4).  Exit(4) immediately on clearly non-device
            # exception types, and after 2 consecutive identical error
            # strings that don't look like device/tunnel faults.
            err_str = repr(inner)[:200]
            if isinstance(inner, (KeyError, TypeError, ValueError,
                                  AttributeError, IndexError)):
                log({"event": "nondevice_bug_exit", "error": err_str})
                mfile.close()
                sys.exit(4)
            devicey = any(s in err_str for s in (
                "UNAVAILABLE", "DEADLINE", "INTERNAL", "worker", "tunnel",
                "UNIMPLEMENTED", "RESOURCE_EXHAUSTED", "PINN_TEST_FAULT"))
            if not devicey and err_str == last_err[0]:
                log({"event": "repeated_nondevice_error_exit",
                     "error": err_str})
                mfile.close()
                sys.exit(4)
            last_err[0] = err_str
            fault_streak[0] += 1
            if fault_streak[0] > 4:
                log({"event": "inproc_recovery_exhausted"})
                mfile.close()
                sys.exit(3)
            dt = device_probe()
            if dt is None:
                log({"event": "inproc_recovery_dead_device"})
                mfile.close()
                sys.exit(3)
            t0r = time.time()
            rung = "A" if fault_streak[0] == 1 else "B"
            try:
                if rung == "B":
                    # Worker restarted: device buffers (banks, frozen nets)
                    # are dead; rebuild the problem closures in this process.
                    # Pays the recompile but not the process restart /
                    # backend init.
                    if os.path.exists(args.ckpt_out):
                        args.ckpt_in = args.ckpt_out
                    (case, phase, params, sub_fn, merge, host_vg, unravel32,
                     x0) = build_problem()
                st = (load_checkpoint(args.ckpt_out)
                      if os.path.exists(args.ckpt_out) else {})
            except Exception as e2:  # noqa: BLE001
                # Recovery itself failed (rebuild fault, partially written
                # ckpt_out): honor the documented exit(3) contract instead
                # of dying with a generic traceback (ADVICE r4).
                log({"event": "recovery_handler_fail", "rung": rung,
                     "error": repr(e2)[:200]})
                mfile.close()
                sys.exit(3)
            if ("x64_flat" in st
                    and np.asarray(st["x64_flat"]).size == x0.size):
                x = np.asarray(st["x64_flat"], np.float64)
                f32_resume_carry = st.get("f32_carry")
            else:
                f32_resume_carry = None
            host_carry = None
            first_round = args.host_first  # honor --host-first on re-entry
            log({"event": "inproc_recovered", "rung": rung,
                 "probe_s": dt, "restore_s": round(time.time() - t0r, 1),
                 "streak": fault_streak[0]})

    save_best("final")
    log({"event": "done", "loss": f_best, "f32_iters": total_f32,
         "host_iters": total_host})
    mfile.close()


if __name__ == "__main__":
    main()
