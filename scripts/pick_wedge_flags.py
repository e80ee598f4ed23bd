"""Decide the wedge-lever flags from the semi A/B arm metrics (r5 slot 0).

Round 4 falsified "f32 loss resolution" as the Fourier-arm wedge mechanism
(host-f64 line search fails identically at semi ~2.5e-3) and named the
jointly-trained Fourier B matrix as prime suspect (gradient RMS ~6x the MLP
blocks').  Round 5 runs the deciding A/B to an actual recorded outcome
(VERDICT r4 item 1): three hybrid_endgame arms from the same wedged
checkpoint (stage_1_T16.ckpt, 2.549e-3) with the Adam escape disabled
(--escape-rel 0) so every recorded drop is pure line-search L-BFGS descent:

  ab_control  — plain hybrid (sprint + host drill)
  ab_freezeb  — --trainable uv.mlp   (freeze the Fourier B matrix)
  ab_precond  — --host-first --host-precond (Jacobi per-leaf whitening)

Decision metric: relative f64-measured drop from the arm's start loss
(events 'start'/'measure'/'host_block'; f32-only numbers are not trusted
near the wedge — ADVICE r4, bench.py's loss_f64 policy) — EXCEPT that an
f32-recorded sprint descent is credited when its cumulative relative drop
is >= 5% (the observed f32-vs-f64 offset at the semi wedge is ~1e-7
relative, see the freezeb warmup measure pair; 5% is ~5e5x that scale, so a
qualifying f32 trajectory cannot be measurement optimism).  Without this,
an arm whose sprint ran to its wall timeout without pausing for a host
measure (freezeb: 17k iters, 2.44e-3 -> 4.68e-4, all in f32_block events)
would be scored only on its warmup measure.

Prints the hybrid flags the plate continuation should use on stdout and
writes runs/wave_semi_fourier/ab_verdict.json with all three trajectories.
"""

import json
import sys

ARMS = {
    "control": ("runs/wave_semi_fourier/ab_control_metrics.jsonl", ""),
    "freezeb": ("runs/wave_semi_fourier/ab_freezeb_metrics.jsonl",
                "--trainable uv.mlp"),
    "precond": ("runs/wave_semi_fourier/ab_precond_metrics.jsonl",
                "--host-precond"),
}


def arm_summary(path):
    """f64-measured trajectory of one arm: start, best, rel drop, iters."""
    start = best = best_f32 = None
    f64_events = []
    f32_iters = host_iters = 0
    try:
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                ev = rec.get("event")
                if ev == "start" and start is None:
                    start = best = rec["loss"]
                    f64_events.append(("start", rec["loss"]))
                elif ev in ("measure", "host_block") and "loss_f64" in rec:
                    f64_events.append((ev, rec["loss_f64"]))
                    if best is None or rec["loss_f64"] < best:
                        best = rec["loss_f64"]
                if ev in ("f32_block", "f32_warmup"):
                    f32_iters = max(f32_iters, rec.get("iters", 0))
                    lf = rec.get("loss_f32")
                    if lf is not None and (best_f32 is None or lf < best_f32):
                        best_f32 = lf
                if ev == "host_block":
                    host_iters = max(host_iters, rec.get("iters", 0))
    except FileNotFoundError:
        return None
    if start is None:
        return None
    denom = max(abs(start), 1e-30)
    rel_f64 = (start - best) / denom
    rel_f32 = (start - best_f32) / denom if best_f32 is not None else 0.0
    # Credit f32-recorded descent only when it dwarfs any possible f32
    # measurement optimism (module docstring).
    credited = max(rel_f64, rel_f32) if rel_f32 >= 0.05 else rel_f64
    return {
        "start_loss": start,
        "best_f64": best,
        "best_f32": best_f32,
        "rel_drop_f64": rel_f64,
        "rel_drop_f32": rel_f32,
        "rel_drop_credited": credited,
        "f32_iters": f32_iters,
        "host_iters": host_iters,
        "n_f64_measures": len(f64_events),
    }


def main():
    out = {}
    for name, (path, flags) in ARMS.items():
        s = arm_summary(path)
        if s is not None:
            s["flags"] = flags
            out[name] = s
        print(f"{name}: {s}", file=sys.stderr)

    ctrl = out.get("control", {}).get("rel_drop_credited", 0.0)
    fb = out.get("freezeb", {}).get("rel_drop_credited", 0.0)
    pc = out.get("precond", {}).get("rel_drop_credited", 0.0)
    # A lever wins if it beats the control by >=1% absolute relative drop —
    # the control's own Adam-free drop measures the wedge's residual leak.
    margin = 0.01
    if fb >= ctrl + margin and fb >= pc:
        winner, flags = "freezeb", ARMS["freezeb"][1]
    elif pc >= ctrl + margin:
        winner, flags = "precond", ARMS["precond"][1]
    else:
        winner, flags = "control", ""
    out["verdict"] = {
        "winner": winner,
        "flags": flags,
        "margin_required": margin,
        "rel_drops": {"control": ctrl, "freezeb": fb, "precond": pc},
    }
    try:
        with open("runs/wave_semi_fourier/ab_verdict.json", "w") as f:
            json.dump(out, f, indent=1)
    except OSError as e:
        print(f"could not write ab_verdict.json: {e}", file=sys.stderr)
    print(flags)


if __name__ == "__main__":
    main()
