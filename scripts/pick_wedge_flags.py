"""Decide the wedge-lever flags from the semi A/B arm metrics (r4b slot 2).

Reads the freeze-B and host-precond arm metrics (hybrid_endgame.py jsonl)
and prints the hybrid flags the plate continuation should use:
  - freeze-B arm rel-drop >= 1% and >= precond arm  ->  "--trainable uv.mlp"
  - precond arm rel-drop >= 1%                      ->  "--host-precond"
  - neither                                         ->  "" (plain hybrid)

The control behavior is already measured (docs/STATUS_r4.md queue-3
findings: both engines wedge at ~2.5e-3 on semi; sprint -0.065%, host
drill line-search fails in 3-4 iters), so any arm clearing 1% in ~12
minutes is a mechanism confirmation.
"""

import json
import sys


def best_rel_drop(path):
    start = None
    best = None
    try:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                ev = rec.get("event")
                if ev == "start" and start is None:
                    start = rec["loss"]
                    best = rec["loss"]
                for k in ("loss_f64", "loss_f32", "loss"):
                    if k in rec and isinstance(rec[k], (int, float)):
                        best = min(best, rec[k]) if best is not None else rec[k]
    except FileNotFoundError:
        return None
    if start is None or best is None:
        return None
    return (start - best) / max(abs(start), 1e-30)


def main():
    fb = best_rel_drop("runs/wave_semi_fourier/freezeb_metrics.jsonl")
    pc = best_rel_drop("runs/wave_semi_fourier/precond_metrics.jsonl")
    print(f"freezeb rel drop: {fb}, precond rel drop: {pc}", file=sys.stderr)
    fb = fb or 0.0
    pc = pc or 0.0
    if fb >= 0.01 and fb >= pc:
        print("--trainable uv.mlp")
    elif pc >= 0.01:
        print("--host-precond")
    else:
        print("")


if __name__ == "__main__":
    main()
