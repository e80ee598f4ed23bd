"""Case-level comparison against the shipped FEM ground truth.

Turns the reference's visual-only validation (side-by-side scatter plots,
SURVEY.md §4) into numbers: per-frame and aggregate relative-L2 errors of
every predicted field at the FEM probe coordinates.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..cases.base import Case
from . import fem, metrics
from .render import predict_fields

FIELDS = ("u", "v", "s11", "s22", "s12", "amp", "Mises")


def frame_errors(
    case: Case, params, frame: int, *, dtype=np.float64,
) -> Dict[str, float]:
    """Relative L2 error per field for one FEM frame."""
    ref = fem.load_frame(case.fem_dir, frame)
    ox, oy = case.fem_offset
    xy = np.stack([ref["x"] + ox, ref["y"] + oy], axis=1)
    pred = predict_fields(case.model, params, xy, case.frame_time(frame),
                          dtype=dtype)
    pred["Mises"] = metrics.von_mises_2d(
        pred["s11"], pred["s22"], pred["s12"],
        mu=float(np.asarray(case.material.mu)), plane=case.plane,
    )
    return metrics.field_errors(pred, ref, FIELDS)


def compare_frames(
    case: Case, params, frames: Optional[Sequence[int]] = None,
    *, dtype=np.float64,
) -> Dict[str, object]:
    """Per-frame + aggregate errors over a frame set (default: all frames)."""
    if frames is None:
        frames = range(case.n_frames)
    per_frame: List[Dict[str, float]] = []
    for i in frames:
        per_frame.append(frame_errors(case, params, i, dtype=dtype))
    return {
        "frames": list(frames),
        "per_frame": per_frame,
        "aggregate": metrics.aggregate(per_frame),
    }
