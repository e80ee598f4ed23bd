"""Field rendering on evaluation grids.

The reference's ``predict`` runs 8 separate ``sess.run`` calls per frame, one
per output (/root/reference/PlateHoleQuarter/train/train.py:561-570).  Here a
single jitted forward produces every field AND the strains (from the same
fused jet), batched over padded chunks so one compiled executable serves all
frames and grid sizes.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.residuals import strains_2d


@partial(jax.jit, static_argnames=("model", "use_kernel"))
def _predict_chunk(model, params, xyt, use_kernel: bool = False):
    if use_kernel:
        from ..kernels.fused_jet import model_fused_jet

        interp = jax.default_backend() not in ("tpu", "axon")
        jet = model_fused_jet(model, params, xyt, order=1, interpret=interp)
    else:
        jet = model.jet(params, xyt, order=1)
    spec = model.spec
    out = {name: jet.f[:, spec.index(name)] for name in spec.channels}
    if spec.ndim == 2:
        e11, e22, e12 = strains_2d(jet, spec)
        out.update({"e11": e11, "e22": e22, "e12": e12})
    return out


def predict_fields(
    model, params, xy: np.ndarray, t: float, *,
    chunk: int = 65536, dtype=np.float32, use_kernel: bool = False,
) -> Dict[str, np.ndarray]:
    """Evaluate all fields + strains at spatial points ``xy`` and time ``t``.

    Pads to a fixed chunk size so every frame reuses one compiled executable
    (the reference re-feeds 8 separate fetches per frame).  ``use_kernel``
    routes the forward through the Pallas fused-jet kernel (10.4x faster
    than the XLA jet on TPU v5e at 104k points; f32, TPU only).
    """
    n = xy.shape[0]
    tcol = np.full((n, 1), t)
    pts = np.concatenate([xy, tcol], axis=1).astype(dtype)
    outs = []
    for start in range(0, n, chunk):
        block = pts[start : start + chunk]
        pad = chunk - block.shape[0]
        if pad:
            block = np.pad(block, ((0, pad), (0, 0)))
        res = _predict_chunk(model, params, jnp.asarray(block),
                             use_kernel=use_kernel)
        res = {k: np.asarray(v)[: chunk - pad] for k, v in res.items()}
        outs.append(res)
    merged = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
    merged["amp"] = np.sqrt(merged["u"] ** 2 + merged["v"] ** 2)
    return merged


def predict_frames(model, params, xy: np.ndarray, times, **kw):
    """Yield (t, fields) over a frame sequence (train.py:992-998)."""
    for t in times:
        yield t, predict_fields(model, params, xy, float(t), **kw)
