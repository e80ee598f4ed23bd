"""Point banks: fixed-shape, maskable collocation/boundary point sets.

The reference feeds each point family (collocation, IC, per-edge boundary,
hole surface, distance-regression) through its own placeholders
(/root/reference/PlateHoleQuarter/train/train.py:114-156).  Here each family
is a :class:`PointBank` — a pytree of device arrays with an explicit validity
mask so banks can be padded to shard-friendly static shapes without changing
any loss value (masked means divide by the true point count).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PointBank:
    """A batch of sample points plus per-point attached data.

    Attributes:
      xyt:    (N, A) coordinates, time last.
      mask:   (N,) 1.0 for real points, 0.0 for padding.
      values: named per-point arrays, each (N,) or (N, K) — boundary targets,
              normals, regression targets, etc.
    """

    xyt: jax.Array
    mask: jax.Array
    values: Dict[str, jax.Array] = dataclasses.field(default_factory=dict)

    @property
    def n_total(self) -> int:
        return self.xyt.shape[0]


def make_bank(
    pts: np.ndarray,
    values: Optional[Dict[str, np.ndarray]] = None,
    *,
    dtype=jnp.float32,
    pad_to_multiple_of: int = 1,
) -> PointBank:
    """Build a PointBank from host arrays, padding N up to a multiple.

    Padding rows get mask 0 and contribute nothing to masked means, so a
    padded bank is loss-equivalent to the unpadded one.
    """
    pts = np.asarray(pts)
    n = pts.shape[0]
    m = pad_to_multiple_of
    n_pad = (-n) % m
    total = n + n_pad

    def pad(a):
        a = np.asarray(a)
        if a.ndim == 1:
            a = a[:, None]
        widths = [(0, n_pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths)

    mask = np.concatenate([np.ones(n), np.zeros(n_pad)])
    vals = {k: jnp.asarray(pad(v), dtype) for k, v in (values or {}).items()}
    return PointBank(
        xyt=jnp.asarray(pad(pts), dtype),
        mask=jnp.asarray(mask, dtype),
        values=vals,
    )


class ChunkSumCollector:
    """Collects per-chunk partial sums of every masked square-and-mean.

    The extended-precision device scheme that actually compiles on this TPU
    stack: any nontrivial float64 in the graph hangs the axon remote compile
    (measured: full-f64 value+grad, f64 optimizer internals over f32
    compute, and even a lone f64 reduction tail inside value_and_grad all
    hang >10 min), so the device stays PURE f32 and instead of one
    f32-rounded scalar it emits ``n_chunks`` partial sums per loss
    component.  The host adds them in float64: the representable loss
    resolution improves from eps32 ≈ 1.2e-7 relative to ~eps32/n_chunks —
    enough for the strong-Wolfe line search to certify the ~1e-6-relative
    per-iteration decreases of the endgame (docs/STATUS_r2.md), which is
    how this framework reaches the reference's f64-trained optima
    (train.py:115) without f64 hardware.

    Entries are appended at trace time; use a fresh collector per traced
    call.  ``names``/``counts_static`` line up with the traced ``arrays``.
    """

    def __init__(self, chunk_size: int = 512):
        self.chunk_size = chunk_size
        self.names = []    # component name per entry (static)
        self.arrays = []   # (n_chunks,) f32 chunk sums per entry (traced)
        self.counts = []   # scalar valid-point count per entry (traced)

    def add(self, name: str, r: jax.Array, mask: jax.Array):
        if r.ndim > 1:
            r = r.reshape(r.shape[0])
        q = r * r * mask
        n = q.shape[0]
        c = self.chunk_size
        pad = (-n) % c
        if pad:
            q = jnp.concatenate([q, jnp.zeros((pad,), q.dtype)])
        self.names.append(name)
        self.arrays.append(q.reshape(-1, c).sum(axis=1))
        self.counts.append(jnp.sum(mask))


def masked_mean_square(r: jax.Array, mask: jax.Array, dtype=None) -> jax.Array:
    """mean(r²) over valid points — the reference's tf.reduce_mean(tf.square).

    ``dtype`` upcasts the square-and-reduce tail (residuals stay in the
    network's compute dtype).  With ``jnp.float64`` this gives the loss
    scalar full f64 resolution while the jets stay f32 — the
    extended-precision endgame path: near the optimum the per-iteration
    loss decrease falls below f32's 1e-7 relative resolution and the
    strong-Wolfe line search can no longer certify descent (the f32 floor
    documented in docs/STATUS_r2.md), even though the f32 *residuals*
    carry plenty of signal.
    """
    if r.ndim > 1:
        r = r.reshape(r.shape[0])
    if dtype is not None:
        r = r.astype(dtype)
        mask = mask.astype(dtype)
    return jnp.sum(r * r * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def bank_sizes(banks: Dict[str, PointBank]) -> Dict[str, int]:
    return {k: b.n_total for k, b in banks.items()}
