"""Exact hard-BC composite: u = P(x) + D(x)·ũ(x) with CLOSED-FORM P and D.

The reference enforces hard BCs through two small *regressed* networks — a
distance net trained to vanish on the constrained sets and a particular net
trained to match the IC/BC values (train.py:322-356, composition at
382-387).  Both carry irreducible regression error that the uv training
loss cannot see (it has no boundary terms), so BC violation survives to the
final solution; measured in round 3, a weak dist net costs FEM accuracy
silently.

For geometries with closed-form constraint sets (the quarter plate: axis
edges, a loaded edge, t=0) nothing forces D and P to be learned: any smooth
function that vanishes EXACTLY on a channel's constrained set (with
∂D/∂t = 0 at t = 0 where a zero-velocity IC applies) is a valid distance
factor, and the particular solution is writable directly from the boundary
data.  This module supplies the composite model that consumes such
closed-form factors; per-case factor definitions live with their cases
(e.g. cases/plate_hole.py::analytic_dist/analytic_part).

Advantages over the regressed pair:
  * BC enforcement is exact by construction — zero regression error.
  * The dist/part pretraining phases disappear (the reference spends
    2×20,000 L-BFGS iterations there, train.py:220-236).
  * One network instead of three on the hot path; the closed-form jets are
    a handful of fused elementwise ops (ops/jet.py::jet_of_fn).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.jet import Jet, jet_of_fn


@dataclasses.dataclass(frozen=True)
class AnalyticCompositeFieldModel:
    """u = P + D·ũ with closed-form D and P; only ũ ('uv') is trainable.

    ``dist_fn`` / ``part_fn`` map a single coordinate vector (A,) to the
    (C,) per-channel distance factor / particular values and must be smooth
    (jax-traceable; derivatives come from forward-mode AD).
    """

    spec: object                 # FieldSpec
    uv_model: object             # MLPFieldModel or FourierMLPFieldModel
    dist_fn: Callable
    part_fn: Callable

    def init(self, key, dtype=jnp.float32) -> Dict:
        # Same params layout as CompositeFieldModel minus the learned nets,
        # so Phase(trainable="uv") and checkpoint tooling work unchanged.
        return {"uv": self.uv_model.init(key, dtype)}

    def jet(self, params, xyt: jax.Array, order: Optional[int] = None) -> Jet:
        order = self.spec.jet_order if order is None else order
        uv = self.uv_model.jet(params["uv"], xyt, order=order)
        dist = jet_of_fn(self.dist_fn, xyt, order=order)
        part = jet_of_fn(self.part_fn, xyt, order=order)
        return part + dist * uv

    def apply(self, params, xyt: jax.Array) -> jax.Array:
        uv = self.uv_model.apply(params["uv"], xyt)
        dist = jax.vmap(self.dist_fn)(xyt)
        part = jax.vmap(self.part_fn)(xyt)
        return part + dist * uv
