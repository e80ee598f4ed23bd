"""Declarative loss terms and weighted loss assembly.

The reference hand-writes one weighted sum of ``tf.reduce_mean(tf.square(·))``
groups per case (PlateHole train.py:186-217; Confined ElasticWave.py:139-156;
Infinite :104-119; SemiInfinite :112-127).  Here a case declares a list of
``(bank_name, term)`` pairs; every term contributes named mean-square
components (f_uv, f_s, HOLE, IC, SRC, FIX, NB, DIST, PART, ...), and a
per-component weight map assembles the scalar total.  Per-component values are
returned as auxiliary outputs of the jitted step, so loss introspection
(``getloss``, train.py:588-612) costs nothing extra.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..banks import PointBank, masked_mean_square
from ..models.fields import FieldSpec
from ..ops import residuals as res_ops
from ..ops import traction as trac_ops
from ..ops.elasticity import Material

DT_PREFIX = "dt:"  # channel name "dt:u" = time derivative of channel u


def _mms(r, mask, dtype, collector, name):
    """masked_mean_square + optional chunk-sum collection (see
    banks.ChunkSumCollector — the host-f64 loss reconstruction path)."""
    if collector is not None:
        collector.add(name, r, mask)
    return masked_mean_square(r, mask, dtype)


def _net_view(model, params, net: Optional[str]):
    """Resolve a term's network view: the full (possibly composite) model, or
    one of a composite's sub-networks ('uv' | 'dist' | 'part')."""
    if net is None:
        return model, params
    sub = getattr(model, f"{net}_net")
    return sub, params[net]


@dataclasses.dataclass(frozen=True)
class PDEResidual:
    """Momentum + constitutive residuals on a collocation bank.

    Contributes components 'f_uv' (momentum + velocity-definition residuals)
    and 'f_s' (constitutive residuals), matching the reference's grouping for
    separate weighting (train.py:186-191).
    """

    plane: str
    name_uv: str = "f_uv"
    name_s: str = "f_s"

    def evaluate(self, model, params, mat: Material, bank: PointBank,
                 accum_dtype=None, collector=None):
        spec: FieldSpec = model.spec
        jet = model.jet(params, bank.xyt)
        res = res_ops.residuals(jet, spec, mat, self.plane)
        out = {}
        out[self.name_uv] = sum(
            _mms(res[n], bank.mask, accum_dtype, collector, self.name_uv)
            for n in res_ops.momentum_group(spec)
        )
        out[self.name_s] = sum(
            _mms(res[n], bank.mask, accum_dtype, collector, self.name_s)
            for n in res_ops.stress_group(spec)
        )
        return out


@dataclasses.dataclass(frozen=True)
class FieldTarget:
    """Mean-square mismatch of selected field channels against bank targets.

    ``channels`` lists output-channel names; the prefix ``dt:`` selects the
    time derivative of a channel instead (used for zero-initial-velocity
    conditions in the second-order formulation and for the particular-solution
    pretraining loss, train.py:201-215).  Targets are taken from
    ``bank.values[target_key]`` (one column per channel, in order) or default
    to zero.  ``net`` selects a composite sub-network view.
    """

    name: str
    channels: Tuple[str, ...]
    target_key: Optional[str] = None
    net: Optional[str] = None

    def evaluate(self, model, params, mat: Material, bank: PointBank,
                 accum_dtype=None, collector=None):
        del mat
        net, net_params = _net_view(model, params, self.net)
        needs_dt = any(c.startswith(DT_PREFIX) for c in self.channels)
        if needs_dt:
            jet = net.jet(net_params, bank.xyt, order=1)
            fields, dt = jet.f, jet.dt
        else:
            fields, dt = net.apply(net_params, bank.xyt), None

        targets = bank.values.get(self.target_key) if self.target_key else None
        total = jnp.zeros((), accum_dtype or fields.dtype)
        for j, ch in enumerate(self.channels):
            if ch.startswith(DT_PREFIX):
                pred = dt[:, net.spec.index(ch[len(DT_PREFIX):])]
            else:
                pred = fields[:, net.spec.index(ch)]
            if targets is not None:
                tgt = targets[:, j] if targets.ndim > 1 else targets
                pred = pred - tgt
            total = total + _mms(pred, bank.mask, accum_dtype, collector,
                                 self.name)
        return {self.name: total}


@dataclasses.dataclass(frozen=True)
class Traction:
    """Surface-traction residual t = sigma·n against optional targets.

    Normals come from ``bank.values['normals']`` ((N, ndim)); targets
    (tx, ty[, tz]) from ``bank.values[target_key]`` or zero (traction-free).
    Covers the reference's hole loss (train.py:192-193) and general
    ``net_surf_var`` edges.
    """

    name: str
    target_key: Optional[str] = None
    net: Optional[str] = None

    def evaluate(self, model, params, mat: Material, bank: PointBank,
                 accum_dtype=None, collector=None):
        del mat
        net, net_params = _net_view(model, params, self.net)
        fields = net.apply(net_params, bank.xyt)
        normals = bank.values["normals"]
        if net.spec.ndim == 2:
            tx, ty = trac_ops.traction_2d(fields, net.spec, normals[:, 0], normals[:, 1])
            comps = (tx, ty)
        else:
            comps = trac_ops.traction_3d(
                fields, net.spec, normals[:, 0], normals[:, 1], normals[:, 2]
            )
        targets = bank.values.get(self.target_key) if self.target_key else None
        total = jnp.zeros((), accum_dtype or fields.dtype)
        for j, c in enumerate(comps):
            if targets is not None:
                c = c - targets[:, j]
            total = total + _mms(c, bank.mask, accum_dtype, collector,
                                 self.name)
        return {self.name: total}


@dataclasses.dataclass(frozen=True)
class Regression:
    """Channel-wise regression of a (sub-)network against bank targets —
    the distance-net pretraining loss (train.py:194-198)."""

    name: str
    target_key: str = "targets"
    net: Optional[str] = None

    def evaluate(self, model, params, mat: Material, bank: PointBank,
                 accum_dtype=None, collector=None):
        del mat
        net, net_params = _net_view(model, params, self.net)
        pred = net.apply(net_params, bank.xyt)
        targets = bank.values[self.target_key]
        total = jnp.zeros((), accum_dtype or pred.dtype)
        for j in range(pred.shape[1]):
            total = total + _mms(
                pred[:, j] - targets[:, j], bank.mask, accum_dtype,
                collector, self.name,
            )
        return {self.name: total}


@dataclasses.dataclass(frozen=True)
class LossSpec:
    """A case's loss: (bank_name, term) pairs + per-component weights.

    Components with weight 0 are still evaluated and reported (the reference
    computes-but-excludes loss_NB in the infinite case, ElasticWaveInfinite/
    ElasticWave.py:118-119); components absent from ``weights`` default to 0.
    """

    terms: Tuple[Tuple[str, object], ...]
    weights: Tuple[Tuple[str, float], ...]
    # Extended-precision reduction tail: "float64" upcasts every component's
    # square-and-mean (and the weighted total) while jets stay in the model's
    # compute dtype.  This restores loss-difference resolution for the
    # L-BFGS line search far below f32's 1e-7 floor at a few percent cost —
    # the TPU endgame path (the reference gets this by training entirely in
    # f64 on CPU, train.py:115).
    accum_dtype: Optional[str] = None

    def weight_map(self) -> Dict[str, float]:
        return dict(self.weights)

    def evaluate(self, model, params, mat: Material,
                 banks: Dict[str, PointBank], collector=None):
        """Returns (total_scalar, components_dict).

        ``collector`` (banks.ChunkSumCollector) additionally records every
        component's per-chunk partial sums for host-f64 loss reconstruction.
        """
        adt = self.accum_dtype or None  # dtype-like string; jnp accepts it
        comps: Dict[str, object] = {}
        for bank_name, term in self.terms:
            out = term.evaluate(
                model, params, mat, banks[bank_name], accum_dtype=adt,
                collector=collector,
            )
            for k, v in out.items():
                comps[k] = comps.get(k, 0.0) + v
        wmap = self.weight_map()
        total = sum(wmap.get(k, 0.0) * v for k, v in comps.items())
        return total, comps
