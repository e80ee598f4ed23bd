"""Fourier-feature field model (beyond-reference).

Random Fourier feature embeddings γ(x) = [sin(2π x·B), cos(2π x·B)] are the
standard remedy for PINN spectral bias on wave problems (Tancik et al. 2020;
widely used in PINN follow-ups to the reference).  The embedding's jet
propagation is analytic:

    z = 2π x·B           dz_i = 2π B[i]          z_tt = 0
    sin(z):  d = cos(z)·dz_i      dtt = -sin(z)·z_t²
    cos(z):  d = -sin(z)·dz_i     dtt = -cos(z)·z_t²

so the fused derivative machinery (models/mlp.py) continues after the
embedding unchanged.  Params are {'B': (A, F), 'mlp': [...]}: B is sampled
N(0, scale²) and trained jointly (learned Fourier features) unless frozen by
the optimizer partition.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.jet import Jet
from . import mlp as mlp_mod
from .fields import FieldSpec


@dataclasses.dataclass(frozen=True)
class FourierMLPFieldModel:
    """MLP field model with a random-Fourier-feature input embedding."""

    spec: FieldSpec
    hidden: Tuple[int, ...]
    n_features: int = 64          # F; embedding width is 2F
    feature_scale: float = 1.0    # stddev of B (frequency content)
    normalize: bool = False
    lb: Optional[Tuple[float, ...]] = None
    ub: Optional[Tuple[float, ...]] = None
    precision: Optional[str] = None
    # "xla" | "pallas" | "auto": with "pallas" the embedding's analytic jet
    # stays in XLA (tiny: one (N,A)@(A,F) matmul + sin/cos) and the MLP tail
    # runs through the fused seed-jet Pallas kernels
    # (kernels/fused_jet_vjp.py::fused_seed_jet_vjp) — same 3x+ value+grad
    # win as plain nets, fully differentiable incl. the B matrix.
    jet_impl: str = "xla"

    @property
    def layers(self) -> Tuple[int, ...]:
        return (2 * self.n_features,) + self.hidden + (self.spec.n_outputs,)

    def init(self, key, dtype=jnp.float32):
        kb, km = jax.random.split(key)
        b = self.feature_scale * jax.random.normal(
            kb, (self.spec.n_inputs, self.n_features), dtype
        )
        return {"B": b, "mlp": mlp_mod.init_mlp(km, self.layers, dtype)}

    def _normalized(self, x):
        if not self.normalize:
            return x, None
        lb = jnp.asarray(self.lb, x.dtype)
        ub = jnp.asarray(self.ub, x.dtype)
        scale = 2.0 / (ub - lb)
        return 2.0 * (x - lb) / (ub - lb) - 1.0, scale

    def _embed(self, params, x):
        xn, _ = self._normalized(x)
        z = 2.0 * jnp.pi * (xn @ params["B"])
        return jnp.concatenate([jnp.sin(z), jnp.cos(z)], axis=1)

    def apply(self, params, xyt: jax.Array) -> jax.Array:
        h = self._embed(params, xyt)
        return mlp_mod.mlp_apply(params["mlp"], h, precision=self.precision)

    def _embed_jet(self, params, xyt, order):
        """Analytic jet of the embedding: (h, d, dtt) as in the module doc."""
        n, a = xyt.shape
        dtype = xyt.dtype
        xn, scale = self._normalized(xyt)
        b = params["B"]
        z = 2.0 * jnp.pi * (xn @ b)            # (N, F)
        sin, cos = jnp.sin(z), jnp.cos(z)

        # dz_i = 2π·(scale_i)·B[i]  (constant per input coordinate).
        coef = 2.0 * jnp.pi * (scale if scale is not None
                               else jnp.ones((a,), dtype))
        dz = coef[:, None] * b                 # (A, F): dz_i = coef_i·B[i, :]
        h = jnp.concatenate([sin, cos], axis=1)
        d = jnp.concatenate(
            [cos[None] * dz[:, None, :], -sin[None] * dz[:, None, :]], axis=2
        )                                       # (A, N, 2F)
        dtt = None
        if order >= 2:
            zt2 = dz[-1][None, :] ** 2          # (1, F)
            dtt = jnp.concatenate([-sin * zt2, -cos * zt2], axis=1)
        return h, d, dtt

    def jet(self, params, xyt: jax.Array, order: Optional[int] = None) -> Jet:
        order = self.spec.jet_order if order is None else order
        h, d, dtt = self._embed_jet(params, xyt, order)
        from .fields import _TPU_PLATFORMS, _execution_platform

        impl = self.jet_impl
        if impl == "auto":
            impl = ("pallas" if _execution_platform() in _TPU_PLATFORMS
                    else "xla")
        if impl == "pallas":
            from ..kernels.fused_jet_vjp import fused_seed_jet_vjp

            interpret = _execution_platform() not in _TPU_PLATFORMS
            return fused_seed_jet_vjp(params["mlp"], h, d, dtt, 512,
                                      interpret)
        # Continue through the MLP with the generic jet propagation.
        return _mlp_jet_from_embedding(
            params["mlp"], h, d, dtt, precision=self.precision
        )


def _mlp_jet_from_embedding(mlp_params, h, d, dtt, precision=None):
    """Run mlp_jet's layer recurrence from a precomputed input jet."""
    prec = mlp_mod._resolve_precision(precision)
    for layer in mlp_params[:-1]:
        w, b = layer["W"], layer["b"]
        z, dz, ztt = mlp_mod._stacked_matmul(h, d, dtt, w, prec)
        z = z + b
        hh = jnp.tanh(z)
        g = 1.0 - hh * hh
        d = g[None] * dz
        if dtt is not None:
            zt = dz[-1]
            dtt = g * ztt - 2.0 * hh * g * (zt * zt)
        h = hh
    w, b = mlp_params[-1]["W"], mlp_params[-1]["b"]
    f, d, dtt = mlp_mod._stacked_matmul(h, d, dtt, w, prec)
    return Jet(f=f + b, d=d, dtt=dtt)
