"""Mixed-variable field models: network outputs are displacements AND stresses.

The reference's model zoo (SURVEY.md §2.2) has two formulations:

* ``second_order`` — 5 outputs [u, v, s11, s22, s12]; momentum balance needs
  u_tt via nested second-order autodiff
  (/root/reference/PlateHoleQuarter/train/train.py:358-439).
* ``first_order``  — 7 outputs [u, v, ut, vt, s11, s22, s12]; velocity is an
  explicit output so only first derivatives are ever taken
  (/root/reference/ElasticWaveConfined/ElasticWave.py:282-348).

3D extensions (BASELINE.json config #4) follow the same pattern with vector
displacement and 6-component stress.

A model is a *static* description (hashable, safe to close over in jit) plus a
separate params pytree.  ``CompositeFieldModel`` implements the hard-BC
construction u = P + D·ũ (train.py:382-387) as jet algebra, so derivatives of
the composite come out of the same fused forward passes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.jet import Jet
from . import mlp as mlp_mod

SECOND_ORDER = "second_order"
FIRST_ORDER = "first_order"

_TPU_PLATFORMS = ("tpu", "axon")


def _execution_platform() -> str:
    """Platform the computation will actually run on.

    ``jax.default_backend()`` is process-global and ignores
    ``jax.default_device`` scopes/config; honoring the configured default
    device keeps ``jet_impl='auto'`` consistent when a TPU-host process pins
    a case to CPU (otherwise it silently selects the non-interpret Pallas
    kernel and faults)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()

# Channel layouts, 2D.
CH_2D = {
    SECOND_ORDER: ("u", "v", "s11", "s22", "s12"),
    FIRST_ORDER: ("u", "v", "ut", "vt", "s11", "s22", "s12"),
}
# Channel layouts, 3D (BASELINE.json config #4).
CH_3D = {
    SECOND_ORDER: ("u", "v", "w", "s11", "s22", "s33", "s12", "s13", "s23"),
    FIRST_ORDER: (
        "u", "v", "w", "ut", "vt", "wt",
        "s11", "s22", "s33", "s12", "s13", "s23",
    ),
}


def channel_names(ndim: int, formulation: str) -> Tuple[str, ...]:
    table = CH_2D if ndim == 2 else CH_3D
    return table[formulation]


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static description of what the field network predicts."""

    ndim: int = 2
    formulation: str = FIRST_ORDER

    @property
    def n_inputs(self) -> int:
        return self.ndim + 1  # spatial coords + time

    @property
    def channels(self) -> Tuple[str, ...]:
        return channel_names(self.ndim, self.formulation)

    @property
    def n_outputs(self) -> int:
        return len(self.channels)

    @property
    def jet_order(self) -> int:
        # Second-order formulation needs d²/dt² of the displacement outputs.
        return 2 if self.formulation == SECOND_ORDER else 1

    def index(self, name: str) -> int:
        return self.channels.index(name)


@dataclasses.dataclass(frozen=True)
class MLPFieldModel:
    """Plain MLP field model (soft-BC cases)."""

    spec: FieldSpec
    hidden: Tuple[int, ...]
    normalize: bool = False
    lb: Optional[Tuple[float, ...]] = None
    ub: Optional[Tuple[float, ...]] = None
    # Matmul precision for this network's contractions: None (backend
    # default), "high", or "highest" (full-f32 passes; PINN derivative
    # accuracy can require this on TPU where the default uses bf16 passes).
    precision: Optional[str] = None
    # Jet implementation: "xla" (models/mlp.py), "pallas" (custom-VJP
    # fused kernels, kernels/fused_jet_vjp.py — 3.2x faster value+grad on
    # TPU at exact-f32 precision; falls back to interpret mode off-TPU),
    # or "auto" (pallas on TPU, xla elsewhere — the production default:
    # the kernel path is exact-match vs XLA-highest, tests/test_fused_vjp.py).
    jet_impl: str = "xla"

    @property
    def layers(self) -> Tuple[int, ...]:
        return (self.spec.n_inputs,) + self.hidden + (self.spec.n_outputs,)

    def init(self, key, dtype=jnp.float32):
        return mlp_mod.init_mlp(key, self.layers, dtype)

    def _norm_args(self):
        args = {"precision": self.precision}
        if not self.normalize:
            args.update({"lb": None, "ub": None})
        else:
            args.update({"lb": self.lb, "ub": self.ub})
        return args

    def apply(self, params, xyt: jax.Array) -> jax.Array:
        return mlp_mod.mlp_apply(params, xyt, **self._norm_args())

    def jet(self, params, xyt: jax.Array, order: Optional[int] = None) -> Jet:
        order = self.spec.jet_order if order is None else order
        impl = self.jet_impl
        if impl == "auto":
            impl = "pallas" if _execution_platform() in _TPU_PLATFORMS else "xla"
        if impl == "pallas":
            from ..kernels.fused_jet_vjp import fused_jet_vjp

            interpret = _execution_platform() not in _TPU_PLATFORMS
            lb = self.lb if self.normalize else None
            ub = self.ub if self.normalize else None
            return fused_jet_vjp(params, xyt, order, 512, interpret, lb, ub)
        return mlp_mod.mlp_jet(params, xyt, order=order, **self._norm_args())


@dataclasses.dataclass(frozen=True)
class CompositeFieldModel:
    """Hard-BC composite u = P + D·ũ per output channel (train.py:382-387).

    params pytree: {'uv': ..., 'dist': ..., 'part': ...}.  The ``dist``
    network is pretrained to regress analytic distance-to-constraint fields
    and ``part`` to satisfy the IC/BC values; during the main phase both are
    frozen and only ``uv`` trains (train.py:220-250).
    """

    spec: FieldSpec
    uv_hidden: Tuple[int, ...]
    dist_hidden: Tuple[int, ...]
    part_hidden: Tuple[int, ...]
    # normalize/lb/ub apply to the uv net ONLY (and only when uv_fourier is
    # set — the embedding needs inputs in [-1,1]); dist/part always see raw
    # coordinates (see _sub).
    normalize: bool = False
    lb: Optional[Tuple[float, ...]] = None
    ub: Optional[Tuple[float, ...]] = None
    precision: Optional[str] = None
    # Composite: the Pallas jet pays a fixed per-launch overhead, so it only
    # helps the big uv net; the tiny dist/part nets always use the XLA jet.
    jet_impl: str = "xla"
    # Random-Fourier-feature embedding on the uv net (0 = plain MLP) — the
    # spectral-bias lever for the small-magnitude stress fields
    # (models/fourier.py).  dist/part stay plain (they regress smooth
    # low-frequency targets).
    uv_fourier: int = 0
    uv_fourier_scale: float = 1.0

    def _sub(self, hidden, jet_impl: str = "xla") -> MLPFieldModel:
        # dist/part ALWAYS see raw coordinates: normalization is an
        # embedding concern of the uv net (it rides with the Fourier
        # features), and measured f64 pretraining of the dist net under
        # normalized inputs floors ~50x higher than with raw inputs
        # (1.1e-2 vs 2.2e-4 phase loss at 20k iters) — which would
        # silently degrade hard-BC enforcement for the whole composite.
        return MLPFieldModel(
            spec=self.spec,
            hidden=hidden,
            normalize=False,
            lb=None,
            ub=None,
            precision=self.precision,
            jet_impl=jet_impl,
        )

    @property
    def uv_net(self):
        if self.uv_fourier:
            from .fourier import FourierMLPFieldModel

            return FourierMLPFieldModel(
                spec=self.spec, hidden=self.uv_hidden,
                n_features=self.uv_fourier,
                feature_scale=self.uv_fourier_scale,
                normalize=self.normalize, lb=self.lb, ub=self.ub,
                precision=self.precision,
                jet_impl=self.jet_impl,
            )
        return self._sub(self.uv_hidden, jet_impl=self.jet_impl)

    @property
    def dist_net(self) -> MLPFieldModel:
        return self._sub(self.dist_hidden)

    @property
    def part_net(self) -> MLPFieldModel:
        return self._sub(self.part_hidden)

    def init(self, key, dtype=jnp.float32) -> Dict:
        ku, kd, kp = jax.random.split(key, 3)
        return {
            "uv": self.uv_net.init(ku, dtype),
            "dist": self.dist_net.init(kd, dtype),
            "part": self.part_net.init(kp, dtype),
        }

    def jet(self, params, xyt: jax.Array, order: Optional[int] = None) -> Jet:
        order = self.spec.jet_order if order is None else order
        impl = self.jet_impl
        if impl == "auto":
            impl = "pallas" if _execution_platform() in _TPU_PLATFORMS else "xla"
        if impl == "pallas" and not self.uv_fourier:
            # ONE launch for all three nets — remats uv+dist+part in VMEM,
            # reverses the product-rule combine in-kernel (1.23x forward,
            # removes two rounds of HBM traffic on the value+grad hot path).
            from ..kernels.fused_jet_vjp import fused_composite_jet_vjp

            interpret = _execution_platform() not in _TPU_PLATFORMS
            # All three sub-nets see raw coordinates here (normalize only
            # affects the Fourier uv net, which takes the XLA branch above).
            return fused_composite_jet_vjp(
                params, xyt, order, 512, interpret, None, None)
        uv = self.uv_net.jet(params["uv"], xyt, order=order)
        dist = self.dist_net.jet(params["dist"], xyt, order=order)
        part = self.part_net.jet(params["part"], xyt, order=order)
        return part + dist * uv

    def apply(self, params, xyt: jax.Array) -> jax.Array:
        uv = self.uv_net.apply(params["uv"], xyt)
        dist = self.dist_net.apply(params["dist"], xyt)
        part = self.part_net.apply(params["part"], xyt)
        return part + dist * uv
