"""First/second-order jet algebra for PINN residual assembly.

A :class:`Jet` carries a batch of field values together with their first
derivatives w.r.t. the spacetime inputs ``(x, y, t)`` (or ``(x, y, z, t)`` in
3D) and, optionally, the second derivative w.r.t. time.  Network forwards
propagate jets (see ``models/mlp.py``); composite hard-BC models combine jets
by linearity and the product rule; residual ops consume them.

This replaces the reference's nested ``tf.gradients`` calls
(/root/reference/PlateHoleQuarter/train/train.py:390-439), which re-ran the
network forward once per requested derivative.  Here a single stacked forward
produces every derivative the elastodynamics residuals need.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Jet:
    """Batched value + derivative bundle.

    Attributes:
      f:   (N, C) field values.
      d:   (A, N, C) first derivatives; axis 0 enumerates the input
           coordinates in order (x, y[, z], t).  ``None`` if not computed.
      dtt: (N, C) second derivative w.r.t. the last input coordinate (time),
           or ``None`` when the first-order formulation is in use.
    """

    f: jax.Array
    d: Optional[jax.Array] = None
    dtt: Optional[jax.Array] = None

    # -- channel selection -------------------------------------------------
    def __getitem__(self, idx) -> "Jet":
        """Select output channels (last axis)."""
        if isinstance(idx, int):
            idx = slice(idx, idx + 1)
        return Jet(
            f=self.f[..., idx],
            d=None if self.d is None else self.d[..., idx],
            dtt=None if self.dtt is None else self.dtt[..., idx],
        )

    @property
    def n_inputs(self) -> int:
        if self.d is None:
            raise ValueError("Jet carries no first derivatives")
        return self.d.shape[0]

    # -- derivative accessors ---------------------------------------------
    def dx(self, i: int) -> jax.Array:
        """First derivative w.r.t. input coordinate ``i`` — shape (N, C)."""
        return self.d[i]

    @property
    def dt(self) -> jax.Array:
        """First time derivative (time is always the last input coordinate)."""
        return self.d[-1]

    # -- algebra (linearity + product rule) --------------------------------
    def __add__(self, other: "Jet") -> "Jet":
        return Jet(
            f=self.f + other.f,
            d=_addn(self.d, other.d),
            dtt=_addn(self.dtt, other.dtt),
        )

    def __sub__(self, other: "Jet") -> "Jet":
        return Jet(
            f=self.f - other.f,
            d=_subn(self.d, other.d),
            dtt=_subn(self.dtt, other.dtt),
        )

    def __mul__(self, other) -> "Jet":
        if not isinstance(other, Jet):  # scalar / array constant
            return Jet(
                f=self.f * other,
                d=None if self.d is None else self.d * other,
                dtt=None if self.dtt is None else self.dtt * other,
            )
        # Product rule.  (fg)' = f'g + fg';  (fg)_tt = f_tt g + 2 f_t g_t + f g_tt.
        f = self.f * other.f
        d = None
        if self.d is not None and other.d is not None:
            d = self.d * other.f[None] + self.f[None] * other.d
        dtt = None
        if self.dtt is not None and other.dtt is not None:
            dtt = (
                self.dtt * other.f
                + 2.0 * self.dt * other.dt
                + self.f * other.dtt
            )
        return Jet(f=f, d=d, dtt=dtt)

    __rmul__ = __mul__


def _addn(a, b):
    if a is None or b is None:
        return None
    return a + b


def _subn(a, b):
    if a is None or b is None:
        return None
    return a - b


def input_jet(xyt: jax.Array, *, order: int = 1) -> Jet:
    """Seed jet for the network input: value = coordinates, d = identity.

    Args:
      xyt: (N, A) coordinates; the last column is time.
      order: 1 for first derivatives only, 2 to also track d²/dt².
    """
    n, a = xyt.shape
    eye = jnp.eye(a, dtype=xyt.dtype)  # (A, A)
    d = jnp.broadcast_to(eye[:, None, :], (a, n, a))
    dtt = jnp.zeros_like(xyt) if order >= 2 else None
    return Jet(f=xyt, d=d, dtt=dtt)


def jet_of_fn(fn_point, xyt: jax.Array, *, order: int = 1) -> Jet:
    """Jet of an arbitrary smooth per-point function via forward-mode AD.

    ``fn_point`` maps a single coordinate vector (A,) to field values (C,).
    Used for closed-form composite factors (analytic distance / particular
    fields, models/analytic_bc.py), which replace the reference's
    *regressed* dist/part networks (train.py:322-356) with exact functions —
    the derivatives the residual ops need come from ``jax.jvp`` instead of
    jet propagation through network layers.

    Cost: A jvp evaluations for ``d`` plus one second-order jvp for ``dtt``
    — negligible for the small closed-form expressions this is meant for,
    and XLA fuses them with the surrounding composite algebra.
    """
    n, a = xyt.shape

    f = jax.vmap(fn_point)(xyt)

    def dcol(i):
        e = jnp.zeros((a,), xyt.dtype).at[i].set(1.0)
        return jax.vmap(lambda p: jax.jvp(fn_point, (p,), (e,))[1])(xyt)

    d = jnp.stack([dcol(i) for i in range(a)], axis=0)

    dtt = None
    if order >= 2:
        et = jnp.zeros((a,), xyt.dtype).at[a - 1].set(1.0)

        def ft(p):
            return jax.jvp(fn_point, (p,), (et,))[1]

        dtt = jax.vmap(lambda p: jax.jvp(ft, (p,), (et,))[1])(xyt)
    return Jet(f=f, d=d, dtt=dtt)
