"""Tanh MLP core with fused jet (value + derivative) propagation.

Mirrors the reference network family — dense tanh MLP with a linear head and
truncated-normal Xavier init (/root/reference/PlateHoleQuarter/train/
train.py:258-320) and the optional ``[-1, 1]`` input normalization used by the
float32 wave case (/root/reference/ElasticWaveInfinite/ElasticWave.py:191) —
but is built TPU-first: ``mlp_jet`` propagates the value, all first input
derivatives, and (optionally) the second time derivative through the network
in a single stacked matmul per layer.  For a batch of N points and derivative
order 2 over A inputs that is one (A+2)·N × width matmul per layer on the MXU
instead of the reference's one extra full forward per ``tf.gradients`` call.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.jet import Jet

Params = List[dict]  # [{'W': (in, out), 'b': (out,)} per layer]


def truncated_normal_xavier(key, shape, dtype):
    """Xavier/Glorot stddev with a 2-sigma truncated normal draw.

    Matches the reference init (train.py:269-274), which uses
    ``tf.truncated_normal(stddev=sqrt(2/(fan_in+fan_out)))``.
    """
    fan_in, fan_out = shape
    stddev = np.sqrt(2.0 / (fan_in + fan_out))
    # jax.random.truncated_normal samples from a unit normal truncated to
    # [-2, 2], same convention as tf.truncated_normal (which then scales).
    u = jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return u * jnp.asarray(stddev, dtype)


def init_mlp(key, layers: Sequence[int], dtype=jnp.float32) -> Params:
    """Initialize an MLP ``layers = [in, h1, ..., out]`` as a param pytree."""
    params = []
    keys = jax.random.split(key, len(layers) - 1)
    for k, fan_in, fan_out in zip(keys, layers[:-1], layers[1:]):
        params.append(
            {
                "W": truncated_normal_xavier(k, (fan_in, fan_out), dtype),
                "b": jnp.zeros((fan_out,), dtype),
            }
        )
    return params


def mlp_layers(params: Params) -> List[int]:
    dims = [int(params[0]["W"].shape[0])]
    dims += [int(layer["W"].shape[1]) for layer in params]
    return dims


def _resolve_precision(precision):
    if precision is None:
        return None
    import jax
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision]


def _normalize(x, lb, ub):
    lb = jnp.asarray(lb, x.dtype)
    ub = jnp.asarray(ub, x.dtype)
    return 2.0 * (x - lb) / (ub - lb) - 1.0


def mlp_apply(
    params: Params,
    x: jax.Array,
    *,
    lb: Optional[jax.Array] = None,
    ub: Optional[jax.Array] = None,
    precision: Optional[str] = None,
) -> jax.Array:
    """Plain forward: tanh hidden layers, linear head.

    ``lb``/``ub`` enable the reference's input normalization
    (ElasticWaveInfinite/ElasticWave.py:191); pass None to disable, matching
    the other three cases.
    """
    prec = _resolve_precision(precision)
    h = x if lb is None else _normalize(x, lb, ub)
    for layer in params[:-1]:
        h = jnp.tanh(jnp.matmul(h, layer["W"], precision=prec) + layer["b"])
    last = params[-1]
    return jnp.matmul(h, last["W"], precision=prec) + last["b"]


def mlp_jet(
    params: Params,
    x: jax.Array,
    *,
    order: int = 1,
    lb: Optional[jax.Array] = None,
    ub: Optional[jax.Array] = None,
    precision: Optional[str] = None,
) -> Jet:
    """Forward pass that propagates the full derivative jet.

    Args:
      params: MLP parameters.
      x: (N, A) input coordinates, time last.
      order: 1 → values + first derivatives; 2 → also d²/dt².
    Returns:
      Jet with f (N, C), d (A, N, C), and dtt (N, C) when ``order == 2``.

    The propagation rules per layer (z = h_prev @ W + b, h = tanh(z)):
      dh_i   = (1 - h²) · dz_i
      h_tt   = (1 - h²) · z_tt - 2 h (1 - h²) · z_t²
    All A+1 (+1 for dtt) streams share the layer matmul by stacking along the
    batch axis, so XLA sees one large MXU-friendly contraction per layer.
    """
    n, a = x.shape
    dtype = x.dtype
    prec = _resolve_precision(precision)

    if lb is None:
        h = x
        d = jnp.broadcast_to(jnp.eye(a, dtype=dtype)[:, None, :], (a, n, a))
    else:
        lb_ = jnp.asarray(lb, dtype)
        ub_ = jnp.asarray(ub, dtype)
        h = _normalize(x, lb_, ub_)
        scale = 2.0 / (ub_ - lb_)  # (A,)
        d = jnp.broadcast_to(
            (jnp.eye(a, dtype=dtype) * scale[None, :])[:, None, :], (a, n, a)
        )
    dtt = jnp.zeros((n, a), dtype) if order >= 2 else None

    for layer in params[:-1]:
        w, b = layer["W"], layer["b"]
        z, dz, ztt = _stacked_matmul(h, d, dtt, w, prec)
        z = z + b
        hh = jnp.tanh(z)
        g = 1.0 - hh * hh  # tanh'
        d = g[None] * dz
        if dtt is not None:
            zt = dz[-1]
            dtt = g * ztt - 2.0 * hh * g * (zt * zt)
        h = hh

    w, b = params[-1]["W"], params[-1]["b"]
    f, d, dtt = _stacked_matmul(h, d, dtt, w, prec)
    return Jet(f=f + b, d=d, dtt=dtt)


def _stacked_matmul(h, d, dtt, w, precision=None):
    """One matmul for the value, A tangent, and (optional) dtt streams."""
    n = h.shape[0]
    a = d.shape[0]
    streams = [h[None], d]
    if dtt is not None:
        streams.append(dtt[None])
    stacked = jnp.concatenate(streams, axis=0)  # (K, N, in)
    k = stacked.shape[0]
    # N-MAJOR merge to one (N*K, in) GEMM.  A K-major reshape ((K*N, in))
    # merges the replicated stream axis OVER the sharded points axis, which
    # GSPMD cannot keep partitioned: it all-gathered every bank and every
    # device redid the whole computation (the r3 scaling curve's n^2
    # work-replication signature, docs/scaling_curve.json).  Merging with
    # the sharded axis MAJOR keeps each device's rows contiguous, so the
    # points sharding survives the reshape (0 all-gathers), while the
    # single flattened GEMM keeps the fast CPU/MXU path (a 3-D batched
    # matmul was ~1.5x slower through the backward on CPU).
    merged = jnp.swapaxes(stacked, 0, 1).reshape(n * k, -1)
    out = jnp.swapaxes(
        jnp.matmul(merged, w, precision=precision).reshape(n, k, -1), 0, 1
    )
    z = out[0]
    dz = out[1 : 1 + a]
    ztt = out[1 + a] if dtt is not None else None
    return z, dz, ztt
