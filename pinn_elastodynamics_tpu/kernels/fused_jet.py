"""Pallas TPU kernel: whole-network fused jet forward.

The XLA path (models/mlp.py::mlp_jet) materializes the stacked activation
tensor in HBM between layers.  This kernel keeps the ENTIRE network — all
layer weights (padded to 128 lanes) plus the stacked value/tangent/dtt
activations for a block of points — resident in VMEM and runs every layer
back-to-back per point block, so HBM traffic is one read of the inputs and
one write of the outputs.

Scope: forward jet evaluation (field rendering, residual probing, inference
serving).  The training path keeps the XLA jet (full autodiff support); this
kernel is a performance feature, not a correctness dependency (SURVEY.md
§7.1 item 7), and is cross-checked against the XLA jet in
tests/test_pallas_kernel.py (interpret mode on CPU, compiled on TPU).

Weight layout: hidden widths are zero-padded to a multiple of 128 (lane
width).  Zero rows/columns propagate zeros through matmul and tanh(0)=0, so
padding is numerically inert.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mlp import Params
from ..ops.jet import Jet

LANE = 128

# Matmul precision inside the kernels.  HIGHEST (full-f32 passes) is the
# production default: bf16-pass derivative noise breaks strong-Wolfe line
# searches (docs/ARCHITECTURE.md precision table).  The env knob exists for
# controlled experiments (scripts/mfu_experiment.py): HIGH = 3 bf16 passes
# (~2x MXU throughput vs HIGHEST's 6), DEFAULT = 1 pass.  Read at TRACE
# time — set it before the process first compiles; it is per-process, not
# per-call.
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def kernel_precision() -> jax.lax.Precision:
    import os

    return _PRECISIONS[
        os.environ.get("PINN_KERNEL_PRECISION", "highest").lower()]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_params(params: Params) -> Tuple[jax.Array, jax.Array, dict]:
    """Pad and stack MLP params for the kernel.

    Returns (W, B, meta): W is (L, P, P) with every layer's weight zero-padded
    to P = max padded width; B is (L, P).  The first layer's input rows sit in
    W[0, :A, :]; meta records true dims for slicing outputs.
    """
    dims = [params[0]["W"].shape[0]] + [l["W"].shape[1] for l in params]
    p = max(_round_up(int(d), LANE) for d in dims)
    n_layers = len(params)
    # jnp (not numpy) so params may be jit tracers; shapes are static.
    ws_layers = []
    bs_layers = []
    for layer in params:
        w = jnp.asarray(layer["W"], jnp.float32)
        b = jnp.asarray(layer["b"], jnp.float32)
        ws_layers.append(jnp.pad(
            w, ((0, p - w.shape[0]), (0, p - w.shape[1]))
        ))
        bs_layers.append(jnp.pad(b, (0, p - b.shape[0])))
    meta = {"dims": [int(d) for d in dims], "padded": p, "n_layers": n_layers}
    return jnp.stack(ws_layers), jnp.stack(bs_layers), meta


def _run_layers(s, w_ref, b_ref, *, n_layers: int, n_streams: int,
                block: int, order: int):
    """Run one MLP's layers over the stacked streams (VMEM arrays in, out).

    s: (n_streams*block, P) stacked [value; tangents...; dtt] rows.
    """
    for l in range(n_layers):
        z = jnp.dot(s, w_ref[l], preferred_element_type=jnp.float32,
                    precision=kernel_precision())
        if l == n_layers - 1:
            # Linear head: bias on the value rows only.  (Slice+concat —
            # scatter-add doesn't lower in Pallas TPU.)
            zv = z[0:block, :] + b_ref[l][None, :]
            s = jnp.concatenate([zv, z[block:, :]], axis=0)
        else:
            zv = z[0:block, :] + b_ref[l][None, :]
            h = jnp.tanh(zv)
            g = 1.0 - h * h
            # Tangent streams: dh_i = g * dz_i (g broadcast per point row).
            n_tan = n_streams - 1 - (1 if order >= 2 else 0)
            parts = [h]
            for t in range(n_tan):
                dz = z[(1 + t) * block:(2 + t) * block, :]
                parts.append(g * dz)
            if order >= 2:
                zt = z[n_tan * block:(1 + n_tan) * block, :]
                ztt = z[(n_streams - 1) * block: n_streams * block, :]
                parts.append(g * ztt - 2.0 * h * g * (zt * zt))
            s = jnp.concatenate(parts, axis=0)
    return s


def _kernel(x_ref, w_ref, b_ref, out_ref, *, n_layers: int, n_streams: int,
            block: int, order: int):
    """One point-block: run all layers over the stacked streams in VMEM."""
    out_ref[0] = _run_layers(
        x_ref[0], w_ref, b_ref, n_layers=n_layers, n_streams=n_streams,
        block=block, order=order,
    )


def _composite_kernel(x_ref, wu_ref, bu_ref, wd_ref, bd_ref, wp_ref, bp_ref,
                      out_ref, *, layers_uvdp: Tuple[int, int, int],
                      n_streams: int, block: int, order: int):
    """Hard-BC composite ``part + dist * uv`` in ONE launch.

    Runs the three sub-networks back-to-back on the same VMEM-resident
    point block (they share the seed streams: same inputs, same identity
    tangents) and combines their jets by the product rule in VMEM — one
    HBM read of the seed, one HBM write of the composite jet, instead of
    three separate kernel round-trips (VERDICT r2 next-step #5; the
    reference assembles the composite from three separate TF graphs,
    /root/reference/PlateHoleQuarter/train/train.py:382-387).
    """
    lu, ld, lp = layers_uvdp
    x = x_ref[0]
    kw = dict(n_streams=n_streams, block=block, order=order)
    su = _run_layers(x, wu_ref, bu_ref, n_layers=lu, **kw)
    sd = _run_layers(x, wd_ref, bd_ref, n_layers=ld, **kw)
    sp = _run_layers(x, wp_ref, bp_ref, n_layers=lp, **kw)

    a = n_streams - 1 - (1 if order >= 2 else 0)  # #input tangents
    uf, df, pf = su[0:block], sd[0:block], sp[0:block]
    parts = [pf + df * uf]
    for i in range(a):
        r0, r1 = (1 + i) * block, (2 + i) * block
        parts.append(sp[r0:r1] + sd[r0:r1] * uf + df * su[r0:r1])
    if order >= 2:
        t0, t1 = a * block, (1 + a) * block          # time tangent rows
        q0, q1 = (1 + a) * block, (2 + a) * block    # dtt rows
        parts.append(
            sp[q0:q1]
            + sd[q0:q1] * uf
            + 2.0 * sd[t0:t1] * su[t0:t1]
            + df * su[q0:q1]
        )
    out_ref[0] = jnp.concatenate(parts, axis=0)


@partial(jax.jit, static_argnames=("meta_key", "order", "block", "interpret"))
def _fused_jet_padded(x_blocks, ws, bs, meta_key, order, block, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers, p, n_streams = meta_key
    rows = n_streams * block
    n_blocks = x_blocks.shape[0]

    # Index maps must return int32: under jax_enable_x64 a literal Python 0
    # canonicalizes to i64 and Mosaic fails to legalize the map's return
    # (extended-precision training runs enable x64 for the f64 loss tail).
    z = lambda: jnp.asarray(0, jnp.int32)
    out = pl.pallas_call(
        partial(_kernel, n_layers=n_layers, n_streams=n_streams, block=block,
                order=order),
        out_shape=jax.ShapeDtypeStruct((n_blocks, rows, p), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, rows, p), lambda i: (i, z(), z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, p, p), lambda i: (z(), z(), z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, p), lambda i: (z(), z()),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, p), lambda i: (i, z(), z()),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_blocks, ws, bs)
    return out


def fused_jet(
    params: Params,
    x: jax.Array,
    *,
    order: int = 1,
    lb=None,
    ub=None,
    block: int = 512,
    interpret: bool = False,
) -> Jet:
    """Drop-in fused-kernel version of ``mlp_jet`` (f32).

    Pads N to a block multiple and the widths to 128 lanes; returns exactly
    the Jet ``mlp_jet`` would (same math, one VMEM-resident pass).
    """
    ws, bs, meta = pack_params(params)
    n, a = x.shape
    p = meta["padded"]
    n_streams = 1 + a + (1 if order >= 2 else 0)
    # Cap the block by the ~16MB scoped-VMEM budget: in+out blocks plus a
    # few unrolled-loop temporaries are each (n_streams*block, P) floats.
    vmem_budget = 10 * 1024 * 1024
    per_point = 6 * n_streams * p * 4
    block = min(block, max(32, (vmem_budget // per_point) // 32 * 32))
    n_pad = _round_up(max(n, block), block)

    x32 = jnp.asarray(x, jnp.float32)
    if lb is not None:
        lb_ = jnp.asarray(lb, jnp.float32)
        ub_ = jnp.asarray(ub, jnp.float32)
        h0 = 2.0 * (x32 - lb_) / (ub_ - lb_) - 1.0
        scale = 2.0 / (ub_ - lb_)
        eye = jnp.eye(a, dtype=jnp.float32) * scale[None, :]
    else:
        h0 = x32
        eye = jnp.eye(a, dtype=jnp.float32)

    # Build stacked, width-padded, block-interleaved input:
    # (n_blocks, n_streams*block, P) with per-block layout [value; tangents;
    # dtt] so the kernel's row arithmetic stays local to its block.
    def pad_n(arr):
        return jnp.pad(arr, ((0, n_pad - n), (0, p - arr.shape[1])))

    streams = [pad_n(h0)]
    for i in range(a):
        streams.append(pad_n(jnp.broadcast_to(eye[i][None, :], (n, a))))
    if order >= 2:
        streams.append(pad_n(jnp.zeros((n, a), jnp.float32)))
    stacked = jnp.stack(streams, axis=0)  # (S, n_pad, P)
    n_blocks = n_pad // block
    interleaved = (
        stacked.reshape(n_streams, n_blocks, block, p)
        .transpose(1, 0, 2, 3)
        .reshape(n_blocks, n_streams * block, p)
    )

    meta_key = (meta["n_layers"], p, n_streams)
    out = _fused_jet_padded(
        interleaved, ws, bs, meta_key, order, block, interpret,
    )
    # De-interleave: (n_blocks, S*block, P) -> (S, n_pad, P).
    out = (
        out.reshape(n_blocks, n_streams, block, p)
        .transpose(1, 0, 2, 3)
        .reshape(n_streams, n_pad, p)
    )
    c = meta["dims"][-1]
    f = out[0, :n, :c]
    d = out[1 : 1 + a, :n, :c]
    dtt = out[1 + a, :n, :c] if order >= 2 else None
    return Jet(f=f, d=d, dtt=dtt)


@partial(jax.jit, static_argnames=("meta_key", "order", "block", "interpret"))
def _fused_composite_padded(x_blocks, wu, bu, wd, bd, wp, bp, meta_key,
                            order, block, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    layers_uvdp, p, n_streams = meta_key
    rows = n_streams * block
    n_blocks = x_blocks.shape[0]
    z = lambda: jnp.asarray(0, jnp.int32)  # int32 index maps (x64-safe)

    def wspec(n_layers):
        return pl.BlockSpec((n_layers, p, p), lambda i: (z(), z(), z()),
                            memory_space=pltpu.VMEM)

    def bspec(n_layers):
        return pl.BlockSpec((n_layers, p), lambda i: (z(), z()),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_composite_kernel, layers_uvdp=layers_uvdp,
                n_streams=n_streams, block=block, order=order),
        out_shape=jax.ShapeDtypeStruct((n_blocks, rows, p), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, rows, p), lambda i: (i, z(), z()),
                         memory_space=pltpu.VMEM),
            wspec(layers_uvdp[0]), bspec(layers_uvdp[0]),
            wspec(layers_uvdp[1]), bspec(layers_uvdp[1]),
            wspec(layers_uvdp[2]), bspec(layers_uvdp[2]),
        ],
        out_specs=pl.BlockSpec((1, rows, p), lambda i: (i, z(), z()),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_blocks, wu, bu, wd, bd, wp, bp)
    return out


def fused_composite_jet(
    params: dict,
    x: jax.Array,
    *,
    order: int = 2,
    lb=None,
    ub=None,
    block: int = 512,
    interpret: bool = False,
) -> Jet:
    """One-launch composite jet: part + dist·uv with in-VMEM product rule.

    Exactly models/fields.py::CompositeFieldModel.jet, but the three
    sub-network forwards and the jet combination run inside a single Pallas
    kernel (one seed read, one composite write)."""
    packs = {k: pack_params(params[k]) for k in ("uv", "dist", "part")}
    p = max(m["padded"] for _, _, m in packs.values())
    for k, (w, b, m) in packs.items():
        if m["padded"] != p:  # repad to the common lane width
            w = jnp.pad(w, ((0, 0), (0, p - w.shape[1]), (0, p - w.shape[2])))
            b = jnp.pad(b, ((0, 0), (0, p - b.shape[1])))
            packs[k] = (w, b, m)
    n, a = x.shape
    n_streams = 1 + a + (1 if order >= 2 else 0)
    # VMEM: seed + per-net stream stacks (uv's kept live through the
    # combine) + output + unrolled-loop temporaries.
    vmem_budget = 10 * 1024 * 1024
    per_point = 10 * n_streams * p * 4
    block = min(block, max(32, (vmem_budget // per_point) // 32 * 32))
    n_pad = _round_up(max(n, block), block)

    x32 = jnp.asarray(x, jnp.float32)
    if lb is not None:
        lb_ = jnp.asarray(lb, jnp.float32)
        ub_ = jnp.asarray(ub, jnp.float32)
        h0 = 2.0 * (x32 - lb_) / (ub_ - lb_) - 1.0
        scale = 2.0 / (ub_ - lb_)
        eye = jnp.eye(a, dtype=jnp.float32) * scale[None, :]
    else:
        h0 = x32
        eye = jnp.eye(a, dtype=jnp.float32)

    def pad_n(arr):
        return jnp.pad(arr, ((0, n_pad - n), (0, p - arr.shape[1])))

    streams = [pad_n(h0)]
    for i in range(a):
        streams.append(pad_n(jnp.broadcast_to(eye[i][None, :], (n, a))))
    if order >= 2:
        streams.append(pad_n(jnp.zeros((n, a), jnp.float32)))
    stacked = jnp.stack(streams, axis=0)
    n_blocks = n_pad // block
    interleaved = (
        stacked.reshape(n_streams, n_blocks, block, p)
        .transpose(1, 0, 2, 3)
        .reshape(n_blocks, n_streams * block, p)
    )

    layers_uvdp = tuple(packs[k][2]["n_layers"] for k in ("uv", "dist", "part"))
    meta_key = (layers_uvdp, p, n_streams)
    wu, bu, _ = packs["uv"]
    wd, bd, _ = packs["dist"]
    wp, bp, _ = packs["part"]
    out = _fused_composite_padded(
        interleaved, wu, bu, wd, bd, wp, bp, meta_key, order, block,
        interpret,
    )
    out = (
        out.reshape(n_blocks, n_streams, block, p)
        .transpose(1, 0, 2, 3)
        .reshape(n_streams, n_pad, p)
    )
    c = packs["uv"][2]["dims"][-1]
    f = out[0, :n, :c]
    d = out[1 : 1 + a, :n, :c]
    dtt = out[1 + a, :n, :c] if order >= 2 else None
    return Jet(f=f, d=d, dtt=dtt)


def _pack_seed(h0, d, dtt, block):
    """Pad + interleave a precomputed seed jet into kernel stream blocks.

    h0: (N, E) value rows; d: (A, N, E) tangent rows; dtt: (N, E) or None.
    Returns (interleaved, n, n_pad, n_blocks, block, e, p, n_streams).
    """
    n, e = h0.shape
    a = d.shape[0]
    n_streams = 1 + a + (1 if dtt is not None else 0)
    p = _round_up(e, LANE)
    n_pad = _round_up(max(n, block), block)

    def pad_n(arr):
        arr = jnp.asarray(arr, jnp.float32)
        return jnp.pad(arr, ((0, n_pad - n), (0, p - arr.shape[1])))

    streams = [pad_n(h0)] + [pad_n(d[i]) for i in range(a)]
    if dtt is not None:
        streams.append(pad_n(dtt))
    stacked = jnp.stack(streams, axis=0)
    n_blocks = n_pad // block
    interleaved = (
        stacked.reshape(n_streams, n_blocks, block, p)
        .transpose(1, 0, 2, 3)
        .reshape(n_blocks, n_streams * block, p)
    )
    return interleaved, n, n_pad, n_blocks, p, n_streams


def fused_seed_jet(
    params: Params,
    h0: jax.Array,
    d: jax.Array,
    dtt: Optional[jax.Array] = None,
    *,
    block: int = 512,
    interpret: bool = False,
) -> Jet:
    """Fused jet seeded by a PRECOMPUTED input jet (embedding output).

    Same kernel as :func:`fused_jet`, but the seed streams are supplied by
    the caller instead of being the identity jet of raw coordinates — the
    entry point for embedded nets (Fourier features, models/fourier.py)
    whose input jet is analytic.  ``h0`` (N, E) value rows, ``d`` (A, N, E)
    tangent rows, ``dtt`` optional (N, E) second-time rows; E must not
    exceed the padded width of the first MLP layer.
    """
    ws, bs, meta = pack_params(params)
    order = 2 if dtt is not None else 1
    a = d.shape[0]
    p = meta["padded"]
    if _round_up(h0.shape[1], LANE) > p:
        raise ValueError(
            f"seed width {h0.shape[1]} exceeds padded layer width {p}")
    n_streams = 1 + a + (1 if dtt is not None else 0)
    vmem_budget = 10 * 1024 * 1024
    per_point = 6 * n_streams * p * 4
    block = min(block, max(32, (vmem_budget // per_point) // 32 * 32))
    # Repad seed streams to the MLP's padded width via _pack_seed on p-wide
    # zero-extended inputs.
    pad_e = lambda arr: jnp.pad(
        jnp.asarray(arr, jnp.float32),
        [(0, 0)] * (arr.ndim - 1) + [(0, p - arr.shape[-1])])
    interleaved, n, n_pad, n_blocks, p2, _ = _pack_seed(
        pad_e(h0), pad_e(d), None if dtt is None else pad_e(dtt), block)
    assert p2 == p
    meta_key = (meta["n_layers"], p, n_streams)
    out = _fused_jet_padded(
        interleaved, ws, bs, meta_key, order, block, interpret,
    )
    out = (
        out.reshape(n_blocks, n_streams, block, p)
        .transpose(1, 0, 2, 3)
        .reshape(n_streams, n_pad, p)
    )
    c = meta["dims"][-1]
    f = out[0, :n, :c]
    dj = out[1 : 1 + a, :n, :c]
    djtt = out[1 + a, :n, :c] if dtt is not None else None
    return Jet(f=f, d=dj, dtt=djtt)


def model_fused_jet(model, params, x: jax.Array, order=None,
                    interpret: bool = False) -> Jet:
    """Fused-kernel jet for a field model (plain MLP or hard-BC composite).

    The composite u = P + D·ũ runs as ONE kernel launch
    (:func:`fused_composite_jet`); a Fourier-embedded uv net falls back to
    per-net launches + host jet algebra.  Pass ``interpret=True`` off-TPU.
    """
    order = model.spec.jet_order if order is None else order
    kw = dict(order=order, interpret=interpret)
    if model.normalize:
        kw.update(lb=model.lb, ub=model.ub)
    if hasattr(model, "uv_hidden"):  # CompositeFieldModel
        if not getattr(model, "uv_fourier", 0):
            return fused_composite_jet(params, x, **kw)
        uv = model.uv_net.jet(params["uv"], x, order=order)
        dist = fused_jet(params["dist"], x, **kw)
        part = fused_jet(params["part"], x, **kw)
        return part + dist * uv
    return fused_jet(params, x, **kw)
