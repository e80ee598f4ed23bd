"""Custom-VJP fused jet: training-path Pallas kernels.

``fused_jet_vjp`` computes the same Jet as ``fused_jet`` but is
differentiable w.r.t. the MLP parameters (and inputs) through a hand-derived
backward implemented as a second Pallas kernel:

* forward — the whole-network VMEM-resident kernel (fused_jet.py);
* backward — per point-block, RECOMPUTES the forward with all layer
  activations in VMEM scratch (block-local rematerialization: no HBM
  activation traffic at all), then runs the reverse stacked-stream sweep,
  accumulating dW/db across grid steps in a revisited output block (TPU grid
  execution is sequential, so read-modify-write accumulation is safe).

The reverse recurrence (validated against jax.vjp to 1e-15 in
tests/test_fused_vjp.py; streams: value h, tangents dz_i, optional dtt):

    hidden layer forward:  Z = S_in W;  h = tanh(Z0 + b);  g = 1 - h²
                           out = [h; g·Z_i ...; g·Z_tt - 2 h g Z_t²]
    backward (cotangents c_h, c_i, c_tt):
        ĉ_h  = c_h - 2h·Σ_i c_i⊙Z_i  (+ c_tt⊙(-2h·Z_tt - 2(1-3h²)Z_t²))
        ĉ_i  = g⊙c_i                  (+ i=t: c_tt⊙(-4 h g Z_t))
        ĉ_tt = g⊙c_tt
        ĉ_0  = g⊙ĉ_h
        dW  += S_inᵀ [ĉ_0; ĉ_i...; ĉ_tt];   db += Σ_batch ĉ_0
        dS_in = [ĉ_0; ...] Wᵀ
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.jet import Jet
from .fused_jet import (
    LANE,
    _round_up,
    fused_jet,
    kernel_precision,
    pack_params,
)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _remat_forward(s, w_ref, b_ref, s_scratch, *, n_layers: int,
                   n_streams: int, block: int, order: int):
    """Forward remat of one MLP, saving every layer's input activations
    into ``s_scratch`` (VMEM).  Mirrors fused_jet._run_layers minus the
    final linear layer (whose input is what the backward needs)."""
    s_scratch[0] = s
    for l in range(n_layers - 1):
        z = jnp.dot(s, w_ref[l], preferred_element_type=jnp.float32,
                    precision=kernel_precision())
        zv = z[0:block, :] + b_ref[l][None, :]
        h = jnp.tanh(zv)
        g = 1.0 - h * h
        n_tan = n_streams - 1 - (1 if order >= 2 else 0)
        parts = [h]
        for t in range(n_tan):
            parts.append(g * z[(1 + t) * block:(2 + t) * block, :])
        if order >= 2:
            zt = z[n_tan * block:(1 + n_tan) * block, :]
            ztt = z[(n_streams - 1) * block: n_streams * block, :]
            parts.append(g * ztt - 2.0 * h * g * (zt * zt))
        s = jnp.concatenate(parts, axis=0)
        s_scratch[l + 1] = s


def _reverse_sweep(c, w_ref, b_ref, s_scratch, dw_ref, db_ref, *,
                   n_layers: int, n_streams: int, block: int, order: int):
    """Reverse stacked-stream sweep of one MLP from output cotangents ``c``;
    accumulates dW/db into the (grid-revisited) output refs and returns the
    full seed-stream cotangent stack."""
    s_last = s_scratch[n_layers - 1]
    dw_ref[n_layers - 1] += jnp.dot(
        s_last.T, c, preferred_element_type=jnp.float32,
        precision=kernel_precision(),
    )
    db_ref[n_layers - 1] += jnp.sum(c[0:block, :], axis=0)
    c = jnp.dot(c, w_ref[n_layers - 1].T, preferred_element_type=jnp.float32,
                precision=kernel_precision())

    for l in range(n_layers - 2, -1, -1):
        s_in = s_scratch[l]
        s_out = s_scratch[l + 1]
        h = s_out[0:block, :]
        g = 1.0 - h * h
        # Recompute this layer's pre-activation tangent/dtt streams.
        z_rest = jnp.dot(
            s_in[block:, :], w_ref[l], preferred_element_type=jnp.float32,
            precision=kernel_precision(),
        )                                        # ((S-1)*B, P)
        n_tan = n_streams - 1 - (1 if order >= 2 else 0)

        c_h = c[0:block, :]
        # Σ_i c_i ⊙ Z_i over tangent streams.
        acc = jnp.zeros_like(c_h)
        for t in range(n_tan):
            acc = acc + (c[(1 + t) * block:(2 + t) * block, :]
                         * z_rest[t * block:(t + 1) * block, :])
        chh = c_h - 2.0 * h * acc
        c_parts = []
        for t in range(n_tan):
            ci = g * c[(1 + t) * block:(2 + t) * block, :]
            c_parts.append(ci)
        if order >= 2:
            zt = z_rest[(n_tan - 1) * block: n_tan * block, :]
            ztt = z_rest[(n_streams - 2) * block:(n_streams - 1) * block, :]
            ctt = c[(n_streams - 1) * block: n_streams * block, :]
            chh = chh + ctt * (-2.0 * h * ztt
                               - 2.0 * (1.0 - 3.0 * h * h) * (zt * zt))
            # t-tangent is the LAST tangent stream (index n_tan-1).
            c_parts[n_tan - 1] = c_parts[n_tan - 1] + ctt * (-4.0 * h * g * zt)
            c_parts.append(g * ctt)
        c0 = g * chh
        c_stack = jnp.concatenate([c0] + c_parts, axis=0)   # (S*B, P)

        dw_ref[l] += jnp.dot(
            s_in.T, c_stack, preferred_element_type=jnp.float32,
            precision=kernel_precision(),
        )
        db_ref[l] += jnp.sum(c0, axis=0)
        c = jnp.dot(c_stack, w_ref[l].T, preferred_element_type=jnp.float32,
                    precision=kernel_precision())
    return c


def _bwd_kernel(x_ref, cot_ref, w_ref, b_ref, dw_ref, db_ref, dx_ref,
                s_scratch, *, n_layers: int, n_streams: int, block: int,
                order: int, full_dx: bool = False):
    """One point-block backward: remat forward into VMEM, reverse sweep.

    x_ref:   (1, S*B, P) interleaved input streams.
    cot_ref: (1, S*B, P) interleaved output cotangents.
    dw_ref:  (L, P, P) accumulated across grid steps (same block revisited).
    db_ref:  (L, P) accumulated.
    dx_ref:  (1, B, P) value-stream seed cotangent, or (1, S*B, P) full
             stack when ``full_dx`` (embedded nets differentiate their input
             jet through the embedding).
    s_scratch: (L, S*B, P) VMEM — every hidden layer's input activations.
    """
    from jax.experimental import pallas as pl

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    kw = dict(n_layers=n_layers, n_streams=n_streams, block=block,
              order=order)
    _remat_forward(x_ref[0], w_ref, b_ref, s_scratch, **kw)
    c = _reverse_sweep(cot_ref[0], w_ref, b_ref, s_scratch, dw_ref, db_ref,
                       **kw)
    dx_ref[0] = c if full_dx else c[0:block, :]


@partial(jax.jit,
         static_argnames=("meta_key", "order", "block", "interpret"))
def _fused_jet_bwd_padded(x_blocks, cot_blocks, ws, bs, meta_key, order,
                          block, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers, p, n_streams = meta_key
    rows = n_streams * block
    n_blocks = x_blocks.shape[0]

    # int32 index maps: Python 0 canonicalizes to i64 under jax_enable_x64
    # and Mosaic fails to legalize the map (see fused_jet.py).
    z = lambda: jnp.asarray(0, jnp.int32)
    dw, db, dx = pl.pallas_call(
        partial(_bwd_kernel, n_layers=n_layers, n_streams=n_streams,
                block=block, order=order),
        out_shape=(
            jax.ShapeDtypeStruct((n_layers, p, p), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, p), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, block, p), jnp.float32),
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, rows, p), lambda i: (i, z(), z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, p), lambda i: (i, z(), z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, p, p), lambda i: (z(), z(), z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, p), lambda i: (z(), z()),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_layers, p, p), lambda i: (z(), z(), z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, p), lambda i: (z(), z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, p), lambda i: (i, z(), z()),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_layers, rows, p), jnp.float32),
        ],
        interpret=interpret,
    )(x_blocks, cot_blocks, ws, bs)
    return dw, db, dx


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

def _interleave(streams, n_streams, n_blocks, block, p):
    stacked = jnp.stack(streams, axis=0)
    return (stacked.reshape(n_streams, n_blocks, block, p)
            .transpose(1, 0, 2, 3)
            .reshape(n_blocks, n_streams * block, p))


def _seed_streams(x32, a, n, n_pad, p, order, lb, ub):
    if lb is not None:
        lb_ = jnp.asarray(lb, jnp.float32)
        ub_ = jnp.asarray(ub, jnp.float32)
        h0 = 2.0 * (x32 - lb_) / (ub_ - lb_) - 1.0
        scale = 2.0 / (ub_ - lb_)
        eye = jnp.eye(a, dtype=jnp.float32) * scale[None, :]
    else:
        h0 = x32
        scale = jnp.ones((a,), jnp.float32)
        eye = jnp.eye(a, dtype=jnp.float32)

    def pad_n(arr):
        return jnp.pad(arr, ((0, n_pad - n), (0, p - arr.shape[1])))

    streams = [pad_n(h0)]
    for i in range(a):
        streams.append(pad_n(jnp.broadcast_to(eye[i][None, :], (n, a))))
    if order >= 2:
        streams.append(pad_n(jnp.zeros((n, a), jnp.float32)))
    return streams, scale


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_jet_vjp(params, x, order=1, block=512, interpret=False,
                  lb=None, ub=None) -> Jet:
    """Differentiable fused jet (Pallas forward AND backward).

    Same outputs as ``mlp_jet``/``fused_jet``; gradients w.r.t. params and x
    flow through the hand-derived Pallas backward (block-local remat).
    """
    return fused_jet(params, x, order=order, lb=lb, ub=ub, block=block,
                     interpret=interpret)


def _fwd(params, x, order, block, interpret, lb, ub):
    jet = fused_jet(params, x, order=order, lb=lb, ub=ub, block=block,
                    interpret=interpret)
    return jet, (params, x)


def _bwd(order, block, interpret, lb, ub, res, cot: Jet):
    params, x = res
    ws, bs, meta = pack_params(params)
    n, a = x.shape
    p = meta["padded"]
    n_streams = 1 + a + (1 if order >= 2 else 0)
    # The backward holds every layer's activations for a block in VMEM
    # ((L+1) x S*B x P floats); cap the block so the scratch fits the ~16MB
    # scoped-vmem budget regardless of the forward block size.
    # Empirically the Mosaic stack also holds several block-sized
    # temporaries from the unrolled reverse loop, so budget conservatively.
    vmem_budget = 4 * 1024 * 1024
    per_point = (meta["n_layers"] + 1) * n_streams * p * 4
    cap = max(32, (vmem_budget // per_point // 2) // 32 * 32)
    block = min(block, cap)
    n_pad = _round_up(max(n, block), block)
    n_blocks = n_pad // block
    dims = meta["dims"]
    c_out = dims[-1]

    x32 = jnp.asarray(x, jnp.float32)
    in_streams, scale = _seed_streams(x32, a, n, n_pad, p, order, lb, ub)
    x_blocks = _interleave(in_streams, n_streams, n_blocks, block, p)

    # Cotangent streams, padded the same way (None → zeros).
    def pad_c(arr):
        arr = jnp.asarray(arr, jnp.float32)
        return jnp.pad(arr, ((0, n_pad - n), (0, p - arr.shape[1])))

    zero = jnp.zeros((n, c_out), jnp.float32)
    cf = cot.f if cot.f is not None else zero
    cot_streams = [pad_c(cf)]
    for i in range(a):
        ci = cot.d[i] if cot.d is not None else zero
        cot_streams.append(pad_c(ci))
    if order >= 2:
        ctt = cot.dtt if cot.dtt is not None else zero
        cot_streams.append(pad_c(ctt))
    cot_blocks = _interleave(cot_streams, n_streams, n_blocks, block, p)

    meta_key = (meta["n_layers"], p, n_streams)
    dw, db, dx_blocks = _fused_jet_bwd_padded(
        x_blocks, cot_blocks, ws, bs, meta_key, order, block, interpret
    )

    # Unpad into the params pytree.
    dparams = []
    for i in range(meta["n_layers"]):
        fan_in, fan_out = dims[i], dims[i + 1]
        dparams.append({
            "W": dw[i, :fan_in, :fan_out].astype(params[i]["W"].dtype),
            "b": db[i, :fan_out].astype(params[i]["b"].dtype),
        })

    dx = dx_blocks.reshape(n_pad, p)[:n, :a]
    dx = (dx * scale[None, :]).astype(x.dtype)
    return dparams, dx


fused_jet_vjp.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Seed-jet custom_vjp (embedded nets, e.g. Fourier features)
# ---------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("meta_key", "order", "block", "interpret"))
def _fused_seed_bwd_padded(x_blocks, cot_blocks, ws, bs, meta_key, order,
                           block, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers, p, n_streams = meta_key
    rows = n_streams * block
    n_blocks = x_blocks.shape[0]
    z = lambda: jnp.asarray(0, jnp.int32)
    dw, db, dseed = pl.pallas_call(
        partial(_bwd_kernel, n_layers=n_layers, n_streams=n_streams,
                block=block, order=order, full_dx=True),
        out_shape=(
            jax.ShapeDtypeStruct((n_layers, p, p), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, p), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, rows, p), jnp.float32),
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, rows, p), lambda i: (i, z(), z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, p), lambda i: (i, z(), z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, p, p), lambda i: (z(), z(), z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, p), lambda i: (z(), z()),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_layers, p, p), lambda i: (z(), z(), z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, p), lambda i: (z(), z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, p), lambda i: (i, z(), z()),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_layers, rows, p), jnp.float32),
        ],
        interpret=interpret,
    )(x_blocks, cot_blocks, ws, bs)
    return dw, db, dseed


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_seed_jet_vjp(params, h0, d, dtt, block=512,
                       interpret=False) -> Jet:
    """Differentiable fused jet over a PRECOMPUTED seed jet.

    Entry point for embedded nets (Fourier features): the caller computes
    the embedding's analytic jet (h0 values, d tangents, optional dtt) in
    XLA — differentiable w.r.t. the embedding's own params — and this runs
    the MLP tail through the Pallas forward/backward kernels.  Gradients
    flow to the MLP params AND back through the seed streams.
    """
    from .fused_jet import fused_seed_jet

    return fused_seed_jet(params, h0, d, dtt, block=block,
                          interpret=interpret)


def _seed_fwd(params, h0, d, dtt, block, interpret):
    from .fused_jet import fused_seed_jet

    jet = fused_seed_jet(params, h0, d, dtt, block=block,
                         interpret=interpret)
    return jet, (params, h0, d, dtt)


def _seed_bwd(block, interpret, res, cot: Jet):
    params, h0, d, dtt = res
    order = 2 if dtt is not None else 1
    ws, bs, meta = pack_params(params)
    n, e = h0.shape
    a = d.shape[0]
    p = meta["padded"]
    n_streams = 1 + a + (1 if order >= 2 else 0)
    # Same conservative VMEM budget as _bwd (the scratch dominates).
    vmem_budget = 4 * 1024 * 1024
    per_point = (meta["n_layers"] + 1) * n_streams * p * 4
    cap = max(32, (vmem_budget // per_point // 2) // 32 * 32)
    block = min(block, cap)
    n_pad = _round_up(max(n, block), block)
    n_blocks = n_pad // block
    c_out = meta["dims"][-1]

    def pad_seed(arr):
        arr = jnp.asarray(arr, jnp.float32)
        return jnp.pad(arr, ((0, n_pad - n), (0, p - arr.shape[1])))

    in_streams = [pad_seed(h0)] + [pad_seed(d[i]) for i in range(a)]
    if order >= 2:
        in_streams.append(pad_seed(dtt))
    x_blocks = _interleave(in_streams, n_streams, n_blocks, block, p)

    zero = jnp.zeros((n, c_out), jnp.float32)
    cf = cot.f if cot.f is not None else zero
    cot_streams = [pad_seed(cf)]
    for i in range(a):
        ci = cot.d[i] if cot.d is not None else zero
        cot_streams.append(pad_seed(ci))
    if order >= 2:
        ctt = cot.dtt if cot.dtt is not None else zero
        cot_streams.append(pad_seed(ctt))
    cot_blocks = _interleave(cot_streams, n_streams, n_blocks, block, p)

    meta_key = (meta["n_layers"], p, n_streams)
    dw, db, dseed_blocks = _fused_seed_bwd_padded(
        x_blocks, cot_blocks, ws, bs, meta_key, order, block, interpret
    )

    dims = meta["dims"]
    dparams = []
    for i in range(meta["n_layers"]):
        fan_in, fan_out = dims[i], dims[i + 1]
        dparams.append({
            "W": dw[i, :fan_in, :fan_out].astype(params[i]["W"].dtype),
            "b": db[i, :fan_out].astype(params[i]["b"].dtype),
        })

    # De-interleave the full seed-cotangent stack.
    dseed = (
        dseed_blocks.reshape(n_blocks, n_streams, block, p)
        .transpose(1, 0, 2, 3)
        .reshape(n_streams, n_pad, p)
    )
    dh0 = dseed[0, :n, :e].astype(h0.dtype)
    dd = dseed[1 : 1 + a, :n, :e].astype(d.dtype)
    ddtt = (dseed[1 + a, :n, :e].astype(dtt.dtype)
            if order >= 2 else None)
    return dparams, dh0, dd, ddtt


fused_seed_jet_vjp.defvjp(_seed_fwd, _seed_bwd)


# ---------------------------------------------------------------------------
# One-launch composite custom_vjp: value+grad of part + dist*uv
# ---------------------------------------------------------------------------

def _final_out(scr, w_ref, b_ref, n_layers, block):
    """Recompute a net's final jet streams from its last saved activations
    (the linear head; bias on the value rows only)."""
    z = jnp.dot(scr[n_layers - 1], w_ref[n_layers - 1],
                preferred_element_type=jnp.float32,
                precision=kernel_precision())
    zv = z[0:block, :] + b_ref[n_layers - 1][None, :]
    return jnp.concatenate([zv, z[block:, :]], axis=0)


def _composite_bwd_kernel(x_ref, cot_ref, wu, bu, wd, bd, wp, bp,
                          dwu, dbu, dwd, dbd, dwp, dbp, dx_ref,
                          su_scr, sd_scr, sp_scr, *,
                          layers_uvdp, n_streams: int, block: int,
                          order: int):
    """One point-block backward of the fused composite: remat all three
    nets, reverse the product-rule combine into per-net output cotangents,
    then run each net's reverse sweep — all in VMEM, one launch."""
    from jax.experimental import pallas as pl

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        for r in (dwu, dbu, dwd, dbd, dwp, dbp):
            r[...] = jnp.zeros_like(r)

    lu, ld, lp = layers_uvdp
    kw = dict(n_streams=n_streams, block=block, order=order)
    x = x_ref[0]
    _remat_forward(x, wu, bu, su_scr, n_layers=lu, **kw)
    _remat_forward(x, wd, bd, sd_scr, n_layers=ld, **kw)
    _remat_forward(x, wp, bp, sp_scr, n_layers=lp, **kw)
    su = _final_out(su_scr, wu, bu, lu, block)
    sd = _final_out(sd_scr, wd, bd, ld, block)

    # Reverse the combine y = sp + sd·su (jet product rule; see
    # fused_jet._composite_kernel for the forward rows).
    c = cot_ref[0]
    a = n_streams - 1 - (1 if order >= 2 else 0)   # #input tangents
    uf, df = su[0:block, :], sd[0:block, :]
    c0 = c[0:block, :]
    acc_u = df * c0            # ∂/∂uf
    acc_d = uf * c0            # ∂/∂df
    cu_rest = []
    cd_rest = []
    for i in range(a):
        r0, r1 = (1 + i) * block, (2 + i) * block
        ci = c[r0:r1, :]
        acc_u = acc_u + sd[r0:r1, :] * ci
        acc_d = acc_d + su[r0:r1, :] * ci
        cu_rest.append(df * ci)
        cd_rest.append(uf * ci)
    if order >= 2:
        t0, t1 = a * block, (1 + a) * block          # time-tangent rows
        q0, q1 = (1 + a) * block, (2 + a) * block    # dtt rows
        ctt = c[q0:q1, :]
        acc_u = acc_u + sd[q0:q1, :] * ctt
        acc_d = acc_d + su[q0:q1, :] * ctt
        # y_tt = ... + 2·sd_t·su_t contributes to both time tangents.
        cu_rest[a - 1] = cu_rest[a - 1] + 2.0 * sd[t0:t1, :] * ctt
        cd_rest[a - 1] = cd_rest[a - 1] + 2.0 * su[t0:t1, :] * ctt
        cu_rest.append(df * ctt)
        cd_rest.append(uf * ctt)
    cu = jnp.concatenate([acc_u] + cu_rest, axis=0)
    cd = jnp.concatenate([acc_d] + cd_rest, axis=0)

    c_u = _reverse_sweep(cu, wu, bu, su_scr, dwu, dbu, n_layers=lu, **kw)
    c_d = _reverse_sweep(cd, wd, bd, sd_scr, dwd, dbd, n_layers=ld, **kw)
    c_p = _reverse_sweep(c, wp, bp, sp_scr, dwp, dbp, n_layers=lp, **kw)
    dx_ref[0] = (c_u + c_d + c_p)[0:block, :]


@partial(jax.jit,
         static_argnames=("meta_key", "order", "block", "interpret"))
def _fused_composite_bwd_padded(x_blocks, cot_blocks, wu, bu, wd, bd, wp,
                                bp, meta_key, order, block, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    layers_uvdp, p, n_streams = meta_key
    lu, ld, lp = layers_uvdp
    rows = n_streams * block
    n_blocks = x_blocks.shape[0]
    z = lambda: jnp.asarray(0, jnp.int32)

    def wspec(n_layers):
        return pl.BlockSpec((n_layers, p, p), lambda i: (z(), z(), z()),
                            memory_space=pltpu.VMEM)

    def bspec(n_layers):
        return pl.BlockSpec((n_layers, p), lambda i: (z(), z()),
                            memory_space=pltpu.VMEM)

    def wshape(n_layers):
        return jax.ShapeDtypeStruct((n_layers, p, p), jnp.float32)

    def bshape(n_layers):
        return jax.ShapeDtypeStruct((n_layers, p), jnp.float32)

    io_spec = pl.BlockSpec((1, rows, p), lambda i: (i, z(), z()),
                           memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_composite_bwd_kernel, layers_uvdp=layers_uvdp,
                n_streams=n_streams, block=block, order=order),
        out_shape=(
            wshape(lu), bshape(lu), wshape(ld), bshape(ld),
            wshape(lp), bshape(lp),
            jax.ShapeDtypeStruct((n_blocks, block, p), jnp.float32),
        ),
        grid=(n_blocks,),
        in_specs=[
            io_spec, io_spec,
            wspec(lu), bspec(lu), wspec(ld), bspec(ld),
            wspec(lp), bspec(lp),
        ],
        out_specs=(
            wspec(lu), bspec(lu), wspec(ld), bspec(ld),
            wspec(lp), bspec(lp),
            pl.BlockSpec((1, block, p), lambda i: (i, z(), z()),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((lu, rows, p), jnp.float32),
            pltpu.VMEM((ld, rows, p), jnp.float32),
            pltpu.VMEM((lp, rows, p), jnp.float32),
        ],
        interpret=interpret,
    )(x_blocks, cot_blocks, wu, bu, wd, bd, wp, bp)
    return outs


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_composite_jet_vjp(params, x, order=2, block=512, interpret=False,
                            lb=None, ub=None) -> Jet:
    """Differentiable ONE-launch composite jet: part + dist·uv.

    Forward is :func:`fused_jet.fused_composite_jet`; backward remats all
    three nets in VMEM, reverses the product-rule combine, and runs the
    three reverse sweeps in the same launch.  Gradients flow to all three
    nets' params and to x (value rows).  params is the composite pytree
    {'uv', 'dist', 'part'}.
    """
    from .fused_jet import fused_composite_jet

    return fused_composite_jet(params, x, order=order, lb=lb, ub=ub,
                               block=block, interpret=interpret)


def _comp_fwd(params, x, order, block, interpret, lb, ub):
    from .fused_jet import fused_composite_jet

    jet = fused_composite_jet(params, x, order=order, lb=lb, ub=ub,
                              block=block, interpret=interpret)
    return jet, (params, x)


def _comp_bwd(order, block, interpret, lb, ub, res, cot: Jet):
    params, x = res
    packs = {k: pack_params(params[k]) for k in ("uv", "dist", "part")}
    p = max(m["padded"] for _, _, m in packs.values())
    for k, (w, b, m) in packs.items():
        if m["padded"] != p:
            w = jnp.pad(w, ((0, 0), (0, p - w.shape[1]),
                            (0, p - w.shape[2])))
            b = jnp.pad(b, ((0, 0), (0, p - b.shape[1])))
            packs[k] = (w, b, m)
    n, a = x.shape
    n_streams = 1 + a + (1 if order >= 2 else 0)
    layers = tuple(packs[k][2]["n_layers"] for k in ("uv", "dist", "part"))
    # Three scratches live simultaneously; budget conservatively.
    vmem_budget = 4 * 1024 * 1024
    per_point = (sum(layers) + 3) * n_streams * p * 4
    cap = max(32, (vmem_budget // per_point // 2) // 32 * 32)
    block = min(block, cap)
    n_pad = _round_up(max(n, block), block)
    n_blocks = n_pad // block

    x32 = jnp.asarray(x, jnp.float32)
    in_streams, scale = _seed_streams(x32, a, n, n_pad, p, order, lb, ub)
    x_blocks = _interleave(in_streams, n_streams, n_blocks, block, p)

    c_out = packs["uv"][2]["dims"][-1]

    def pad_c(arr):
        arr = jnp.asarray(arr, jnp.float32)
        return jnp.pad(arr, ((0, n_pad - n), (0, p - arr.shape[1])))

    zero = jnp.zeros((n, c_out), jnp.float32)
    cf = cot.f if cot.f is not None else zero
    cot_streams = [pad_c(cf)]
    for i in range(a):
        ci = cot.d[i] if cot.d is not None else zero
        cot_streams.append(pad_c(ci))
    if order >= 2:
        ctt = cot.dtt if cot.dtt is not None else zero
        cot_streams.append(pad_c(ctt))
    cot_blocks = _interleave(cot_streams, n_streams, n_blocks, block, p)

    meta_key = (layers, p, n_streams)
    wu, bu, _ = packs["uv"]
    wd, bd, _ = packs["dist"]
    wp, bp, _ = packs["part"]
    (dwu, dbu, dwd, dbd, dwp, dbp, dx_blocks) = _fused_composite_bwd_padded(
        x_blocks, cot_blocks, wu, bu, wd, bd, wp, bp, meta_key, order,
        block, interpret,
    )

    def unpack(dw, db, key):
        meta = packs[key][2]
        dims = meta["dims"]
        out = []
        for i in range(meta["n_layers"]):
            fan_in, fan_out = dims[i], dims[i + 1]
            out.append({
                "W": dw[i, :fan_in, :fan_out].astype(
                    params[key][i]["W"].dtype),
                "b": db[i, :fan_out].astype(params[key][i]["b"].dtype),
            })
        return out

    dparams = {
        "uv": unpack(dwu, dbu, "uv"),
        "dist": unpack(dwd, dbd, "dist"),
        "part": unpack(dwp, dbp, "part"),
    }
    dx = dx_blocks.reshape(n_pad, p)[:n, :a]
    dx = (dx * scale[None, :]).astype(x.dtype)
    return dparams, dx


fused_composite_jet_vjp.defvjp(_comp_fwd, _comp_bwd)
