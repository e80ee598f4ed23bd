"""Jitted Adam training loop (segmented).

The reference's Adam loop runs one ``sess.run`` per step plus 4-5 extra graph
evaluations per step just to record loss components
(/root/reference/PlateHoleQuarter/train/train.py:475-506 — a 5x overhead
pathology noted in SURVEY.md §2.4).  Here the loop is ``lax.scan`` segments
on device (default 200 steps per dispatch — long monolithic executions can
trip device watchdogs); per-component losses fall out of the same forward as
auxiliary outputs, so the full loss history costs nothing extra.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax


class AdamResult(NamedTuple):
    params: object
    opt_state: object
    history: dict  # each entry (iters,) — total + per-component losses


def _make_opt(learning_rate):
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


@partial(jax.jit, static_argnames=("loss_and_aux_fn", "iters"))
def _scan_segment(loss_and_aux_fn, params, opt_state, learning_rate, iters):
    opt = _make_opt(learning_rate)
    opt_state = optax.tree.set(opt_state, learning_rate=learning_rate)
    grad_fn = jax.value_and_grad(loss_and_aux_fn, has_aux=True)

    def step(carry, k):
        params, opt_state = carry
        (loss, aux), grads = grad_fn(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        rec = {"loss": loss}
        rec.update({k_: jnp.asarray(v) for k_, v in aux.items()})
        return (params, opt_state), rec

    (params, opt_state), history = jax.lax.scan(
        step, (params, opt_state), jnp.arange(iters)
    )
    return params, opt_state, history


def run_adam(
    loss_and_aux_fn: Callable,
    params,
    learning_rate: Union[float, jax.Array],
    *,
    iters: int,
    opt_state=None,
    log_every: int = 0,
    segment: int = 200,
    on_segment=None,
) -> AdamResult:
    """Run ``iters`` Adam steps of ``loss_and_aux_fn(params) -> (loss, aux)``.

    ``learning_rate`` may be a traced scalar — the reference feeds it per call
    (train.py:249,494) — so changing it does not retrigger compilation.
    Steps run in device segments of ``segment`` iterations.

    ``on_segment(done, params, opt_state, segment_history)`` runs on the host
    between segments; checkpoint ``{params, opt_state}`` there and pass
    ``opt_state`` back to resume bit-compatibly (moments + step count carry
    over — the reference loses Adam state on every restart).
    """
    if opt_state is None:
        opt_state = _make_opt(learning_rate).init(params)

    from ..utils import compileguard

    histories = []
    done = 0
    while done < iters:
        seg = min(segment, iters - done)
        if done == 0:
            # First dispatch carries the scan compile; bound it against the
            # erratic axon remote-compile hang (PINN_COMPILE_DEADLINE).
            with compileguard.guard("adam scan segment compile"):
                params, opt_state, hist = _scan_segment(
                    loss_and_aux_fn, params, opt_state, learning_rate, seg,
                )
                hist = jax.tree.map(np.asarray, hist)
        else:
            params, opt_state, hist = _scan_segment(
                loss_and_aux_fn, params, opt_state, learning_rate, seg,
            )
            hist = jax.tree.map(np.asarray, hist)
        histories.append(hist)
        done += seg
        # Host-side progress log at segment boundaries: jax.debug.print
        # inside the scan is an io_callback, which the axon PJRT backend
        # rejects (UNIMPLEMENTED: host send/recv callbacks) — r4 slot-B
        # crash.  Segment-boundary logging costs nothing extra.
        if log_every and (done % log_every < seg or seg >= log_every):
            print(f"adam it {done}: loss {float(hist['loss'][-1]):.6g}",
                  flush=True)
        if on_segment is not None:
            on_segment(done, params, opt_state, hist)
    history = {
        k: np.concatenate([h[k] for h in histories])
        for k in histories[0]
    } if histories else {}
    return AdamResult(params, opt_state, history)
