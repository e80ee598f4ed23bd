"""Jitted Adam training loop.

The reference's Adam loop runs one ``sess.run`` per step plus 4-5 extra graph
evaluations per step just to record loss components
(/root/reference/PlateHoleQuarter/train/train.py:475-506 — a 5x overhead
pathology noted in SURVEY.md §2.4).  Here the whole loop is one
``lax.scan`` on device; per-component losses fall out of the same forward as
auxiliary outputs, so the full loss history costs nothing extra.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


class AdamResult(NamedTuple):
    params: object
    opt_state: object
    history: dict  # each entry (iters,) — total + per-component losses


@partial(jax.jit, static_argnames=("loss_and_aux_fn", "iters", "log_every"))
def run_adam(
    loss_and_aux_fn: Callable,
    params,
    learning_rate: Union[float, jax.Array],
    *,
    iters: int,
    opt_state=None,
    log_every: int = 0,
) -> AdamResult:
    """Run ``iters`` Adam steps of ``loss_and_aux_fn(params) -> (loss, aux)``.

    ``learning_rate`` may be a traced scalar — the reference feeds it per call
    (train.py:249,494) — so changing it does not retrigger compilation.
    """
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)
    if opt_state is None:
        opt_state = opt.init(params)
    else:
        opt_state = optax.tree.set(opt_state, learning_rate=learning_rate)

    grad_fn = jax.value_and_grad(loss_and_aux_fn, has_aux=True)

    def step(carry, k):
        params, opt_state = carry
        (loss, aux), grads = grad_fn(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if log_every:
            jax.lax.cond(
                (k % log_every) == 0,
                lambda: jax.debug.print(
                    "adam it {k}: loss {l}", k=k, l=loss, ordered=False
                ),
                lambda: None,
            )
        rec = {"loss": loss}
        rec.update({k_: jnp.asarray(v) for k_, v in aux.items()})
        return (params, opt_state), rec

    (params, opt_state), history = jax.lax.scan(
        step, (params, opt_state), jnp.arange(iters)
    )
    return AdamResult(params, opt_state, history)
