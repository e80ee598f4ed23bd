"""Device-resident full-batch L-BFGS.

The reference drives scipy's Fortran L-BFGS-B from the host, crossing the
host↔device boundary twice per iteration for up to 100k iterations
(/root/reference/PlateHoleQuarter/train/train.py:219-247,508-525).  Here the
*entire* optimization — two-loop recursion, strong-Wolfe zoom line search,
convergence tests — runs inside one jitted ``lax.while_loop`` on the TPU
(optax.lbfgs supplies the transform; this module supplies the driver).
Iteration count, final loss, and a full loss history come back in a single
device→host transfer at the end.

Compilation/runtime notes (TPU):
  * ``maxiter``, ``ftol``, ``gtol`` are *traced* scalars — changing the
    budget does not retrigger the (expensive) full-scale compile; only
    ``memory_size``, ``max_linesearch_steps``, ``history_capacity`` and the
    loss function itself are static.
  * scipy's ftol rule ``(f_k - f_{k+1}) <= ftol·max(|f_k|,|f_{k+1}|,1)`` is
    applied with a *patience* counter: in f32 a single zero-decrease step is
    common (loss deltas round to 0) and must not abort a 70k-iteration run
    the way it would in the f64 Fortran path.
Matches the reference's hyperparameters: memory (maxcor) 50, max line-search
steps 50 (train.py:225-226).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class LBFGSStatic:
    """Compile-relevant configuration (hash → executable cache key)."""

    memory_size: int = 50           # scipy maxcor=50 (train.py:225)
    max_linesearch_steps: int = 50  # scipy maxls=50 (train.py:226)
    history_capacity: int = 100_000  # loss-history buffer slots
    log_every: int = 0              # 0 = silent; else jax.debug.print cadence
    patience: int = 5               # consecutive ftol-flat steps before stop


class LBFGSResult(NamedTuple):
    params: object
    final_loss: jax.Array
    n_iters: jax.Array
    loss_history: jax.Array  # (history_capacity,) padded with final loss


def _make_opt(cfg: LBFGSStatic):
    return optax.lbfgs(
        memory_size=cfg.memory_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=cfg.max_linesearch_steps,
            initial_guess_strategy="one",
        ),
    )


@partial(jax.jit, static_argnames=("loss_fn", "cfg"))
def run_lbfgs(
    loss_fn: Callable,
    params,
    cfg: LBFGSStatic,
    maxiter,
    ftol,
    gtol,
) -> LBFGSResult:
    """Minimize ``loss_fn(params) -> scalar``; maxiter/ftol/gtol are traced."""
    opt = _make_opt(cfg)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    maxiter = jnp.minimum(
        jnp.asarray(maxiter, jnp.int32), cfg.history_capacity
    )
    state0 = opt.init(params)
    f0, g0 = jax.value_and_grad(loss_fn)(params)
    history0 = jnp.zeros((cfg.history_capacity,), f0.dtype)

    def cond(carry):
        params, state, f_prev, k, flat, done, _ = carry
        return jnp.logical_and(k < maxiter, jnp.logical_not(done))

    def body(carry):
        params, state, f_prev, k, flat, done, history = carry
        f, g = value_and_grad(params, state=state)
        updates, state = opt.update(
            g, state, params, value=f, grad=g, value_fn=loss_fn
        )
        params = optax.apply_updates(params, updates)
        f_new = optax.tree.get(state, "value")
        g_new = optax.tree.get(state, "grad")

        history = history.at[k].set(f_new)
        if cfg.log_every:
            jax.lax.cond(
                (k % cfg.log_every) == 0,
                lambda: jax.debug.print(
                    "lbfgs it {k}: loss {f}", k=k, f=f_new, ordered=False
                ),
                lambda: None,
            )

        # scipy L-BFGS-B ftol test, with flat-step patience (f32 robustness).
        denom = jnp.maximum(jnp.maximum(jnp.abs(f_prev), jnp.abs(f_new)), 1.0)
        ftol_hit = (f_prev - f_new) <= ftol * denom
        flat = jnp.where(ftol_hit, flat + 1, 0)
        gmax = optax.tree.norm(g_new, ord=jnp.inf)
        gtol_hit = gmax <= gtol
        nonfinite = jnp.logical_not(jnp.isfinite(f_new))
        done = jnp.logical_or(
            jnp.logical_or(flat >= cfg.patience, gtol_hit), nonfinite
        )
        return params, state, f_new, k + 1, flat, done, history

    params_f, state_f, f_final, k_final, _, _, history = jax.lax.while_loop(
        cond,
        body,
        (params, state0, f0, jnp.asarray(0, jnp.int32),
         jnp.asarray(0, jnp.int32), jnp.asarray(False), history0),
    )
    # Pad the unused tail of the history with the final loss value.
    idx = jnp.arange(cfg.history_capacity)
    history = jnp.where(idx < k_final, history, f_final)
    return LBFGSResult(params_f, f_final, k_final, history)


def minimize(
    loss_fn: Callable,
    params,
    *,
    maxiter: int,
    memory_size: int = 50,
    max_linesearch_steps: int = 50,
    ftol: float = 0.0,
    gtol: float = 0.0,
    log_every: int = 0,
    patience: int = 5,
    history_capacity: int = 0,
) -> LBFGSResult:
    """Convenience wrapper.

    ``history_capacity`` defaults to ``maxiter`` rounded up to the next power
    of two (so repeated calls with similar budgets share one executable).
    """
    if history_capacity <= 0:
        cap = 1024
        while cap < maxiter:
            cap *= 2
        history_capacity = cap
    cfg = LBFGSStatic(
        memory_size=memory_size,
        max_linesearch_steps=max_linesearch_steps,
        history_capacity=history_capacity,
        log_every=log_every,
        patience=patience,
    )
    res = run_lbfgs(loss_fn, params, cfg, maxiter, ftol, gtol)
    return LBFGSResult(
        res.params, res.final_loss, res.n_iters,
        res.loss_history[:maxiter],
    )
