"""Device-resident full-batch L-BFGS.

The reference drives scipy's Fortran L-BFGS-B from the host, crossing the
host↔device boundary twice per iteration for up to 100k iterations
(/root/reference/PlateHoleQuarter/train/train.py:219-247,508-525).  Here the
*entire* optimization — two-loop recursion, strong-Wolfe zoom line search,
convergence tests — runs inside one jitted ``lax.while_loop`` on the TPU
(optax.lbfgs supplies the transform; this module supplies the driver).
Iteration count, final loss, and a full loss history come back in a single
device→host transfer at the end.

Matches the reference's hyperparameters: memory (maxcor) 50, max line-search
steps 50, and scipy's ftol stopping rule
``(f_k - f_{k+1}) <= ftol · max(|f_k|, |f_{k+1}|, 1)``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class LBFGSConfig:
    maxiter: int = 1000
    memory_size: int = 50        # scipy maxcor=50 (train.py:225)
    max_linesearch_steps: int = 50  # scipy maxls=50 (train.py:226)
    ftol: float = 0.0            # scipy ftol; reference uses ~1e-5*eps
    gtol: float = 0.0            # inf-norm gradient tolerance
    log_every: int = 0           # 0 = silent; else jax.debug.print cadence


class LBFGSResult(NamedTuple):
    params: object
    final_loss: jax.Array
    n_iters: jax.Array
    loss_history: jax.Array  # (maxiter,) padded with final loss after n_iters


def _make_opt(cfg: LBFGSConfig):
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
    cfg: LBFGSConfig,
) -> LBFGSResult:
    """Minimize ``loss_fn(params) -> scalar`` with device-resident L-BFGS."""
    opt = _make_opt(cfg)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    state0 = opt.init(params)
    f0, g0 = jax.value_and_grad(loss_fn)(params)
    history0 = jnp.zeros((cfg.maxiter,), f0.dtype)

    def cond(carry):
        params, state, f_prev, k, done, _ = carry
        return jnp.logical_and(k < cfg.maxiter, jnp.logical_not(done))

    def body(carry):
        params, state, f_prev, k, done, history = carry
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

        # scipy L-BFGS-B ftol test.
        denom = jnp.maximum(jnp.maximum(jnp.abs(f_prev), jnp.abs(f_new)), 1.0)
        ftol_hit = (f_prev - f_new) <= cfg.ftol * denom
        gmax = optax.tree.norm(g_new, ord=jnp.inf)
        gtol_hit = gmax <= cfg.gtol
        nonfinite = jnp.logical_not(jnp.isfinite(f_new))
        done = jnp.logical_or(jnp.logical_or(ftol_hit, gtol_hit), nonfinite)
        return params, state, f_new, k + 1, done, history

    params_f, state_f, f_final, k_final, _, history = jax.lax.while_loop(
        cond, body, (params, state0, f0, jnp.asarray(0), jnp.asarray(False), history0)
    )
    # Pad the unused tail of the history with the final loss value.
    idx = jnp.arange(cfg.maxiter)
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
) -> LBFGSResult:
    """Convenience wrapper building the static config."""
    cfg = LBFGSConfig(
        maxiter=maxiter,
        memory_size=memory_size,
        max_linesearch_steps=max_linesearch_steps,
        ftol=ftol,
        gtol=gtol,
        log_every=log_every,
    )
    return run_lbfgs(loss_fn, params, cfg)
