"""Device-resident full-batch L-BFGS.

The reference drives scipy's Fortran L-BFGS-B from the host, crossing the
host↔device boundary twice per iteration for up to 100k iterations
(/root/reference/PlateHoleQuarter/train/train.py:219-247,508-525).  Here the
optimization — two-loop recursion, strong-Wolfe zoom line search, convergence
tests — runs on device inside jitted ``lax.while_loop`` *segments*: the host
only re-dispatches every ``segment`` iterations (default 100), carrying all
optimizer state on device.  Per-iteration host traffic is therefore ~1/100th
of the reference's, while keeping single device executions short (long
monolithic executions can trip device watchdogs), streaming loss telemetry,
and enabling periodic checkpoints.

Matches the reference's hyperparameters: memory (maxcor) 50, max line-search
steps 50, and scipy's ftol stopping rule
``(f_k - f_{k+1}) <= ftol·max(|f_k|,|f_{k+1}|,1)`` — applied with a
*patience* counter because in f32 a single zero-decrease step is common and
must not abort a 70k-iteration run.
"""

from __future__ import annotations

import dataclasses
import inspect
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils import compileguard


@dataclasses.dataclass(frozen=True)
class LBFGSStatic:
    """Compile-relevant configuration (hash → executable cache key)."""

    memory_size: int = 50           # scipy maxcor=50 (train.py:225)
    max_linesearch_steps: int = 50  # scipy maxls=50 (train.py:226)
    segment: int = 100              # device iterations per host dispatch
    patience: int = 5               # consecutive ftol-flat steps before stop


class LBFGSResult(NamedTuple):
    params: object
    final_loss: jax.Array
    n_iters: int
    loss_history: np.ndarray  # (n_iters,)
    # Full optimizer carry (params, opt_state incl. curvature memory and
    # line-search state, f_prev, flat, done) — checkpoint it and pass back
    # as ``init_carry`` to resume without losing the L-BFGS history the
    # reference discards on every restart (train.py:219-247 rebuilds the
    # scipy optimizer per phase).
    carry: object = None


def _make_opt(cfg: LBFGSStatic):
    return optax.lbfgs(
        memory_size=cfg.memory_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=cfg.max_linesearch_steps,
            initial_guess_strategy="one",
        ),
    )


@partial(jax.jit, static_argnames=("loss_fn", "cfg"))
def _run_segment(loss_fn: Callable, carry, cfg: LBFGSStatic, ftol, gtol,
                 target):
    """Run up to ``cfg.segment`` L-BFGS iterations on device.

    carry = (params, opt_state, f_prev, flat, done).  Returns the updated
    carry plus this segment's loss history (padded with the final loss) and
    the number of iterations actually run.
    """
    opt = _make_opt(cfg)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def cond(c):
        (_, _, _, _, done), k, _ = c
        return jnp.logical_and(k < cfg.segment, jnp.logical_not(done))

    def body(c):
        (params, state, f_prev, flat, done), k, hist = c
        f, g = value_and_grad(params, state=state)
        updates, state = opt.update(
            g, state, params, value=f, grad=g, value_fn=loss_fn
        )
        params = optax.apply_updates(params, updates)
        f_new = optax.tree.get(state, "value")
        g_new = optax.tree.get(state, "grad")
        hist = hist.at[k].set(f_new)

        denom = jnp.maximum(jnp.maximum(jnp.abs(f_prev), jnp.abs(f_new)), 1.0)
        ftol_hit = (f_prev - f_new) <= ftol * denom
        flat = jnp.where(ftol_hit, flat + 1, 0)
        gtol_hit = optax.tree.norm(g_new, ord=jnp.inf) <= gtol
        nonfinite = jnp.logical_not(jnp.isfinite(f_new))
        target_hit = f_new <= target
        done = jnp.logical_or(
            jnp.logical_or(flat >= cfg.patience, gtol_hit),
            jnp.logical_or(nonfinite, target_hit),
        )
        return (params, state, f_new, flat, done), k + 1, hist

    hist0 = jnp.zeros((cfg.segment,), jnp.result_type(carry[2]))
    carry, k, hist = jax.lax.while_loop(
        cond, body, (carry, jnp.asarray(0, jnp.int32), hist0)
    )
    f_final = carry[2]
    idx = jnp.arange(cfg.segment)
    hist = jnp.where(idx < k, hist, f_final)
    return carry, k, hist


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
    segment: int = 100,
    on_segment: Optional[Callable] = None,
    init_carry=None,
    target: float = -np.inf,
) -> LBFGSResult:
    """Minimize ``loss_fn(params) -> scalar``.

    ``on_segment(k_total, params, segment_history)`` runs on the host between
    segments — use it for periodic checkpointing or metric streaming (state
    stays on device; only the small history array is fetched).  A callback
    that also accepts a ``carry`` keyword receives the full optimizer carry,
    suitable for ``save_checkpoint`` and later resumption.

    ``target`` stops the run as soon as the loss reaches it (time-to-target
    benchmarking; scipy has no equivalent — the reference can only bound
    iterations).

    ``init_carry`` resumes from a previously returned/checkpointed
    ``LBFGSResult.carry`` (same loss_fn shape and same memory_size /
    max_linesearch_steps — the opt-state pytree must match); the seed
    value+grad evaluation is skipped and curvature history is preserved.
    """
    cfg = LBFGSStatic(
        memory_size=memory_size,
        max_linesearch_steps=max_linesearch_steps,
        segment=min(segment, max(1, maxiter)),
        patience=patience,
    )
    if init_carry is not None:
        params, opt_state, f0, _flat, _done = init_carry
        # Clear the stop flags AND the flat-step counter: a resumed run gets
        # a fresh patience budget (otherwise a patience-stopped carry would
        # re-stop on its first iteration).
        carry = (
            params, opt_state, jnp.asarray(f0),
            jnp.asarray(0, jnp.int32), jnp.asarray(False),
        )
    else:
        opt = _make_opt(cfg)
        # jit the seed evaluation: op-by-op execution would ignore remat
        # boundaries and exhaust HBM on 1M+ point losses.
        with compileguard.guard("lbfgs seed value_and_grad compile"):
            f0, _ = jax.jit(jax.value_and_grad(loss_fn))(params)
            jax.block_until_ready(f0)
        carry = (
            params, opt.init(params), f0,
            jnp.asarray(0, jnp.int32), jnp.asarray(False),
        )
    pass_carry = on_segment is not None and (
        "carry" in inspect.signature(on_segment).parameters
    )

    histories = []
    k_total = 0
    k_logged = 0
    first_dispatch = True
    while k_total < maxiter:
        if first_dispatch:
            # The first segment dispatch carries the while_loop compile —
            # the graph whose remote-compile latency is erratic (68 s to
            # >31 min for identical graphs).  Bound it so a hung compile
            # costs a bounded retry, not the slot (PINN_COMPILE_DEADLINE).
            with compileguard.guard("lbfgs segment while_loop compile"):
                carry, k_seg, hist = _run_segment(
                    loss_fn, carry, cfg, ftol, gtol, target
                )
                k_seg = int(k_seg)
            first_dispatch = False
        else:
            carry, k_seg, hist = _run_segment(
                loss_fn, carry, cfg, ftol, gtol, target
            )
            k_seg = int(k_seg)
        hist = np.asarray(hist[:k_seg])
        histories.append(hist)
        k_total += k_seg
        if log_every and len(hist) and k_total - k_logged >= log_every:
            k_logged = k_total
            print(
                f"lbfgs it {k_total}: loss {hist[-1]:.6e}", flush=True
            )
        if on_segment is not None:
            if pass_carry:
                on_segment(k_total, carry[0], hist, carry=carry)
            else:
                on_segment(k_total, carry[0], hist)
        if bool(carry[4]) or k_seg < cfg.segment:
            break

    history = (
        np.concatenate(histories) if histories else np.zeros((0,), np.float32)
    )
    return LBFGSResult(
        params=carry[0],
        final_loss=carry[2],
        n_iters=k_total,
        loss_history=history,
        carry=carry,
    )
