"""Host-precision L-BFGS: f64 optimizer math on the host, f32 evals on TPU.

Why this exists: the f32 plate-hole endgame wedges because loss differences
and curvature pairs fall below f32 resolution (docs/STATUS_r2.md), the
reference escapes by training entirely in f64 on CPU
(/root/reference/PlateHoleQuarter/train/train.py:115), and full-f64 graphs —
even just the f64 *optimizer* internals over an f32 compute path — hang the
axon TPU remote compile.  So the split is moved to the only boundary this
environment supports: the device runs ONE compiled function (value+grad of
the f32 Pallas forward with the float64 reduction tail, LossSpec.accum_dtype)
and the host runs the entire optimizer — two-loop recursion, curvature
memory, strong-Wolfe zoom line search, scipy's ftol rule — in numpy float64.

This is the reference's own host/device split (scipy ↔ TF session,
train.py:219-247,508-525) but with the per-iteration device work being one
fused Pallas evaluation instead of dozens of graph launches, and with
noise-aware safeguards (cautious curvature acceptance) because the gradient
itself carries f32 noise.

Device L-BFGS (train/lbfgs.py) remains the production path away from the
precision floor; this engine takes over for the endgame.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional, Tuple

import numpy as np


def make_host_phase_vg(case, phase, params, *, chunk_size: int = 512):
    """Device value+grad for :func:`minimize_host` over one case phase.

    The device function is PURE f32 (Pallas jets at full speed, compiles
    like any production step); it returns the f32 grad plus every loss
    component's per-chunk partial sums (banks.ChunkSumCollector), and the
    host reassembles the float64 loss:  mean_k = Σ_chunks(sums)/count in
    f64, total = Σ_k w_k·mean_k.  Loss resolution ~eps32/n_chunks instead
    of eps32 — the device side of the extended-precision endgame.

    Returns (host_vg, x0_flat64, unravel32) where host_vg maps a float64
    flat vector to (float64 loss, float64 flat grad) and unravel32 maps a
    flat vector back to the phase's f32 sub-params pytree.
    """
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    spec = phase.loss
    from ..banks import ChunkSumCollector

    to32 = lambda tree: jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32), tree
    )
    from ..utils.treepath import path_get, path_set

    key = phase.trainable
    if key is None:
        frozen = None
        sub0 = params
    else:
        # Frozen sub-nets live on device in f32 (the compute dtype).
        # ``key`` may be a dotted path ("uv.mlp"): the whole tree is frozen
        # in f32 and the trainable subtree spliced in at eval.
        frozen = to32(params)
        sub0 = path_get(params, key)
    # Seed x0 from the checkpoint's own dtype (f64 checkpoints keep their
    # full precision on the host side), but build the unravel over f32.
    x0_flat = np.asarray(ravel_pytree(sub0)[0], np.float64)
    flat0, unravel32 = ravel_pytree(to32(sub0))
    names_box: List[str] = []

    def fn(zflat32):
        sub32 = unravel32(zflat32)
        p = path_set(frozen, key, sub32) if key is not None else sub32
        coll = ChunkSumCollector(chunk_size)
        total, _comps = spec.evaluate(
            case.model, p, case.material, case.banks, collector=coll
        )
        names_box.clear()
        names_box.extend(coll.names)
        return phase.scale * total, (tuple(coll.arrays), tuple(coll.counts))

    vg = jax.jit(jax.value_and_grad(fn, has_aux=True))
    wmap = spec.weight_map()
    scale = float(phase.scale)

    def host_vg(z64: np.ndarray):
        z32 = jnp.asarray(np.asarray(z64, np.float32))
        out = vg(z32)
        # One batched fetch: per-buffer np.asarray costs a tunnel round trip
        # each (~6-8 RPCs/eval dominated the first implementation's wall).
        (_f32, (sums, counts)), g = jax.device_get(out)
        comp = {}
        for name, s_arr, c in zip(names_box, sums, counts):
            comp[name] = comp.get(name, 0.0) + (
                float(np.asarray(s_arr, np.float64).sum()) / float(c)
            )
        total = scale * sum(wmap.get(k, 0.0) * v for k, v in comp.items())
        return total, np.asarray(g, np.float64)

    del flat0
    return host_vg, x0_flat, unravel32


def make_host_problem_vg(problem, banks, params, *, chunk_size: int = 512):
    """Device value+grad for :func:`minimize_host` over a joint problem.

    Same extended-precision scheme as :func:`make_host_phase_vg`, but for
    problem objects exposing ``loss_and_aux(params, banks, collector=)`` and
    a ``weights`` tuple — the inverse problem (cases/inverse.py), where ALL
    leaves (net + log-material parameters) are trainable.  The f32 polish of
    that problem resolution-floors at loss ~4e-3 with rho biased 4.6%
    (runs/inverse/recovery.json); f64 host loss restores the line search's
    ability to certify the small joint-valley decreases.

    Returns (host_vg, x0_flat64, unravel32).
    """
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from ..banks import ChunkSumCollector

    to32 = lambda tree: jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32), tree
    )
    x0_flat = np.asarray(ravel_pytree(params)[0], np.float64)
    _, unravel32 = ravel_pytree(to32(params))
    names_box: List[str] = []

    def fn(zflat32):
        p = unravel32(zflat32)
        coll = ChunkSumCollector(chunk_size)
        total, _comps = problem.loss_and_aux(p, banks, collector=coll)
        names_box.clear()
        names_box.extend(coll.names)
        return total, (tuple(coll.arrays), tuple(coll.counts))

    vg = jax.jit(jax.value_and_grad(fn, has_aux=True))
    wmap = dict(problem.weights)

    def host_vg(z64: np.ndarray):
        z32 = jnp.asarray(np.asarray(z64, np.float32))
        out = vg(z32)
        (_f32, (sums, counts)), g = jax.device_get(out)
        comp = {}
        for name, s_arr, c in zip(names_box, sums, counts):
            comp[name] = comp.get(name, 0.0) + (
                float(np.asarray(s_arr, np.float64).sum()) / float(c)
            )
        total = sum(wmap.get(k, 0.0) * v for k, v in comp.items())
        return total, np.asarray(g, np.float64)

    return host_vg, x0_flat, unravel32


def make_preconditioned_vg(host_vg, d: np.ndarray):
    """Diagonal (Jacobi) preconditioning wrapper for :func:`minimize_host`.

    Optimizes in whitened coordinates u = x / d: the wrapped value+grad is
    f̃(u) = f(d∘u) with ∇f̃ = d∘∇f, so L-BFGS's implicit initial Hessian
    I becomes diag(d)² in the original space.  Use a per-block scale (e.g.
    d_block ∝ 1/rms(g_block)) when parameter blocks have mismatched
    gradient/curvature scales — the Fourier frequency matrix B carries ~6×
    the MLP blocks' gradient RMS at the full-scale semi wedge
    (docs/STATUS_r4.md handoff item 3).

    Returns (vg_u, to_u, from_u): the whitened value+grad plus coordinate
    maps.  Minimize with ``minimize_host(vg_u, to_u(x0))`` and map the
    result back with ``from_u(res.x)``; carries are only valid in one
    coordinate system.
    """
    d = np.asarray(d, np.float64)

    def vg_u(u):
        f, g = host_vg(d * u)
        return f, d * g

    return vg_u, (lambda x: np.asarray(x, np.float64) / d), (
        lambda u: d * np.asarray(u, np.float64))


@dataclasses.dataclass
class HostLBFGSResult:
    x: np.ndarray
    final_loss: float
    n_iters: int
    n_evals: int
    loss_history: np.ndarray
    converged: str  # "maxiter" | "ftol" | "gtol" | "target" | "linesearch"
    carry: Optional[dict] = None  # curvature memory for resumption


def _two_loop(g: np.ndarray, S: List[np.ndarray], Y: List[np.ndarray],
              R: List[float]) -> np.ndarray:
    """Standard two-loop recursion with gamma scaling; all float64."""
    q = g.copy()
    alphas = []
    for s, y, rho in zip(reversed(S), reversed(Y), reversed(R)):
        a = rho * s.dot(q)
        alphas.append(a)
        q -= a * y
    if S:
        gamma = S[-1].dot(Y[-1]) / Y[-1].dot(Y[-1])
        q *= gamma
    for (s, y, rho), a in zip(zip(S, Y, R), reversed(alphas)):
        b = rho * y.dot(q)
        q += (a - b) * s
    return -q


def minimize_host(
    value_and_grad: Callable[[np.ndarray], Tuple[float, np.ndarray]],
    x0: np.ndarray,
    *,
    maxiter: int,
    memory_size: int = 50,
    max_linesearch_steps: int = 50,
    c1: float = 1e-4,
    c2: float = 0.9,
    ftol: float = 1e-5 * np.finfo(np.float64).eps,
    gtol: float = 0.0,
    patience: int = 20,
    target: float = -np.inf,
    wall_budget: Optional[float] = None,
    init_carry: Optional[dict] = None,
    on_iter: Optional[Callable] = None,
    curvature_eps: float = 1e-10,
) -> HostLBFGSResult:
    """Minimize with host-f64 L-BFGS + strong-Wolfe zoom line search.

    ``value_and_grad`` maps a float64 vector to (float64 loss, float64 grad)
    — typically a jitted TPU function whose compute is f32 with an f64
    reduction tail.  ``init_carry``/``result.carry`` persist curvature
    memory across calls (dict of arrays — picklable for checkpoints).
    ``on_iter(k, x, f)`` runs every iteration (logging / checkpoint hooks).
    Curvature pairs with y·s <= curvature_eps·|y||s| are skipped (cautious
    update: f32 gradient noise must not poison the inverse-Hessian model).
    """
    x = np.asarray(x0, np.float64).copy()
    t_end = time.time() + wall_budget if wall_budget else None

    S: List[np.ndarray] = []
    Y: List[np.ndarray] = []
    R: List[float] = []
    n_evals = 0

    def vg(z):
        nonlocal n_evals
        n_evals += 1
        f, g = value_and_grad(z)
        return float(f), np.asarray(g, np.float64)

    if init_carry is not None:
        S = [np.asarray(s) for s in init_carry["S"]]
        Y = [np.asarray(y) for y in init_carry["Y"]]
        R = [float(r) for r in init_carry["R"]]

    f, g = vg(x)
    history = [f]
    flat = 0
    status = "maxiter"
    k = 0

    def _linesearch(d, dg, alpha0):
        """Strong-Wolfe zoom (Nocedal & Wright alg. 3.5/3.6) with an
        accept-best-seen fallback: under f32 gradient noise the curvature
        condition may be unattainable, but any f64-certified decrease is
        progress — returns (alpha, f, g) or None."""
        f0, g0d = f, dg
        best = None  # (alpha, f, g) with f < f0, Wolfe or not
        alpha, alpha_prev = alpha0, 0.0
        f_prev_ls, fd_prev = f0, g0d
        lo = hi = flo = None
        for ls in range(max_linesearch_steps):
            f_a, g_a = vg(x + alpha * d)
            fd_a = g_a.dot(d)
            if f_a < f0 and (best is None or f_a < best[1]):
                best = (alpha, f_a, g_a)
            if f_a > f0 + c1 * alpha * g0d or (ls > 0 and f_a >= f_prev_ls):
                lo, hi, flo = alpha_prev, alpha, f_prev_ls
                break
            if abs(fd_a) <= -c2 * g0d:
                return alpha, f_a, g_a
            if fd_a >= 0:
                lo, hi, flo = alpha, alpha_prev, f_a
                break
            alpha_prev, f_prev_ls, fd_prev = alpha, f_a, fd_a
            alpha = min(alpha * 2.0, 1e4)
        if lo is not None:
            for _ in range(max_linesearch_steps):
                a_mid = 0.5 * (lo + hi)
                f_m, g_m = vg(x + a_mid * d)
                fd_m = g_m.dot(d)
                if f_m < f0 and (best is None or f_m < best[1]):
                    best = (a_mid, f_m, g_m)
                if f_m > f0 + c1 * a_mid * g0d or f_m >= flo:
                    hi = a_mid
                else:
                    if abs(fd_m) <= -c2 * g0d:
                        return a_mid, f_m, g_m
                    if fd_m * (hi - lo) >= 0:
                        hi = lo
                    lo, flo = a_mid, f_m
                if abs(hi - lo) < 1e-16 * max(1.0, abs(lo)):
                    break
        return best

    for k in range(1, maxiter + 1):
        if t_end and time.time() > t_end:
            break
        d = _two_loop(g, S, Y, R)
        dg = d.dot(g)
        if dg >= 0:  # not a descent direction (noise-corrupted memory)
            S.clear(); Y.clear(); R.clear()
            d = -g
            dg = -g.dot(g)
        if dg == 0.0:
            status = "gtol"
            break

        # Gradient-descent first step: scale to unit step length (standard
        # cold-start guard against |g|-sized overshoot).
        alpha0 = 1.0 if S else min(1.0, 1.0 / max(np.linalg.norm(g), 1.0))
        hit = _linesearch(d, dg, alpha0)
        if hit is None and S:
            # Stale/noise-poisoned memory: restart memoryless before giving
            # up (scipy's implicit behavior via its restart heuristics).
            S.clear(); Y.clear(); R.clear()
            d = -g
            dg = -g.dot(g)
            hit = _linesearch(d, dg, min(1.0, 1.0 / max(np.linalg.norm(g),
                                                        1.0)))
        if hit is None:
            status = "linesearch"
            break
        alpha, f_new, g_new = hit

        x_new = x + alpha * d
        s = x_new - x
        y = g_new - g
        sy = s.dot(y)
        if sy > curvature_eps * np.linalg.norm(s) * np.linalg.norm(y):
            S.append(s); Y.append(y); R.append(1.0 / sy)
            if len(S) > memory_size:
                S.pop(0); Y.pop(0); R.pop(0)

        denom = max(abs(f), abs(f_new), 1.0)
        flat = flat + 1 if (f - f_new) <= ftol * denom else 0
        x, f, g = x_new, f_new, g_new
        history.append(f)
        if on_iter is not None:
            on_iter(k, x, f)
        if f <= target:
            status = "target"
            break
        if flat >= patience:
            status = "ftol"
            break
        if gtol > 0 and np.max(np.abs(g)) <= gtol:
            status = "gtol"
            break

    carry = {"S": S, "Y": Y, "R": R}
    return HostLBFGSResult(
        x=x, final_loss=f, n_iters=k, n_evals=n_evals,
        loss_history=np.asarray(history), converged=status, carry=carry,
    )
