"""Residual-based adaptive collocation sampling (beyond-reference).

The reference refines sampling *statically* — hand-placed LHS boxes near the
stress concentration / wave source (train.py:904; SURVEY.md §2 #14).  This
module adds the dynamic version from the PINN literature (residual-based
adaptive refinement / importance sampling, cf. PAPERS.md entries on adaptive
and importance sampling): periodically evaluate the PDE residual on a
candidate pool and move the worst-sampled regions into the collocation bank.

Two strategies:
  * ``topk_refine`` — RAR: append the top-k residual candidates.
  * ``residual_resample`` — importance resampling: draw a whole new bank with
    probability ∝ residual^power (plus a uniform floor to keep coverage).

Both keep bank shapes static (jit-friendly): refine swaps the k lowest-
residual existing points rather than growing the array.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..banks import PointBank
from ..models.fields import FieldSpec
from ..ops import residuals as res_ops
from ..ops.elasticity import Material


def pointwise_residual_norm(
    model, params, mat: Material, plane: str, xyt: jax.Array
) -> jax.Array:
    """Per-point L2 norm across all PDE residual channels — the sampling
    signal."""
    jet = model.jet(params, xyt)
    res = res_ops.residuals(jet, model.spec, mat, plane)
    total = sum(r * r for r in res.values())
    return jnp.sqrt(total)


def topk_refine(
    model, params, mat: Material, plane: str,
    bank: PointBank, candidates: np.ndarray, k: int,
) -> Tuple[PointBank, dict]:
    """RAR step: replace the bank's k lowest-residual points with the k
    highest-residual candidates (bank shape unchanged).

    Padding rows (mask 0) are preferred for replacement before any real
    point is evicted.
    """
    cand = jnp.asarray(candidates, bank.xyt.dtype)
    r_cand = pointwise_residual_norm(model, params, mat, plane, cand)
    r_bank = pointwise_residual_norm(model, params, mat, plane, bank.xyt)
    # Padding rows get -inf so they are evicted first.
    r_bank = jnp.where(bank.mask > 0, r_bank, -jnp.inf)

    _, worst_cand = jax.lax.top_k(r_cand, k)          # best candidates
    _, best_bank = jax.lax.top_k(-r_bank, k)          # weakest bank slots

    new_xyt = bank.xyt.at[best_bank].set(cand[worst_cand])
    new_mask = bank.mask.at[best_bank].set(1.0)
    info = {
        "replaced": k,
        "cand_residual_mean": float(jnp.mean(r_cand[worst_cand])),
        "evicted_residual_mean": float(
            jnp.mean(jnp.where(jnp.isfinite(r_bank[best_bank]),
                               r_bank[best_bank], 0.0))
        ),
    }
    if bank.values:
        raise ValueError(
            "topk_refine only supports value-free banks (collocation)"
        )
    return PointBank(xyt=new_xyt, mask=new_mask, values={}), info


def residual_resample(
    model, params, mat: Material, plane: str,
    pool: np.ndarray, n: int, *,
    power: float = 1.0, uniform_floor: float = 0.1,
    seed: int = 0, batch: int = 65536,
) -> np.ndarray:
    """Importance-resample ``n`` points from a candidate pool with
    p ∝ (1-floor)·residual^power/Σ + floor·uniform."""
    pool = np.asarray(pool)
    rs = []
    for start in range(0, pool.shape[0], batch):
        chunk = jnp.asarray(pool[start : start + batch], jnp.float32)
        rs.append(np.asarray(
            pointwise_residual_norm(model, params, mat, plane, chunk)
        ))
    r = np.concatenate(rs) ** power
    p = r / max(r.sum(), 1e-30)
    p = (1.0 - uniform_floor) * p + uniform_floor / pool.shape[0]
    p /= p.sum()
    rng = np.random.default_rng(seed)
    idx = rng.choice(pool.shape[0], size=n, replace=True, p=p)
    return pool[idx]
