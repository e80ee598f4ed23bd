"""Jitted, sharding-aware training steps.

One compiled step does value+grad over every point bank, the optimizer
update, and returns per-component losses — the unit that both the Adam loop
and multi-chip execution build on.  Under a :class:`jax.sharding.Mesh` the
banks carry NamedShardings along their point axis and parameters are
replicated; XLA GSPMD inserts the cross-chip psums for the masked means and
gradient all-reduce over ICI (the TPU-native replacement for the reference's
single-GPU full-batch step, SURVEY.md §2.3).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import optax

from ..banks import PointBank
from ..losses.terms import LossSpec
from ..ops.elasticity import Material


def make_loss_fn(model, spec: LossSpec, material: Material) -> Callable:
    """loss(params, banks) -> (total, components). Pure; jit/AD-safe."""

    def loss_fn(params, banks: Dict[str, PointBank]):
        return spec.evaluate(model, params, material, banks)

    return loss_fn


def make_grad_step(
    model,
    spec: LossSpec,
    material: Material,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """Compiled (params, opt_state, banks) -> (params, opt_state, loss, comps).

    Donates params/opt_state buffers so the update is in-place on device.
    """
    loss_fn = make_loss_fn(model, spec, material)
    vg = jax.value_and_grad(loss_fn, has_aux=True)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, banks):
        (loss, comps), grads = vg(params, banks)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, comps

    return step


def make_microbatched_loss_fn(
    model,
    spec: LossSpec,
    material: Material,
    *,
    collocation_key: str = "collocation",
    num_microbatches: int = 1,
) -> Callable:
    """Loss with the collocation bank processed in ``num_microbatches``
    sequential chunks via ``lax.scan`` — gradient accumulation for 1M+ point
    banks (BASELINE.json config #3) without materializing all activations.

    The PDE component of the loss is recomputed as the mean over chunks
    (chunks are equal-sized, so this equals the full-bank masked mean);
    non-collocation terms are evaluated once, full-batch.
    """
    # Split the spec: collocation terms vs the rest.
    col_terms = tuple(t for t in spec.terms if t[0] == collocation_key)
    other_terms = tuple(t for t in spec.terms if t[0] != collocation_key)
    col_spec = LossSpec(terms=col_terms, weights=spec.weights)
    other_spec = LossSpec(terms=other_terms, weights=spec.weights)

    def loss_fn(params, banks: Dict[str, PointBank]):
        bank = banks[collocation_key]
        n = bank.n_total
        if n % num_microbatches:
            raise ValueError(
                f"collocation bank size {n} not divisible by "
                f"{num_microbatches} microbatches"
            )
        chunk = n // num_microbatches

        def slice_bank(i):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * chunk, chunk)
            return PointBank(
                xyt=sl(bank.xyt), mask=sl(bank.mask),
                values={k: sl(v) for k, v in bank.values.items()},
            )

        import jax.numpy as jnp

        # Chunks may hold different numbers of valid (unmasked) points, so
        # the exact full-bank mean is the count-weighted mean of chunk means.
        # jax.checkpoint on the body makes reverse-mode recompute each
        # chunk's activations instead of storing all of them - without it the
        # scan would retain every chunk's forward state and the memory
        # saving of microbatching would be lost.
        @jax.checkpoint
        def chunk_sums(params, i):
            sub = slice_bank(i)
            c = jnp.sum(sub.mask)
            _, comps = col_spec.evaluate(
                model, params, material, {collocation_key: sub}
            )
            return {k: v * c for k, v in comps.items()}, c

        def body(carry, i):
            sums, count = carry
            new_sums, c = chunk_sums(params, i)
            sums = {k: sums[k] + new_sums[k] for k in sums}
            return (sums, count + c), None

        init_sums = {k: jnp.zeros(()) for k in ("f_uv", "f_s")}
        (sums, count), _ = jax.lax.scan(
            body, (init_sums, jnp.zeros(())), jnp.arange(num_microbatches)
        )
        comps = {k: v / jnp.maximum(count, 1.0) for k, v in sums.items()}

        total_other, comps_other = other_spec.evaluate(
            model, params, material, banks
        )
        wmap = spec.weight_map()
        comps_all = {**comps_other, **comps}
        total = sum(wmap.get(k, 0.0) * v for k, v in comps_all.items())
        return total, comps_all

    return loss_fn
