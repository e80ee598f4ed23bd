"""Profiling utilities: phase timers, step-rate counters, XLA traces.

Fills the reference's tracing/profiling gap (SURVEY.md §5: wall-clock prints
only): accurate device-step timing (block-per-call and chained/amortized —
the latter is what a device-resident optimizer loop actually achieves),
collocation-evals/sec computation, and optional jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


def time_blocked(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Mean seconds per call, blocking after every call (includes dispatch
    latency — what a host-driven loop like the reference's scipy L-BFGS
    pays every iteration)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def time_chained(
    step_fn: Callable, carry, *args, iters: int = 100, warmup: int = 2
) -> float:
    """Mean seconds per step of a self-feeding step function
    ``carry -> carry`` — amortized device throughput, the number a
    device-resident optimizer loop actually achieves."""
    for _ in range(warmup):
        carry = step_fn(carry, *args)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step_fn(carry, *args)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (TensorBoard format) when log_dir set."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def evals_per_sec(n_points: int, step_seconds: float) -> float:
    return n_points / step_seconds


def flops_estimate_mlp_jet(
    n_points: int, layers, *, order: int = 1, with_grad: bool = True
) -> int:
    """Rough FLOP count for a jet forward (+ backward) through a tanh MLP:
    (order-dependent) derivative streams share each layer matmul."""
    streams = 1 + (layers[0] if True else 0)  # value + A tangents
    streams = 1 + (layers[0])
    if order >= 2:
        streams += 1
    fwd = 0
    for fan_in, fan_out in zip(layers[:-1], layers[1:]):
        fwd += 2 * fan_in * fan_out * streams
    total = fwd * (3 if with_grad else 1)  # backward ≈ 2x forward
    return n_points * total
