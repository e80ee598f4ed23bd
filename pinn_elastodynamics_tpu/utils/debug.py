"""Numerical-debugging helpers.

The reference's only guard against numerical failure is rerunning by hand
(SURVEY.md §5: race detection/sanitizers — none).  Here: NaN-hunting contexts
for development, finite-ness assertions for checkpoints/steps, and a pytree
diff for reproducibility checks.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def nan_debugging(enable: bool = True) -> Iterator[None]:
    """Enable jax_debug_nans within a scope (jit re-runs op-by-op on NaN)."""
    if not enable:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree, name: str = "pytree") -> None:
    """Raise with the offending leaf path if any value is non-finite."""
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if arr.dtype.kind in "fc" and not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {n_bad} non-finite "
                f"values (shape {arr.shape})"
            )


def tree_max_abs_diff(a, b) -> float:
    """Max |a - b| across two pytrees (reproducibility / parity checks)."""
    diffs = jax.tree.map(
        lambda x, y: jnp.max(jnp.abs(jnp.asarray(x) - jnp.asarray(y))), a, b
    )
    return float(max(jax.tree.leaves(diffs), default=0.0))
