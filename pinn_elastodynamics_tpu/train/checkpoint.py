"""Checkpoint I/O.

Two formats:

* **native** — a single pickle of the full numpy-ified pytree (params and,
  unlike the reference, optimizer state too), with atomic write for
  crash-safe periodic checkpointing.
* **reference interop** — the reference's ``[weights_list, biases_list]``
  pickle layout (/root/reference/PlateHoleQuarter/train/train.py:276-306),
  readable and writable, so the shipped trained networks can warm-start or
  golden-test this framework and vice versa.
"""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mlp import Params


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree) -> None:
    """Atomically pickle a pytree (params / opt state / step counters)."""
    host = _to_numpy(tree)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(host, f)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, dtype=None):
    with open(path, "rb") as f:
        host = pickle.load(f)

    def conv(x):
        if isinstance(x, np.ndarray) and x.dtype.kind == "f":
            return jnp.asarray(x, dtype) if dtype is not None else jnp.asarray(x)
        if isinstance(x, np.ndarray) and x.dtype.kind in "iub":
            # Integer/bool leaves (optimizer step counters, patience flags)
            # keep their dtype — casting them to the float dtype would
            # corrupt restored optimizer state.
            return jnp.asarray(x)
        return x

    return jax.tree.map(conv, host)


# ---------------------------------------------------------------------------
# Reference pickle interop: [ [W_0..W_L], [b_0..b_L] ], b_i shaped (1, out).
# ---------------------------------------------------------------------------

def load_reference_pickle(path: str, dtype=jnp.float32) -> Params:
    """Load a reference ``[weights, biases]`` pickle as our MLP params."""
    with open(path, "rb") as f:
        weights, biases = pickle.load(f)
    if len(weights) != len(biases):
        raise ValueError(
            f"malformed reference pickle: {len(weights)} weights vs "
            f"{len(biases)} biases"
        )
    params: Params = []
    for w, b in zip(weights, biases):
        w = np.asarray(w)
        b = np.asarray(b).reshape(-1)
        if w.shape[1] != b.shape[0]:
            raise ValueError(f"layer shape mismatch: W {w.shape} vs b {b.shape}")
        params.append({"W": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)})
    return params


def save_reference_pickle(path: str, params: Params) -> None:
    """Write our MLP params in the reference's pickle layout (b as (1, out))."""
    weights: List[np.ndarray] = [np.asarray(l["W"]) for l in params]
    biases: List[np.ndarray] = [np.asarray(l["b"])[None, :] for l in params]
    with open(path, "wb") as f:
        pickle.dump([weights, biases], f)


def assert_layers_match(params: Params, layers) -> None:
    """The reference's load-time layer assert (train.py:299)."""
    dims = [int(params[0]["W"].shape[0])] + [int(l["W"].shape[1]) for l in params]
    if list(layers) != dims:
        raise AssertionError(f"checkpoint layers {dims} != expected {list(layers)}")
