"""Device mesh construction and sharding placement.

The reference runs one process on one pinned GPU with no partitioning of any
kind (/root/reference/PlateHoleQuarter/train/train.py:21,946).  The TPU-native
scaling axis here is *data parallelism over collocation points* (SURVEY.md
§2.3): point banks are sharded along their batch axis across a 1-D mesh,
parameters are replicated, and XLA's GSPMD inserts the psum/all-reduce
collectives for the masked means and gradients over ICI.  The same code runs
unchanged on a single device (mesh of size 1).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..banks import PointBank

POINTS_AXIS = "points"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = POINTS_AXIS,
) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def bank_sharding(mesh: Mesh, axis_name: str = POINTS_AXIS) -> NamedSharding:
    """Points sharded along the batch axis; trailing axes replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_bank(bank: PointBank, mesh: Mesh, axis_name: str = POINTS_AXIS) -> PointBank:
    """Place a bank's arrays with the batch axis sharded across the mesh.

    The bank must be padded to a multiple of the mesh size (see
    ``banks.make_bank(pad_to_multiple_of=...)``); masked means make padding
    loss-neutral.
    """
    n_dev = mesh.devices.size
    if bank.n_total % n_dev:
        raise ValueError(
            f"bank size {bank.n_total} not divisible by mesh size {n_dev}; "
            "pad with make_bank(pad_to_multiple_of=mesh_size)"
        )
    sh = bank_sharding(mesh, axis_name)
    put = lambda x: jax.device_put(x, sh)
    return PointBank(
        xyt=put(bank.xyt),
        mask=put(bank.mask),
        values={k: put(v) for k, v in bank.values.items()},
    )


def shard_banks(
    banks: Dict[str, PointBank], mesh: Mesh, axis_name: str = POINTS_AXIS
) -> Dict[str, PointBank]:
    return {k: shard_bank(b, mesh, axis_name) for k, b in banks.items()}


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (parameters, optimizer state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
