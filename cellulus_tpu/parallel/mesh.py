"""Device mesh + sharding layout helpers.

The reference is single-device (``configs/train_config.py:127``). Here,
parallelism is expressed TPU-natively: a ``jax.sharding.Mesh`` with a
``data`` axis; training batches (crops, anchor/reference coordinates) are
sharded over ``data`` while parameters stay replicated. Gradient all-reduce
is emitted by XLA (``psum`` over ICI) when the jitted loss sums over the
sharded batch — no explicit collectives in user code.

Tiled inference parallelizes the same way: tiles are independent, so a batch
of tiles shards over ``data`` with no inter-chip communication at all.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_data_shards: Optional[int] = None, devices=None) -> Mesh:
    """Build a 1-D data-parallel mesh over the local devices.

    Args:
        num_data_shards: Shards on the ``data`` axis; ``None`` uses every
            local device.
    """
    if devices is None:
        devices = jax.devices()
    if num_data_shards is None:
        num_data_shards = len(devices)
    if num_data_shards > len(devices):
        raise ValueError(
            f"requested {num_data_shards} data shards but only "
            f"{len(devices)} devices are available"
        )
    devices = np.asarray(devices[:num_data_shards])
    return Mesh(devices, (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over ``data``; all other axes replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Axis 1 (batch) sharded over ``data``; axis 0 is the scan/step axis
    (used by steps_per_dispatch K-stacked inputs)."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
