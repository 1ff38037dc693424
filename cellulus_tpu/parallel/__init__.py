"""Device-mesh parallelism: mesh construction, sharding layouts, and
multi-host (jax.distributed) helpers."""

from . import distributed
from .mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    stacked_batch_sharding,
)

__all__ = [
    "batch_sharding",
    "distributed",
    "make_mesh",
    "replicated_sharding",
    "stacked_batch_sharding",
]
