"""Device-mesh parallelism: mesh construction and sharding layouts."""

from .mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    stacked_batch_sharding,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicated_sharding",
    "stacked_batch_sharding",
]
