"""Mesh construction + sharding specs for data-parallel TPU training."""

from .mesh import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch, replicate,
    pad_batch_to_multiple, DATA_AXIS,
)

__all__ = [
    'make_mesh', 'batch_sharding', 'replicated_sharding', 'shard_batch',
    'replicate', 'pad_batch_to_multiple', 'DATA_AXIS',
]
