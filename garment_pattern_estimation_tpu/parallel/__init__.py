"""Mesh construction + sharding specs for data-parallel TPU training."""

from .mesh import (
    make_mesh, make_mesh_2d, batch_sharding, points_sharding,
    replicated_sharding, shard_batch, replicate,
    pad_batch_to_multiple, DATA_AXIS, POINTS_AXIS,
)

__all__ = [
    'make_mesh', 'make_mesh_2d', 'batch_sharding', 'points_sharding',
    'replicated_sharding', 'shard_batch', 'replicate',
    'pad_batch_to_multiple', 'DATA_AXIS', 'POINTS_AXIS',
]
