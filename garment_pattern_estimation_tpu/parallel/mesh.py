"""Device mesh + sharding helpers for data-parallel training.

The reference's entire distributed story is single-process
`torch.nn.DataParallel` (nn/train.py:124-125). The TPU-native equivalent is
a 1-D `jax.sharding.Mesh` over the slice's chips: the batch axis is sharded
over ICI, parameters are replicated, and XLA inserts the gradient psum when
the jitted train step consumes sharded inputs and produces replicated
updates. DCN multi-slice is a straightforward extension of the same specs
(add a second mesh axis) but has no reference counterpart.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = 'data'
POINTS_AXIS = 'points'


def make_mesh(n_devices=None, devices=None):
    """1-D data-parallel mesh over the first `n_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_2d(data, points, devices=None):
    """2-D (data x points) mesh: batch shards over `data`, each data slice
    shards its clouds' point axis over `points` (sequence parallelism —
    the `trainer.mesh: {data: d, points: p}` config). Collectives within a
    ring of `points` neighbors ride ICI."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < data * points:
        raise ValueError(
            f'make_mesh_2d::{data}x{points} mesh needs {data * points} '
            f'devices, only {len(devices)} visible')
    grid = np.asarray(devices[:data * points]).reshape(data, points)
    return Mesh(grid, (DATA_AXIS, POINTS_AXIS))


def points_sharding(mesh):
    """(B, N, C) features: batch over the data axis, points over the points
    axis. XLA's SPMD partitioner propagates this through the whole step —
    the N^2 distance work shards over queries, pools psum over points."""
    return NamedSharding(mesh, P(DATA_AXIS, POINTS_AXIS))


def batch_sharding(mesh):
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Place every array of a (pytree) batch with its leading axis sharded
    over the mesh's data axis. Batch size must divide the data-axis size —
    callers pad/crop. On a 2-D (data x points) mesh, 3-D `features` arrays
    (B, N, C) additionally shard their point axis over the points axis."""
    data_sharding = batch_sharding(mesh)
    placed = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding), batch)
    if (POINTS_AXIS in mesh.axis_names and isinstance(placed, dict)
            and getattr(placed.get('features'), 'ndim', 0) == 3):
        placed['features'] = jax.device_put(
            placed['features'], points_sharding(mesh))
    return placed


def replicate(mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_multiple(batch, multiple):
    """Right-pad every leading axis to a multiple of the mesh size (repeat
    the last element); returns (padded batch, real size)."""
    import numpy as onp

    def leading(x):
        return x.shape[0] if hasattr(x, 'shape') and x.ndim > 0 else None

    sizes = [leading(x) for x in jax.tree_util.tree_leaves(batch)
             if leading(x) is not None]
    size = sizes[0]
    pad = (-size) % multiple
    if pad == 0:
        return batch, size

    def pad_arr(x):
        if not hasattr(x, 'shape') or x.ndim == 0 or x.shape[0] != size:
            return x
        reps = onp.concatenate([x, onp.repeat(x[-1:], pad, axis=0)])
        return reps

    return jax.tree_util.tree_map(pad_arr, batch), size
