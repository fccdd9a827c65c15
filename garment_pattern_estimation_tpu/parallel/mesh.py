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


def make_mesh(n_devices=None, devices=None):
    """1-D data-parallel mesh over the first `n_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh):
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Place every array of a (pytree) batch with its leading axis sharded
    over the mesh. Batch size must divide the mesh size — callers pad/crop."""
    sharding = batch_sharding(mesh)

    def place(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, batch)


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
