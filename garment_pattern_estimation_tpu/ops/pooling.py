"""Masked pooling over rectangular point batches.

The reference pools ragged torch-geometric batches with CUDA scatter kernels
(`global_max/mean/add_pool` — nn/net_blocks.py:144-152). With a fixed
`mesh_samples` per cloud our batches are rectangular (B, N, C), so pooling is
a plain masked reduction that XLA fuses into the surrounding ops; the mask
argument covers graph-pooled / ragged cases.
"""
from __future__ import annotations

import jax.numpy as jnp

_NEG_BIG = -1e30


def masked_max_pool(features, mask=None, axis=1):
    if mask is None:
        return jnp.max(features, axis=axis)
    mask = jnp.expand_dims(mask, -1)
    return jnp.max(jnp.where(mask, features, _NEG_BIG), axis=axis)


def masked_mean_pool(features, mask=None, axis=1):
    if mask is None:
        return jnp.mean(features, axis=axis)
    mask = jnp.expand_dims(mask, -1).astype(features.dtype)
    total = jnp.sum(features * mask, axis=axis)
    count = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return total / count


def masked_add_pool(features, mask=None, axis=1):
    if mask is None:
        return jnp.sum(features, axis=axis)
    mask = jnp.expand_dims(mask, -1).astype(features.dtype)
    return jnp.sum(features * mask, axis=axis)


GLOBAL_POOLS = {
    'max': masked_max_pool,
    'mean': masked_mean_pool,
    'add': masked_add_pool,
}


def gather_neighbors(features, neighbor_idx):
    """(B, N, C), (B, N, k) -> neighbor features (B, N, k, C).

    Formulated as a flat row gather (batch offsets folded into the indices):
    ~1.75x faster on TPU than the broadcasting take_along_axis form."""
    B, N, C = features.shape
    k = neighbor_idx.shape[-1]
    flat = features.reshape(B * N, C)
    offsets = (jnp.arange(B, dtype=neighbor_idx.dtype) * N)[:, None, None]
    rows = (neighbor_idx + offsets).reshape(-1)
    return jnp.take(flat, rows, axis=0).reshape(B, N, k, C)
