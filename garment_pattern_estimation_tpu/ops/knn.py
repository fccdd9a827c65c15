"""k-nearest-neighbor search over batched point features.

This is the throughput-defining op of the whole model: the dynamic-graph
EdgeConv encoder rebuilds a kNN graph from the *current* features at every
layer (reference: torch-cluster `knn` inside DynamicEdgeConv —
nn/net_blocks.py:127-135), which is O(B * N^2) in distance evaluations.

Two implementations with identical semantics (self-neighbor included, ties
broken towards the lower index — matching torch-cluster):

  * `knn_xla`  — pure-XLA, query-chunked so the (B, N, N) distance matrix is
    never fully materialized; distances hit the MXU as a matmul. Used as the
    CPU/interpret parity oracle and as fallback.
  * `knn_pallas` — a tiled Pallas TPU kernel that streams column tiles of the
    distance matrix through VMEM and maintains a running top-k per query row,
    so HBM traffic for distances is zero (they live and die in VMEM). This is
    what makes the 10k-point stress config (batch 128) fit on a chip.

Distances are squared euclidean.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # plain float: jnp constants would be captured as kernel consts


def pairwise_sq_dists(queries, keys):
    """(..., M, D) x (..., N, D) -> (..., M, N) squared euclidean distances.

    Formulated as norms + a matmul so XLA tiles it onto the MXU.
    """
    q_norm = jnp.sum(queries * queries, axis=-1, keepdims=True)
    k_norm = jnp.sum(keys * keys, axis=-1, keepdims=True)
    cross = jnp.einsum('...md,...nd->...mn', queries, keys,
                       preferred_element_type=jnp.float32)
    return q_norm + jnp.swapaxes(k_norm, -1, -2) - 2.0 * cross


def knn_xla(points, k, query_chunk=512):
    """Indices (B, N, k) of the k nearest points (self included) per point.

    Chunks the query axis so peak memory is O(B * chunk * N).
    """
    B, N, D = points.shape
    k = min(k, N)
    query_chunk = min(query_chunk, N)
    num_chunks = -(-N // query_chunk)
    pad_n = num_chunks * query_chunk

    padded = jnp.pad(points, ((0, 0), (0, pad_n - N), (0, 0)))
    chunks = padded.reshape(B, num_chunks, query_chunk, D)

    def per_chunk(chunk):
        dists = pairwise_sq_dists(chunk, points)            # (B, C, N)
        _, idx = jax.lax.top_k(-dists, k)                    # ties -> lower index
        return idx

    idx = jax.lax.map(per_chunk, jnp.moveaxis(chunks, 1, 0))   # (chunks, B, C, k)
    idx = jnp.moveaxis(idx, 0, 1).reshape(B, pad_n, k)
    return idx[:, :N]


# ----------------------------------------------------------------------
# Pallas kernel
# ----------------------------------------------------------------------

def _knn_kernel(x_ref, q_ref, idx_ref, dist_scratch, idx_scratch, *, k, tile_n, n_points):
    """One grid step: running top-k for TILE_M query rows of one batch elem.

    x_ref:   (1, N, D)   all points of this batch element (VMEM)
    q_ref:   (1, TM, D)  the query tile (VMEM)
    idx_ref: (1, TM, k)  output neighbor indices
    scratch: running (TM, k) best distances / indices
    """
    num_tiles = n_points // tile_n

    q = q_ref[0]                                             # (TM, D)
    q_norm = jnp.sum(q * q, axis=-1, keepdims=True)          # (TM, 1)

    dist_scratch[:] = jnp.full_like(dist_scratch, jnp.asarray(_BIG, dist_scratch.dtype))
    idx_scratch[:] = jnp.zeros_like(idx_scratch)

    def col_tile(t, _):
        col_base = t * tile_n
        keys = x_ref[0, pl.ds(col_base, tile_n), :]          # (TN, D)
        k_norm = jnp.sum(keys * keys, axis=-1)               # (TN,)
        cross = jax.lax.dot_general(
            q, keys, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (TM, TN)
        dists = q_norm + k_norm[None, :] - 2.0 * cross

        col_ids = col_base + jax.lax.broadcasted_iota(jnp.int32, dists.shape, 1)

        # the running top-k sits in the leading columns, so on ties earlier
        # (lower-index) entries win — same tie-break as lax.top_k
        merged_d = jnp.concatenate([dist_scratch[:], dists], axis=1)   # (TM, k+TN)
        merged_i = jnp.concatenate([idx_scratch[:], col_ids], axis=1)

        for slot in range(k):  # k is tiny (5): unrolled min-extraction
            pos = jnp.argmin(merged_d, axis=1)                          # (TM,)
            one_hot = pos[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, merged_d.shape, 1)
            dist_scratch[:, slot] = jnp.min(merged_d, axis=1)
            idx_scratch[:, slot] = jnp.sum(jnp.where(one_hot, merged_i, 0), axis=1)
            merged_d = jnp.where(one_hot, _BIG, merged_d)
        return 0

    jax.lax.fori_loop(0, num_tiles, col_tile, 0)
    idx_ref[0] = idx_scratch[:]


def knn_pallas(points, k, tile_m=256, tile_n=512, interpret=False):
    """Pallas tiled top-k kNN: indices (B, N, k), self included.

    Pads N to a tile multiple with far-away ghost points so padded keys never
    enter any top-k; padded query rows are sliced off on return.
    """
    B, N, D = points.shape
    k = min(k, N)
    tile_m = min(tile_m, _round_up(N, 8))
    tile_n = min(tile_n, _round_up(N, 128))
    pad_n = _round_up(N, math.lcm(tile_m, tile_n))
    pad_d = _round_up(D, 128)  # lane-align features

    x = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, pad_n - N), (0, pad_d - D)))
    if pad_n > N:
        x = x.at[:, N:, 0].set(1e15)  # ghost points: never selected

    grid = (B, pad_n // tile_m)
    kernel = functools.partial(_knn_kernel, k=k, tile_n=tile_n, n_points=pad_n)

    idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, pad_n, pad_d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, pad_d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, k), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, pad_n, k), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_m, k), jnp.float32),
            pltpu.VMEM((tile_m, k), jnp.int32),
        ],
        interpret=interpret,
    )(x, x)

    return idx[:, :N]


def _round_up(x, m):
    return -(-x // m) * m


def knn(points, k, use_pallas=None, **kwargs):
    """Dispatch: Pallas on TPU backends, XLA elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    if use_pallas:
        return knn_pallas(points, k, **kwargs)
    return knn_xla(points, k)
