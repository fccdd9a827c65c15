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
GHOST = 1e15  # padded keys get this coordinate: never enter any top-k


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

_LANES = 128  # accumulators are lane-aligned; only the first k lanes are live


_INT_BIG = jnp.iinfo(jnp.int32).max


def _extract_topk(dists, col_ids, k):
    """Smallest-k (values, ids) of each row of `dists` (TM, C), returned in
    lane-aligned (TM, 128) arrays (slots beyond k stay BIG/0). Ascending
    extraction with lowest-index tie-break (lax.top_k semantics).

    Two cross-lane reductions per slot (min value, min id among hits) —
    cross-lane reductions dominate the kernel's VPU time, so this form is
    ~1.5x cheaper than the argmin+min+select formulation."""
    TM = dists.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TM, _LANES), 1)
    out_d = jnp.full((TM, _LANES), _BIG, jnp.float32)
    out_i = jnp.zeros((TM, _LANES), jnp.int32)
    for slot in range(k):  # k is tiny (5): unrolled
        val = jnp.min(dists, axis=1)                               # (TM,)
        hit = dists == val[:, None]
        idx = jnp.min(jnp.where(hit, col_ids, _INT_BIG), axis=1)   # (TM,)
        slot_mask = lane == slot  # static per slot
        out_d = jnp.where(slot_mask, val[:, None], out_d)
        out_i = jnp.where(slot_mask, idx[:, None], out_i)
        dists = jnp.where(col_ids == idx[:, None], _BIG, dists)
    return out_d, out_i


def _knn_kernel(x_ref, q_ref, idx_ref, *, k, tile_n, n_points):
    """One grid step: top-k for TILE_M query rows of one batch element.

    Distances for a column tile come off the MXU; per-tile top-k extraction
    and the running merge work on lane-aligned (TM, 128) arrays (narrow or
    unaligned lane shapes force catastrophic relayouts on the VPU).
    """
    num_tiles = n_points // tile_n
    q = q_ref[0]                                             # (TM, D)
    q_norm = jnp.sum(q * q, axis=-1, keepdims=True)          # (TM, 1)
    TM = q.shape[0]

    def tile_topk(t):
        col_base = t * tile_n
        keys = x_ref[0, pl.ds(col_base, tile_n), :]          # (TN, D)
        k_norm = jnp.sum(keys * keys, axis=-1)               # (TN,)
        cross = jax.lax.dot_general(
            q, keys, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (TM, TN)
        dists = q_norm + k_norm[None, :] - 2.0 * cross
        col_ids = col_base + jax.lax.broadcasted_iota(jnp.int32, dists.shape, 1)
        return _extract_topk(dists, col_ids, k)              # (TM, 128)

    def col_tile(t, carry):
        acc_d, acc_i = carry
        tile_d, tile_i = tile_topk(t)
        # merge: running top-k first -> earlier (lower-index) entries win
        # ties, matching lax.top_k
        merged_d = jnp.concatenate([acc_d, tile_d], axis=1)  # (TM, 256) aligned
        merged_i = jnp.concatenate([acc_i, tile_i], axis=1)
        return _extract_topk(merged_d, merged_i, k)

    if num_tiles == 1:
        acc_d, acc_i = tile_topk(0)  # no merge pass needed
    else:
        acc_d, acc_i = jax.lax.fori_loop(
            0, num_tiles, col_tile,
            (jnp.full((TM, _LANES), _BIG, jnp.float32),
             jnp.zeros((TM, _LANES), jnp.int32)))
    idx_ref[0] = acc_i


def _knn_kernel_hbm(x_hbm, q_ref, idx_ref, keys_buf, sems, *, k, tile_n, n_points):
    """HBM-streaming variant for point sets too large for VMEM: key tiles are
    double-buffered into VMEM with async DMA while the previous tile's
    distances/top-k compute. `x_hbm` is the full (B, N, D) array (ANY memory
    space requires a trivial block spec); the batch element is selected here."""
    b = pl.program_id(0)
    num_tiles = n_points // tile_n
    q = q_ref[0]
    q_norm = jnp.sum(q * q, axis=-1, keepdims=True)
    TM = q.shape[0]

    def tile_dma(slot, t):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(t * tile_n, tile_n), :],
            keys_buf.at[slot], sems.at[slot])

    tile_dma(0, 0).start()

    def col_tile(t, carry):
        acc_d, acc_i = carry
        slot = t % 2

        @pl.when(t + 1 < num_tiles)
        def _():
            tile_dma((t + 1) % 2, t + 1).start()

        tile_dma(slot, t).wait()
        keys = keys_buf[slot]
        k_norm = jnp.sum(keys * keys, axis=-1)
        cross = jax.lax.dot_general(
            q, keys, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dists = q_norm + k_norm[None, :] - 2.0 * cross
        col_base = t * tile_n
        col_ids = col_base + jax.lax.broadcasted_iota(jnp.int32, dists.shape, 1)

        tile_d, tile_i = _extract_topk(dists, col_ids, k)
        merged_d = jnp.concatenate([acc_d, tile_d], axis=1)
        merged_i = jnp.concatenate([acc_i, tile_i], axis=1)
        return _extract_topk(merged_d, merged_i, k)

    acc_d, acc_i = jax.lax.fori_loop(
        0, num_tiles, col_tile,
        (jnp.full((TM, _LANES), _BIG, jnp.float32),
         jnp.zeros((TM, _LANES), jnp.int32)))
    idx_ref[0] = acc_i


# keep the whole point set in VMEM only below this footprint (bytes);
# larger sets stream key tiles from HBM
_VMEM_X_BUDGET = 6 * 1024 * 1024


def knn_pallas(points, k, tile_m=256, tile_n=2048, interpret=False):
    """Pallas tiled top-k kNN: indices (B, N, k), self included.

    Pads N to a tile multiple with far-away ghost points so padded keys never
    enter any top-k; padded query rows are sliced off on return. Small point
    sets keep all keys in VMEM; large ones (the 10k-point stress config)
    stream key tiles from HBM with double-buffered DMA.
    """
    if k > _LANES:
        raise ValueError(f'knn_pallas::k={k} exceeds the lane-aligned '
                         f'accumulator capacity ({_LANES})')
    B, N, D = points.shape
    k = min(k, N)
    tile_m = min(tile_m, round_up(N, 8))
    tile_n = min(tile_n, round_up(N, 128))
    pad_n = round_up(N, math.lcm(tile_m, tile_n))
    pad_d = round_up(D, 128)  # lane-align features

    x = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, pad_n - N), (0, pad_d - D)))
    if pad_n > N:
        x = x.at[:, N:, 0].set(GHOST)  # ghost points: never selected

    grid = (B, pad_n // tile_m)
    stream_from_hbm = pad_n * pad_d * 4 > _VMEM_X_BUDGET and not interpret

    if stream_from_hbm:
        kernel = functools.partial(_knn_kernel_hbm, k=k, tile_n=tile_n,
                                   n_points=pad_n)
        # ANY memory space requires the trivial full-array block spec; the
        # kernel indexes the batch element itself via program_id(0)
        x_spec = pl.BlockSpec((B, pad_n, pad_d), lambda b, i: (0, 0, 0),
                              memory_space=pltpu.ANY)
        scratch = [pltpu.VMEM((2, tile_n, pad_d), jnp.float32),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        kernel = functools.partial(_knn_kernel, k=k, tile_n=tile_n,
                                   n_points=pad_n)
        x_spec = pl.BlockSpec((1, pad_n, pad_d), lambda b, i: (b, 0, 0),
                              memory_space=pltpu.VMEM)
        scratch = []

    idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((1, tile_m, pad_d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, _LANES), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, pad_n, _LANES), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, x)

    return idx[:, :N, :k]


def round_up(x, m):
    return -(-x // m) * m


def knn(points, k, use_pallas=None, **kwargs):
    """Dispatch: Pallas on TPU backends, XLA elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == 'tpu'
    if use_pallas:
        return knn_pallas(points, k, **kwargs)
    return knn_xla(points, k)
