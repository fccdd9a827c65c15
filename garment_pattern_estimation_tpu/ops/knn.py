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

# Selection-critical dots must not run at DEFAULT precision: TPU f32 matmuls
# round the *inputs* to bf16 (measured: abs error ~0.4% of the operand norms,
# both in XLA and Mosaic), which misranks near neighbors — the reference's
# kNN (torch-cluster) is exact f32.
#
# At the XLA level the fix is Precision.HIGHEST (full-f32 multi-pass on the
# MXU). Inside Pallas kernels HIGHEST's decomposition scratch blows the
# 16 MB scoped-VMEM budget next to VMEM-resident key blocks, so kernels use
# an explicit truncation split instead (`split_bf16` + `cross_from_splits`).
#
# The split stays in f32 *dtype* but truncates each chunk to the top 8
# significant mantissa bits — exactly bf16-representable, so every backend's
# internal bf16 input-rounding of a DEFAULT dot passes the chunks through
# losslessly. That makes kernels, jnp oracles, interpret mode and real
# Mosaic agree on the products bitwise (real bf16 *casts* cannot be used:
# Pallas interpret mode elides them while its dots still round operands).
EXACT = jax.lax.Precision.HIGHEST

# sign + exponent + top 7 fraction bits (plain int: jnp constants would be
# captured as kernel consts)
_TRUNC_MASK = ~0xFFFF


def split_bf16(x, bitcast=jax.lax.bitcast_convert_type, terms=2):
    """f32 -> `terms` f32 chunks, each with <=8 significant mantissa bits
    (sum ~= x with relative residual ~2^(-7*terms)). Inside Pallas kernels
    pass `bitcast=pltpu.bitcast`."""
    chunks, r = [], x
    for _ in range(terms):
        c = bitcast(bitcast(r, jnp.int32) & _TRUNC_MASK, jnp.float32)
        chunks.append(c)
        r = r - c  # exact: c is r truncated (Sterbenz)
    return chunks


# partial products kept per split order: pairs whose magnitude exceeds the
# split residual (2-term: lo*lo is at the ~2^-14 residual floor, dropped;
# 3-term: i + j <= 2)
_CROSS_PAIRS = {2: ((0, 0), (0, 1), (1, 0)),
                3: ((0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (2, 0))}


def cross_from_splits(q_chunks, k_chunks):
    """q @ keys^T in f32 from truncation-split operands (both (rows, D);
    contraction over the last dim). Every partial product is exact on the
    MXU (bf16 x bf16 into f32); only the split residuals are lost."""
    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = None
    for i, j in _CROSS_PAIRS[len(q_chunks)]:
        p = dot(q_chunks[i], k_chunks[j])
        acc = p if acc is None else acc + p
    return acc


def batched_cross_from_splits(q_chunks, k_chunks=None):
    """(B, M, C) x (B, N, C) -> (B, M, N) cross products from truncation
    splits — the jnp-oracle mirror of `cross_from_splits` (same partial
    products, so quantized selections agree with the kernels)."""
    if k_chunks is None:
        k_chunks = q_chunks
    acc = None
    for i, j in _CROSS_PAIRS[len(q_chunks)]:
        p = jnp.einsum('bmc,bnc->bmn', q_chunks[i], k_chunks[j],
                       preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    return acc


def gather_from_splits(hit, k_chunks):
    """One-hot rows (M, N) x truncation-split keys (N, D) -> selected key
    rows in f32: each output element is the f32 sum of the exactly-selected
    chunks (reconstruction error = the split residual only)."""
    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = None
    for c in k_chunks:
        p = dot(hit, c)
        acc = p if acc is None else acc + p
    return acc


def pairwise_sq_dists(queries, keys):
    """(..., M, D) x (..., N, D) -> (..., M, N) squared euclidean distances.

    Formulated as norms + a matmul so XLA tiles it onto the MXU; the matmul
    runs at full f32 (distances feed discrete neighbor selection).
    """
    q_norm = jnp.sum(queries * queries, axis=-1, keepdims=True)
    k_norm = jnp.sum(keys * keys, axis=-1, keepdims=True)
    cross = jnp.einsum('...md,...nd->...mn', queries, keys,
                       preferred_element_type=jnp.float32, precision=EXACT)
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
    q_chunks = split_bf16(q, pltpu.bitcast, terms=3)
    TM = q.shape[0]

    def tile_topk(t):
        col_base = t * tile_n
        keys = x_ref[0, pl.ds(col_base, tile_n), :]          # (TN, D)
        k_norm = jnp.sum(keys * keys, axis=-1)               # (TN,)
        cross = cross_from_splits(q_chunks, split_bf16(keys, pltpu.bitcast, terms=3))
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
    q_chunks = split_bf16(q, pltpu.bitcast, terms=3)
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
        cross = cross_from_splits(q_chunks, split_bf16(keys, pltpu.bitcast, terms=3))
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


def knn_pallas(points, k, tile_m=128, tile_n=1024, interpret=False):
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
