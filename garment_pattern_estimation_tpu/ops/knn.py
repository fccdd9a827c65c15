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

# Split-product dots pin DEFAULT explicitly: the chunks are bf16-representable
# by construction, so DEFAULT's input rounding is lossless and every product
# exact anyway — and an ambient `jax.default_matmul_precision('highest')`
# (parity_check wraps its whole run in one) must not retarget kernel dots to
# an fp32 contraction, which Mosaic rejects on bf16 operands ("Bad lhs type").
SPLIT_EXACT = jax.lax.Precision.DEFAULT

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
            preferred_element_type=jnp.float32, precision=SPLIT_EXACT)
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
                       preferred_element_type=jnp.float32,
                       precision=SPLIT_EXACT)
        acc = p if acc is None else acc + p
    return acc


def gather_from_splits(hit, k_chunks):
    """One-hot rows (M, N) x truncation-split keys (N, D) -> selected key
    rows in f32: each output element is the f32 sum of the exactly-selected
    chunks (reconstruction error = the split residual only)."""
    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=SPLIT_EXACT)
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


def _extract_topk(dists, col_ids, k, slot_offset=0):
    """Smallest-k (values, ids) of each row of `dists` (TM, C), returned in
    lane-aligned (TM, 128) arrays at lanes [slot_offset : slot_offset+k]
    (other slots stay BIG/0). Ascending extraction with lowest-index
    tie-break (lax.top_k semantics).

    Two cross-lane reductions per slot (min value, min id among hits) —
    cross-lane reductions dominate the kernel's VPU time, so this form is
    ~1.5x cheaper than the argmin+min+select formulation."""
    TM = dists.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TM, _LANES), 1)
    out_d = jnp.full((TM, _LANES), _BIG, jnp.float32)
    out_i = jnp.zeros((TM, _LANES), jnp.int32)
    for slot in range(k):  # k is tiny (5): unrolled
        val = _tree_min(dists)                                     # (TM, 1)
        hit = dists == val
        idx = _tree_min(jnp.where(hit, col_ids, _INT_BIG))         # (TM, 1)
        slot_mask = lane == slot + slot_offset  # static per slot
        out_d = jnp.where(slot_mask, val, out_d)
        out_i = jnp.where(slot_mask, idx, out_i)
        dists = jnp.where(col_ids == idx, _BIG, dists)
    return out_d, out_i


# packed (distance | local column) layout for the direct kernel's in-tile
# extraction: 11 index bits support column tiles up to 2048 wide; distances
# keep their top 21 mantissa-exponent bits (the same quantization class as
# the fused kernels — PARITY.md deviation #5)
_PK_IDX_BITS = 11
_PK_IDX_MASK = (1 << _PK_IDX_BITS) - 1
_PK_TILE_N_MAX = 1 << _PK_IDX_BITS
_INT_MAX = jnp.iinfo(jnp.int32).max


def _tree_min(x):
    """Row-wise min of (TM, W) -> (TM, 1): halve the lane width with static
    aligned slices down to 128 lanes (elementwise mins, ~1 full pass of VPU
    work total), then one 128-wide cross-lane min. Much cheaper than a
    full-width cross-lane reduction, whose shuffle steps each touch the
    whole array."""
    W = x.shape[1]
    while W > _LANES and W % 256 == 0:  # keep slice widths lane-aligned
        W //= 2
        x = jnp.minimum(x[:, :W], x[:, W:2 * W])
    return jnp.min(x, axis=1, keepdims=True)


def tree_sum(x):
    """Row-wise sum of (TM, W) -> (TM, 1) via the same lane-halving tree as
    `_tree_min`. Used to gather one-hot-selected values on the VPU: with at
    most one nonzero per row, any association order is exact."""
    W = x.shape[1]
    while W > _LANES and W % 256 == 0:
        W //= 2
        x = x[:, :W] + x[:, W:2 * W]
    return jnp.sum(x, axis=1, keepdims=True)


def _extract_topk_packed(packed, k, col_base, slot_offset=0):
    """Smallest-k of each row of packed (dist_bits | local_col) int32 values
    (TM, TN) -> (quantized distance f32, global idx) in lane-aligned
    (TM, 128) arrays, written to lanes [slot_offset : slot_offset+k]. One
    cross-lane int min per slot (non-negative f32 distance bits are order
    -isomorphic to their int32 pattern; ties resolve to the lower column) —
    half the VPU passes of the unpacked two-reduction extraction, which
    dominates the kernel's time. Lanes below `slot_offset` keep the
    BIG/0 sentinels (callers fill them, e.g. with the self slot)."""
    TM = packed.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TM, _LANES), 1)
    out_d = jnp.full((TM, _LANES), _BIG, jnp.float32)
    out_i = jnp.zeros((TM, _LANES), jnp.int32)
    for slot in range(k):  # k is tiny (5): unrolled
        best = _tree_min(packed)                                   # (TM, 1)
        packed = jnp.where(packed == best, _INT_MAX, packed)
        d = pltpu.bitcast(best & ~_PK_IDX_MASK, jnp.float32)
        i = (best & _PK_IDX_MASK) + col_base
        slot_mask = lane == slot + slot_offset  # static per slot
        out_d = jnp.where(slot_mask, d, out_d)
        out_i = jnp.where(slot_mask, i, out_i)
    return out_d, out_i


def _knn_kernel_direct(xt_ref, q_ref, idx_ref, *, k, tile_n, n_points, d_live):
    """One grid step, small-D path (raw xyz clouds): distances are computed
    directly on the VPU as sum_d (q_d - k_d)^2 — exact f32, no matmul and no
    truncation splits. The matmul formulation would pad D=3 up to 128 MXU
    lanes (~42x wasted FLOPs) and then multiply that by the split partial
    products; the elementwise form is both exact and far cheaper.

    Keys ride transposed as (D_sub, N_pad): even a 10k-point cloud is only
    ~330 KB of VMEM, so this path never needs the HBM-streaming variant.
    Selection runs on packed (distance | column) values — top-21-bit
    distance quantization, ties to the lower index (PARITY.md dev. #5).

    Slot 0 is the query itself by construction (self-inclusive kNN at
    distance 0): the self column is masked out and only k-1 slots are
    extracted — a 1/k cut of the extraction passes that dominate the
    kernel. An exact duplicate lands in slot 1 instead of displacing the
    self slot (identical coordinates either way)."""
    num_tiles = n_points // tile_n
    q = q_ref[0]                                             # (TM, D_pad) f32
    TM = q.shape[0]
    row = pl.program_id(1) * TM + \
        jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)      # global query ids

    def tile_topk(t):
        col_base = t * tile_n
        keys_tile = xt_ref[0, :, pl.ds(col_base, tile_n)]    # (D_sub, TN)
        acc = None
        for d in range(d_live):                              # D is tiny: unrolled
            diff = q[:, d][:, None] - keys_tile[d][None, :]  # (TM, TN)
            sq = diff * diff
            acc = sq if acc is None else acc + sq
        col = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
        packed = (pltpu.bitcast(acc, jnp.int32) & ~_PK_IDX_MASK) | col
        packed = jnp.where(col_base + col == row, _INT_MAX, packed)  # self
        return _extract_topk_packed(packed, k - 1, col_base, slot_offset=1)

    def col_tile(t, carry):
        acc_d, acc_i = carry
        tile_d, tile_i = tile_topk(t)
        # merge on the quantized distances; running top-k first -> earlier
        # (lower-index) entries win ties
        merged_d = jnp.concatenate([acc_d, tile_d], axis=1)
        merged_i = jnp.concatenate([acc_i, tile_i], axis=1)
        return _extract_topk(merged_d, merged_i, k - 1, slot_offset=1)

    if num_tiles == 1 or k == 1:
        acc_i = tile_topk(0)[1] if k > 1 else \
            jnp.zeros((TM, _LANES), jnp.int32)  # no merge pass needed
    else:
        _, acc_i = jax.lax.fori_loop(
            0, num_tiles, col_tile,
            (jnp.full((TM, _LANES), _BIG, jnp.float32),
             jnp.zeros((TM, _LANES), jnp.int32)))
    lane = jax.lax.broadcasted_iota(jnp.int32, (TM, _LANES), 1)
    idx_ref[0] = jnp.where(lane == 0, row, acc_i)


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
    row = pl.program_id(1) * TM + \
        jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)      # global query ids

    def tile_topk(t):
        col_base = t * tile_n
        keys = x_ref[0, pl.ds(col_base, tile_n), :]          # (TN, D)
        k_norm = jnp.sum(keys * keys, axis=-1)               # (TN,)
        cross = cross_from_splits(q_chunks, split_bf16(keys, pltpu.bitcast, terms=3))
        dists = q_norm + k_norm[None, :] - 2.0 * cross
        col_ids = col_base + jax.lax.broadcasted_iota(jnp.int32, dists.shape, 1)
        dists = jnp.where(col_ids == row, _BIG, dists)       # self -> slot 0
        return _extract_topk(dists, col_ids, k - 1, slot_offset=1)

    def col_tile(t, carry):
        acc_d, acc_i = carry
        tile_d, tile_i = tile_topk(t)
        # merge: running top-k first -> earlier (lower-index) entries win
        # ties, matching lax.top_k
        merged_d = jnp.concatenate([acc_d, tile_d], axis=1)  # (TM, 256) aligned
        merged_i = jnp.concatenate([acc_i, tile_i], axis=1)
        return _extract_topk(merged_d, merged_i, k - 1, slot_offset=1)

    if num_tiles == 1 or k == 1:
        acc_i = tile_topk(0)[1] if k > 1 else \
            jnp.zeros((TM, _LANES), jnp.int32)  # no merge pass needed
    else:
        _, acc_i = jax.lax.fori_loop(
            0, num_tiles, col_tile,
            (jnp.full((TM, _LANES), _BIG, jnp.float32),
             jnp.zeros((TM, _LANES), jnp.int32)))
    lane = jax.lax.broadcasted_iota(jnp.int32, (TM, _LANES), 1)
    idx_ref[0] = jnp.where(lane == 0, row, acc_i)


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
    row = pl.program_id(1) * TM + \
        jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)      # global query ids

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
        dists = jnp.where(col_ids == row, _BIG, dists)       # self -> slot 0

        tile_d, tile_i = _extract_topk(dists, col_ids, k - 1, slot_offset=1)
        merged_d = jnp.concatenate([acc_d, tile_d], axis=1)
        merged_i = jnp.concatenate([acc_i, tile_i], axis=1)
        return _extract_topk(merged_d, merged_i, k - 1, slot_offset=1)

    acc_i = jnp.zeros((TM, _LANES), jnp.int32)
    if k > 1:
        _, acc_i = jax.lax.fori_loop(
            0, num_tiles, col_tile,
            (jnp.full((TM, _LANES), _BIG, jnp.float32), acc_i))
    lane = jax.lax.broadcasted_iota(jnp.int32, (TM, _LANES), 1)
    idx_ref[0] = jnp.where(lane == 0, row, acc_i)


# keep the whole point set in VMEM only below this footprint (bytes);
# larger sets stream key tiles from HBM
_VMEM_X_BUDGET = 6 * 1024 * 1024

# feature dims at or below this use the direct VPU distance kernel (exact
# f32, no MXU); above it, distances come from the MXU via truncation splits
_DIRECT_D_MAX = 16


def knn_pallas(points, k, tile_m=None, tile_n=None, interpret=False):
    """Pallas tiled top-k kNN: indices (B, N, k), self included.

    Pads N to a tile multiple with far-away ghost points so padded keys never
    enter any top-k; padded query rows are sliced off on return. Small point
    sets keep all keys in VMEM; large ones (the 10k-point stress config)
    stream key tiles from HBM with double-buffered DMA — except the small-D
    direct path, whose transposed keys always fit VMEM.
    """
    if k > _LANES:
        raise ValueError(f'knn_pallas::k={k} exceeds the lane-aligned '
                         f'accumulator capacity ({_LANES})')
    B, N, D = points.shape
    k = min(k, N)
    if D <= _DIRECT_D_MAX:
        # direct path defaults (swept on-chip at 128x10k): the widest packed
        # column tile and a 256-row query tile
        if tile_n is None:
            tile_n = _PK_TILE_N_MAX
        if tile_m is None:
            tile_m = 256 if min(tile_n, round_up(N, 128)) % 256 == 0 else 128
        tile_n = min(tile_n, _PK_TILE_N_MAX)  # packed local ids carry 11 bits
    else:
        tile_m = 128 if tile_m is None else tile_m
        tile_n = 1024 if tile_n is None else tile_n
    tile_m = min(tile_m, round_up(N, 8))
    if tile_m & (tile_m - 1):
        # keep tile_m a power of two: pad_n = lcm(tile_m, tile_n) with a
        # coprime clamp (e.g. N=100 -> tile_m=104, lcm(104,128)=1664) would
        # pad a 100-point cloud ~13x and multiply the kernel grid with it
        tile_m = 1 << (tile_m.bit_length() - 1)
    tile_n = min(tile_n, round_up(N, 128))
    pad_n = round_up(N, math.lcm(tile_m, tile_n))
    pad_d = round_up(D, 128)  # lane-align features

    x = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, pad_n - N), (0, pad_d - D)))
    if pad_n > N:
        x = x.at[:, N:, 0].set(GHOST)  # ghost points: never selected

    grid = (B, pad_n // tile_m)

    if D <= _DIRECT_D_MAX:
        # small-D (xyz) path: exact f32 VPU distances on transposed keys —
        # the (D_sub, N_pad) key block is tiny, so it never streams
        d_sub = round_up(D, 8)
        x_t = jnp.swapaxes(x[:, :, :d_sub], 1, 2)  # (B, d_sub, pad_n)
        idx = pl.pallas_call(
            functools.partial(_knn_kernel_direct, k=k, tile_n=tile_n,
                              n_points=pad_n, d_live=D),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, d_sub, pad_n), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_m, pad_d), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_m, _LANES), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, pad_n, _LANES), jnp.int32),
            interpret=interpret,
        )(x_t, x)
        return idx[:, :N, :k]

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
