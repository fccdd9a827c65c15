"""Fused dynamic-EdgeConv TPU kernel: kNN + neighbor gather + edge MLP + max.

The reference's DynamicEdgeConv (torch-geometric, nn/net_blocks.py:124-135)
is three HBM-bound stages: a CUDA kNN, a (B, N, k, C) neighbor gather, and an
edge MLP + max aggregation. A direct XLA translation pays for the gather
twice — hundreds of MB of HBM for the (B, N, k, C) intermediate plus random
-access reads. This kernel fuses the whole layer per (batch, query-tile)
grid step in VMEM:

  1. squared distances for a TM-row query tile against all keys via bf16
     truncation-split chunks of the keys (ops/knn.py::split_bf16 — TPU
     DEFAULT f32 dots round their inputs to bf16 and misrank near
     neighbors; the split products are exact on the MXU, leaving only the
     ~2^-14 split residual) plus exact f32 norms precomputed in XLA;
  2. top-k extraction on packed ``(distance_bits | column)`` int32 values —
     one cross-lane min per neighbor slot (ascending distance, ties to the
     lower index; distance quantized to its top 21 mantissa-exponent bits);
  3. per-slot neighbor gather as one-hot matmuls against the key chunks
     (MXU) — the (B, N, k, C) intermediate never exists. Slot 0 is the
     query itself (self-inclusive kNN): no gather at all;
  4. the edge MLP on [x_i ; x_j - x_i] with eval-mode BatchNorm folded into
     the weights (Dense -> ReLU -> BN ordering, nn/net_blocks.py:43-47):
     truncation-cast activations x bf16 weights with f32 accumulation —
     the same precision class as the unfused path's DEFAULT dots, at half
     the VMEM traffic;
  5. running max over the k neighbor slots.

Inference/eval only: training needs batch BN statistics over all edges and
gradients, which stay on the unfused XLA path (models/blocks.py::EdgeConv).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .knn import (GHOST as _GHOST, round_up as _round_up,
                  split_bf16 as _split_bf16,
                  cross_from_splits as _cross_from_splits,
                  gather_from_splits as _gather_from_splits,
                  batched_cross_from_splits as _oracle_cross,
                  tree_sum as _tree_sum, _tree_min,
                  _extract_topk, _extract_topk_packed, SPLIT_EXACT)

_IDX_BITS = 11                    # packed column ids are tile-local: <= 2048
_IDX_MASK = (1 << _IDX_BITS) - 1
_INT_MAX = jnp.iinfo(jnp.int32).max
_MAX_N_PAD = 1 << _IDX_BITS       # single-tile bound (VMEM ~8 MB/step)
_MAX_FUSED_N = 1 << 14            # column-tiled kernels extend fusion to 16k
_LANES = 128

# feature dims at or below this skip the MXU entirely: distances accumulate
# per-dim on the VPU (exact f32) and gathers are per-dim one-hot tree-sums
# (exact) — the first EdgeConv layer runs on raw xyz (C=3), where a matmul
# formulation pads 3 -> 128 lanes and then multiplies that by split partial
# products
_DIRECT_C_MAX = 16


def fold_mlp_bn(mlp_params, mlp_stats, eps=1e-5):
    """Fold eval-mode BatchNorm affines of a Dense->ReLU->BN stack into the
    *next* layer's weights.

    With z_l = h @ W_l + b_l and BN(relu(z_l)) = relu(z_l) * a_l + d_l
    (a = scale/sqrt(var+eps), d = bias - mean*a), the BN of layer l folds as
    W'_{l+1} = a_l[:, None] * W_{l+1}, b'_{l+1} = b_{l+1} + d_l @ W_{l+1}.
    Returns ([(W, b)] per layer, (a, d) of the final layer)."""
    n_layers = sum(1 for name in mlp_params if name.startswith('Dense_'))
    layers = []
    a_prev = d_prev = None
    a = d = None
    for i in range(n_layers):
        W = jnp.asarray(mlp_params[f'Dense_{i}']['kernel'], jnp.float32)
        b = jnp.asarray(mlp_params[f'Dense_{i}']['bias'], jnp.float32)
        if a_prev is not None:
            b = b + d_prev @ W
            W = a_prev[:, None] * W
        layers.append((W, b))
        bn = mlp_params[f'BatchNorm_{i}']
        st = mlp_stats[f'BatchNorm_{i}']
        a = jnp.asarray(bn['scale'], jnp.float32) \
            * jax.lax.rsqrt(jnp.asarray(st['var'], jnp.float32) + eps)
        d = jnp.asarray(bn['bias'], jnp.float32) \
            - jnp.asarray(st['mean'], jnp.float32) * a
        a_prev, d_prev = a, d
    return layers, (a, d)


def fused_edgeconv_supported(n_points, n_channels):
    """Single-tile kernels cover the published configs (N=2000, C<=150);
    column-tiled/streaming variants extend the fused path to the 16k-point
    bound (the 10k-point stress config included)."""
    return _round_up(n_points, 128) <= _MAX_FUSED_N and n_channels <= 256


def _pad_edge_mlp(layers, affine, c, c_pad):
    """Zero-pad folded weights to lane-aligned shapes. The first layer's
    input is the concatenated edge feature [x_i ; x_j - x_i]: its weight rows
    are placed at [0:c] and [c_pad:c_pad+c] of a (2*c_pad, H) matrix so the
    kernel can concatenate padded tiles directly."""
    (w0, b0), rest = layers[0], layers[1:]
    h0 = _round_up(w0.shape[1], 128)
    w0_pad = jnp.zeros((2 * c_pad, h0), jnp.float32)
    w0_pad = w0_pad.at[:c, :w0.shape[1]].set(w0[:c])
    w0_pad = w0_pad.at[c_pad:c_pad + c, :w0.shape[1]].set(w0[c:])
    padded = [(w0_pad, _pad_vec(b0, h0))]
    for w, b in rest:
        in_pad = _round_up(w.shape[0], 128)
        out_pad = _round_up(w.shape[1], 128)
        w_pad = jnp.zeros((in_pad, out_pad), jnp.float32)
        w_pad = w_pad.at[:w.shape[0], :w.shape[1]].set(w)
        padded.append((w_pad, _pad_vec(b, out_pad)))
    a, dd = affine
    out_pad = padded[-1][0].shape[1]
    return padded, (_pad_vec(a, out_pad), _pad_vec(dd, out_pad))


def _pad_vec(v, size):
    return jnp.zeros((1, size), jnp.float32).at[0, :v.shape[0]].set(v)


def _fused_kernel(*refs, k, n_layers, mlp_dtype, d_live=None):
    """One grid step: EdgeConv output for TM query rows of one batch elem.

    Wide features (d_live=None): distances and gathers run on bf16 hi/lo
    truncation splits of the keys (ops/knn.py::split_bf16, pre-split and
    pre-cast on the XLA side): TPU DEFAULT f32 dots round their inputs to
    bf16, which misranks near neighbors and pre-rounds gathered values
    (edge features x_j - x_i then cancel catastrophically). Split products
    are exact on the MXU with f32 accumulation; key norms arrive
    precomputed at exact f32.

    Small features (d_live set — the raw-xyz first layer): distances
    accumulate per-dim on the VPU and gathers are per-dim one-hot
    tree-sums against keys transposed to (D_sub, N_pad) — both exact f32,
    no MXU involved."""
    if d_live is not None:
        kt_ref, q_ref = refs[:2]
        refs = refs[2:]
    else:
        khi_ref, klo_ref, knorm_ref, q_ref = refs[:4]
        refs = refs[4:]
    layer_refs = refs[:2 * n_layers]
    a_ref, d_ref, o_ref = refs[-3], refs[-2], refs[-1]

    q = q_ref[0]                                             # (TM, C_pad) f32
    TM, c_pad = q.shape

    if d_live is not None:
        # -- distances: exact f32, elementwise on the VPU --
        dists = None
        for dim in range(d_live):                            # D is tiny: unrolled
            diff = q[:, dim][:, None] - kt_ref[0, dim, :][None, :]
            sq = diff * diff
            dists = sq if dists is None else dists + sq
    else:
        k_chunks = [khi_ref[0], klo_ref[0]]                  # (N_pad, C_pad) bf16
        # -- distances: ~2^-14 operand accuracy (documented in PARITY.md) --
        q_norm = jnp.sum(q * q, axis=-1, keepdims=True)
        k_norm = knorm_ref[0]                                # (1, N_pad) f32
        q_chunks = [c.astype(jnp.bfloat16)
                    for c in _split_bf16(q, pltpu.bitcast)]  # lossless casts
        cross = _cross_from_splits(q_chunks, k_chunks)
        dists = jnp.maximum(q_norm + k_norm - 2.0 * cross, 0.0)

    # -- pack (distance | column index): non-negative f32 bits are monotone,
    # so one int min per slot yields the nearest remaining neighbor with
    # ties broken towards the lower column. The self column is masked out:
    # slot 0 is the query itself by construction (self-inclusive kNN at
    # distance 0), so only k-1 extraction rounds run; an exact duplicate
    # lands in slot 1 instead of displacing the self slot (identical
    # coordinates either way) --
    col = jax.lax.broadcasted_iota(jnp.int32, dists.shape, 1)
    bits = pltpu.bitcast(dists, jnp.int32)
    packed = (bits & ~_IDX_MASK) | col
    row = pl.program_id(1) * TM + \
        jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)       # global query ids
    packed = jnp.where(col == row, _INT_MAX, packed)

    # the f32 path gathers hi+lo chunks (residual 2^-14, below the edge
    # MLP's own bf16 input rounding); the bf16 path gathers the top chunk
    # only — deliberately bf16-precision values
    n_chunks = 1 if jnp.dtype(mlp_dtype) != jnp.float32 else 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (TM, c_pad), 1)
    out = None
    for _slot in range(k):                                    # k is tiny: unrolled
        if _slot > 0:
            nearest = _tree_min(packed)                       # (TM, 1)
            hit = packed == nearest                           # one-hot (TM, N_pad)
            packed = jnp.where(hit, _INT_MAX, packed)

        if _slot == 0:
            nbr = q                                           # self slot: no work
        elif d_live is not None:
            # exact per-dim gather: one nonzero per row -> tree-sum is exact
            nbr = jnp.zeros((TM, c_pad), jnp.float32)
            for dim in range(d_live):
                v = _tree_sum(jnp.where(hit, kt_ref[0, dim, :][None, :], 0.0))
                nbr = jnp.where(lane == dim, v, nbr)
        else:
            nbr = _gather_from_splits(hit.astype(jnp.bfloat16),
                                      k_chunks[:n_chunks])
        h = jnp.concatenate([q, nbr - q], axis=1)             # f32 (TM, 2*C_pad)

        for layer in range(n_layers):
            w_ref, b_ref = layer_refs[2 * layer], layer_refs[2 * layer + 1]
            # truncation-cast (never elided: bit ops) -> the bf16 operand
            # cast is lossless on every backend; same precision class as
            # the unfused path's internal DEFAULT-dot rounding
            h_bf = _split_bf16(h, pltpu.bitcast, terms=1)[0].astype(jnp.bfloat16)
            z = jax.lax.dot_general(
                h_bf, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=SPLIT_EXACT) + b_ref[:]
            h = jnp.maximum(z, 0.0)
        o = h * a_ref[:] + d_ref[:]                           # f32 (TM, H_out)
        out = o if out is None else jnp.maximum(out, o)
    o_ref[0] = out


def _mlp_max_tail(q, nbrs, layer_refs, a_ref, d_ref, n_layers):
    """Shared MLP + max-aggregation tail of the tiled kernels: edge MLP on
    [q ; nbr - q] per neighbor slot (truncation-bf16 activations x bf16
    weights, f32 accumulation — see _fused_kernel), running max over
    slots."""
    out = None
    for nbr in nbrs:
        h = jnp.concatenate([q, nbr - q], axis=1)
        for layer in range(n_layers):
            w_ref, b_ref = layer_refs[2 * layer], layer_refs[2 * layer + 1]
            h_bf = _split_bf16(h, pltpu.bitcast, terms=1)[0].astype(jnp.bfloat16)
            z = jax.lax.dot_general(
                h_bf, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=SPLIT_EXACT) + b_ref[:]
            h = jnp.maximum(z, 0.0)
        o = h * a_ref[:] + d_ref[:]
        out = o if out is None else jnp.maximum(out, o)
    return out


def _fused_kernel_direct_tiled(kt_ref, q_ref, *refs, k, n_layers, tile_n,
                               n_points, d_live):
    """Column-tiled small-C fused EdgeConv for point sets past the single
    -tile bound (the 10k-point stress config): the transposed key block
    (D_sub, N_pad) is tiny so it stays fully VMEM-resident, but distance
    and selection intermediates are bounded by (TM, tile_n). Selection is
    the standalone direct kNN's tiled merge (ops/knn.py) — per-tile packed
    extraction with local column ids, quantized-domain merges, global int32
    ids — followed by exact per-dim tree-sum gathers accumulated over the
    same column tiles. Globally equivalent to the single-tile kernel's
    selection (top-(k-1) by quantized distance then index)."""
    layer_refs = refs[:2 * n_layers]
    a_ref, d_ref, o_ref = refs[-3], refs[-2], refs[-1]
    q = q_ref[0]                                              # (TM, C_pad) f32
    TM, c_pad = q.shape
    num_tiles = n_points // tile_n
    row = pl.program_id(1) * TM + \
        jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)       # global query ids

    def tile_packed(t):
        col_base = t * tile_n
        keys_tile = kt_ref[0, :, pl.ds(col_base, tile_n)]     # (D_sub, TN)
        dists = None
        for dim in range(d_live):
            diff = q[:, dim][:, None] - keys_tile[dim][None, :]
            sq = diff * diff
            dists = sq if dists is None else dists + sq
        col = jax.lax.broadcasted_iota(jnp.int32, dists.shape, 1)
        packed = (pltpu.bitcast(dists, jnp.int32) & ~_IDX_MASK) | col
        packed = jnp.where(col_base + col == row, _INT_MAX, packed)  # self
        return _extract_topk_packed(packed, k - 1, col_base, slot_offset=1)

    def col_tile(t, carry):
        acc_d, acc_i = carry
        tile_d, tile_i = tile_packed(t)
        merged_d = jnp.concatenate([acc_d, tile_d], axis=1)
        merged_i = jnp.concatenate([acc_i, tile_i], axis=1)
        return _extract_topk(merged_d, merged_i, k - 1, slot_offset=1)

    if num_tiles == 1 or k == 1:
        acc_i = tile_packed(0)[1] if k > 1 else None
    else:
        _, acc_i = jax.lax.fori_loop(
            0, num_tiles, col_tile,
            (jnp.full((TM, _LANES), 1e30, jnp.float32),
             jnp.zeros((TM, _LANES), jnp.int32)))

    # exact per-dim gathers, accumulated over the resident key tiles
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (TM, c_pad), 1)
    nbrs = [q]                                                # slot 0: self
    for slot in range(1, k):
        idx_s = acc_i[:, slot][:, None]                       # (TM, 1)
        nbr = jnp.zeros((TM, c_pad), jnp.float32)
        for dim in range(d_live):
            v = None
            for t in range(num_tiles):
                col_base = t * tile_n
                keys_row = kt_ref[0, dim, pl.ds(col_base, tile_n)][None, :]
                col = col_base + jax.lax.broadcasted_iota(
                    jnp.int32, (TM, tile_n), 1)
                contrib = _tree_sum(jnp.where(col == idx_s, keys_row, 0.0))
                v = contrib if v is None else v + contrib     # exact: disjoint
            nbr = jnp.where(lane_c == dim, v, nbr)
        nbrs.append(nbr)
    o_ref[0] = _mlp_max_tail(q, nbrs, layer_refs, a_ref, d_ref, n_layers)


def _fused_kernel_stream(x_src, knorm_ref, q_ref, *refs, k, n_layers,
                         mlp_dtype, tile_n, n_points, stream):
    """Column-tiled wide-C fused EdgeConv for point sets past the VMEM
    -resident bound: f32 key tiles are double-buffered from HBM (`stream`;
    interpret mode keeps them VMEM-resident and slices — async DMA is a
    Mosaic-only facility); each tile contributes its k-1 best candidates
    *with their gathered feature rows*, and the quantized-domain merge
    re-selects the surviving values by global-index match (candidate ids
    are unique across tiles, so exactly one candidate matches each
    winner). The (B, N, k, C) gather intermediate that OOMs the unfused
    path at 128x10k never exists."""
    if stream:
        keys_buf, sems = refs[-2], refs[-1]
        refs = refs[:-2]
    layer_refs = refs[:2 * n_layers]
    a_ref, d_ref, o_ref = refs[-3], refs[-2], refs[-1]

    b = pl.program_id(0)
    q = q_ref[0]                                              # (TM, C_pad) f32
    TM, c_pad = q.shape
    km1 = k - 1
    if km1 == 0:  # degenerate: the self slot is the whole neighborhood
        o_ref[0] = _mlp_max_tail(q, [q], layer_refs, a_ref, d_ref, n_layers)
        return
    num_tiles = n_points // tile_n
    q_norm = jnp.sum(q * q, axis=-1, keepdims=True)
    q_chunks = [c.astype(jnp.bfloat16) for c in _split_bf16(q, pltpu.bitcast)]
    row = pl.program_id(1) * TM + \
        jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)       # global query ids
    lane = jax.lax.broadcasted_iota(jnp.int32, (TM, _LANES), 1)
    n_chunks = 1 if jnp.dtype(mlp_dtype) != jnp.float32 else 2

    if stream:
        def tile_dma(slot, t):
            return pltpu.make_async_copy(
                x_src.at[b, pl.ds(t * tile_n, tile_n), :],
                keys_buf.at[slot], sems.at[slot])

        tile_dma(0, 0).start()

    def col_tile(t, carry):
        acc_d, acc_i, acc_v = carry
        if stream:
            buf = t % 2

            @pl.when(t + 1 < num_tiles)
            def _():
                tile_dma((t + 1) % 2, t + 1).start()

            tile_dma(buf, t).wait()
            keys = keys_buf[buf]                              # (TN, c_pad) f32
        else:
            keys = x_src[0, pl.ds(t * tile_n, tile_n), :]
        k_chunks = [c.astype(jnp.bfloat16)
                    for c in _split_bf16(keys, pltpu.bitcast)]
        col_base = t * tile_n
        k_norm = knorm_ref[0, :, pl.ds(col_base, tile_n)]     # (1, TN)
        cross = _cross_from_splits(q_chunks, k_chunks)
        dists = jnp.maximum(q_norm + k_norm - 2.0 * cross, 0.0)
        col = jax.lax.broadcasted_iota(jnp.int32, dists.shape, 1)
        packed = (pltpu.bitcast(dists, jnp.int32) & ~_IDX_MASK) | col
        packed = jnp.where(col_base + col == row, _INT_MAX, packed)  # self

        # k-1 candidates of this tile, gathered while the tile is resident
        tile_d = jnp.full((TM, _LANES), 1e30, jnp.float32)
        tile_i = jnp.zeros((TM, _LANES), jnp.int32)
        tile_v = []
        for s in range(km1):
            best = _tree_min(packed)                          # (TM, 1)
            hit = packed == best
            packed = jnp.where(hit, _INT_MAX, packed)
            tile_v.append(_gather_from_splits(hit.astype(jnp.bfloat16),
                                              k_chunks[:n_chunks]))
            dq = pltpu.bitcast(best & ~_IDX_MASK, jnp.float32)
            gi = (best & _IDX_MASK) + col_base
            slot_mask = lane == s + 1
            tile_d = jnp.where(slot_mask, dq, tile_d)
            tile_i = jnp.where(slot_mask, gi, tile_i)

        new_d, new_i = _extract_topk(
            jnp.concatenate([acc_d, tile_d], axis=1),
            jnp.concatenate([acc_i, tile_i], axis=1), km1, slot_offset=1)
        # value re-selection: winner ids are unique across the 2*(k-1)
        # candidates (disjoint column ranges), so exactly one matches;
        # initial acc entries carry id 0 with zero values — harmless
        cands = [(acc_i[:, s + 1][:, None], acc_v[s]) for s in range(km1)] + \
                [(tile_i[:, s + 1][:, None], tile_v[s]) for s in range(km1)]
        new_v = []
        for s in range(km1):
            tgt = new_i[:, s + 1][:, None]
            v = None
            for ci, cv in cands:
                contrib = jnp.where(ci == tgt, cv, 0.0)
                v = contrib if v is None else v + contrib
            new_v.append(v)
        return new_d, new_i, jnp.stack(new_v)

    _, _, acc_v = jax.lax.fori_loop(
        0, num_tiles, col_tile,
        (jnp.full((TM, _LANES), 1e30, jnp.float32),
         jnp.zeros((TM, _LANES), jnp.int32),
         jnp.zeros((km1, TM, c_pad), jnp.float32)))

    nbrs = [q] + [acc_v[s] for s in range(km1)]               # slot 0: self
    o_ref[0] = _mlp_max_tail(q, nbrs, layer_refs, a_ref, d_ref, n_layers)


def fused_edgeconv(x, folded, k, *, mlp_dtype=jnp.float32, interpret=False,
                   tile_n=None):
    """x (B, N, C), folded edge-MLP weights -> EdgeConv features (B, N, out).

    `folded` is the output of `fold_mlp_bn` on the layer's Dense/BN params.
    Neighbor selection matches `ops.knn` semantics (self included, squared
    euclidean, ties to the lower index) up to the packed-distance
    quantization (top 21 of 23 mantissa bits). `tile_n` overrides the
    column-tile width (tests force small tiles to exercise the tiled
    kernels on small clouds)."""
    layers, affine = folded
    B, N, C = x.shape
    k = min(k, N)
    c_pad = _round_up(C, 128)
    n_pad = _round_up(N, 128)
    if n_pad > _MAX_FUSED_N:
        raise ValueError(f'fused_edgeconv::N={N} exceeds the fused bound '
                         f'({_MAX_FUSED_N}); use the streaming kNN path')
    tile_n = min(tile_n or _MAX_N_PAD, _MAX_N_PAD, n_pad)  # local ids: 11 bits
    single_tile = n_pad <= tile_n

    d_live = C if C <= _DIRECT_C_MAX else None
    if not single_tile and d_live is None:
        tile_m = 128  # streaming kernel: (TM, TN) + value carries fit VMEM
    else:
        tile_m = 256 if n_pad % 256 == 0 else 128
    if not single_tile:
        n_pad = _round_up(N, math.lcm(tile_m, tile_n))

    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, n_pad - N), (0, c_pad - C)))
    if n_pad > N:
        xp = xp.at[:, N:, 0].set(_GHOST)

    padded_layers, (a, d) = _pad_edge_mlp(layers, affine, C, c_pad)
    h_out = a.shape[1]
    n_layers = len(padded_layers)

    weight_inputs, weight_specs = [], []
    for w, b in padded_layers:
        weight_inputs += [w.astype(jnp.bfloat16), b]
        weight_specs += [
            pl.BlockSpec(w.shape, lambda bb, ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda bb, ii: (0, 0), memory_space=pltpu.VMEM),
        ]

    q_spec = pl.BlockSpec((1, tile_m, c_pad), lambda bb, ii: (bb, ii, 0),
                          memory_space=pltpu.VMEM)
    scratch = []
    if d_live is not None:
        # small-C path: keys transposed to (D_sub, N_pad) — exact f32 VPU
        # distances + gathers in the kernel, no splits and no norms; the
        # transposed block is tiny, so it stays VMEM-resident at any
        # supported N (column-tiled kernel past the single-tile bound)
        d_sub = _round_up(C, 8)
        keys_t = jnp.swapaxes(xp[:, :, :d_sub], 1, 2)  # (B, d_sub, n_pad)
        x_inputs = (keys_t, xp)
        x_specs = [
            pl.BlockSpec((1, d_sub, n_pad), lambda bb, ii: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            q_spec]
        if single_tile:
            kernel = functools.partial(_fused_kernel, k=k, n_layers=n_layers,
                                       mlp_dtype=mlp_dtype, d_live=d_live)
        else:
            kernel = functools.partial(
                _fused_kernel_direct_tiled, k=k, n_layers=n_layers,
                tile_n=tile_n, n_points=n_pad, d_live=d_live)
    elif single_tile:
        # keys pre-split into bf16 truncation chunks + exact f32 norms
        k_hi, k_lo = (c.astype(jnp.bfloat16) for c in _split_bf16(xp))
        k_norm = jnp.sum(xp * xp, axis=-1, keepdims=True)  # (B, n_pad, 1)
        k_norm = jnp.swapaxes(k_norm, 1, 2)                # (B, 1, n_pad)
        keys_spec = pl.BlockSpec((1, n_pad, c_pad), lambda bb, ii: (bb, 0, 0),
                                 memory_space=pltpu.VMEM)
        x_inputs = (k_hi, k_lo, k_norm, xp)
        x_specs = [
            keys_spec, keys_spec,
            pl.BlockSpec((1, 1, n_pad), lambda bb, ii: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            q_spec]
        kernel = functools.partial(_fused_kernel, k=k, n_layers=n_layers,
                                   mlp_dtype=mlp_dtype, d_live=d_live)
    else:
        # wide-C streaming path: f32 key tiles double-buffered from HBM,
        # split into bf16 chunks in-kernel; exact f32 norms ride in VMEM.
        # Interpret mode (CPU tests) keeps the keys VMEM-resident and
        # slices instead — async DMA is a Mosaic-only facility
        k_norm = jnp.swapaxes(jnp.sum(xp * xp, axis=-1, keepdims=True), 1, 2)
        x_inputs = (xp, k_norm, xp)
        if interpret:
            keys_spec = pl.BlockSpec((1, n_pad, c_pad),
                                     lambda bb, ii: (bb, 0, 0),
                                     memory_space=pltpu.VMEM)
        else:
            # ANY memory space requires the trivial full-array block spec;
            # the kernel indexes the batch element via program_id(0)
            keys_spec = pl.BlockSpec((B, n_pad, c_pad),
                                     lambda bb, ii: (0, 0, 0),
                                     memory_space=pltpu.ANY)
            scratch = [pltpu.VMEM((2, tile_n, c_pad), jnp.float32),
                       pltpu.SemaphoreType.DMA((2,))]
        x_specs = [
            keys_spec,
            pl.BlockSpec((1, 1, n_pad), lambda bb, ii: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            q_spec]
        kernel = functools.partial(_fused_kernel_stream, k=k,
                                   n_layers=n_layers, mlp_dtype=mlp_dtype,
                                   tile_n=tile_n, n_points=n_pad,
                                   stream=not interpret)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_pad // tile_m),   # query tiles iterate fastest: the key
                                     # block (b, 0, 0) is fetched once per b
        in_specs=[
            *x_specs,
            *weight_specs,
            pl.BlockSpec(a.shape, lambda bb, ii: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(d.shape, lambda bb, ii: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, h_out), lambda bb, ii: (bb, ii, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, h_out), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*x_inputs, *weight_inputs, a, d)

    out_features = layers[-1][0].shape[1]
    return out[:, :N, :out_features]


def fused_edgeconv_reference(x, folded, k, mlp_dtype=jnp.float32):
    """Pure-jnp oracle replicating the kernel's exact numerics (packed
    quantized neighbor selection, low-precision gather/MLP, folded BN) for
    parity tests against interpret/TPU runs."""
    layers, (a, d) = folded
    B, N, C = x.shape
    k = min(k, N)
    xf = x.astype(jnp.float32)

    if C <= _DIRECT_C_MAX:
        # small-C path: exact f32 distances (per-dim accumulation, matching
        # the kernel's VPU order) and exact gathered values
        dists = None
        for dim in range(C):
            diff = xf[:, :, None, dim] - xf[:, None, :, dim]
            sq = diff * diff
            dists = sq if dists is None else dists + sq
        x_lp = xf
    else:
        q_norm = jnp.sum(xf * xf, axis=-1)
        chunks = _split_bf16(xf)
        dists = jnp.maximum(
            q_norm[:, :, None] + q_norm[:, None, :] - 2 * _oracle_cross(chunks),
            0.0)
        # the kernel gathers the top chunks (hi+lo for f32, hi only for bf16)
        x_lp = chunks[0] + chunks[1] if jnp.dtype(mlp_dtype) == jnp.float32 \
            else chunks[0]
    bits = jax.lax.bitcast_convert_type(dists, jnp.int32)
    col = jnp.arange(N, dtype=jnp.int32)
    # lexicographic (quantized distance, global index) two-key sort —
    # equivalent to the kernels' tile-local packing + quantized-domain
    # merges for any N (in-tile ties break to the lower local id, merges to
    # the lower global id: globally, the lower index always wins a tie).
    # slot 0 is the query itself by construction (the kernel masks the self
    # column and extracts only k-1 slots); an exact duplicate lands in a
    # later slot with identical coordinates
    qd = bits & ~_IDX_MASK
    qd = jnp.where(jnp.eye(N, dtype=bool)[None], _INT_MAX, qd)
    colb = jnp.broadcast_to(col[None, None, :], qd.shape)
    _, col_sorted = jax.lax.sort((qd, colb), dimension=-1, num_keys=2)
    idx_rest = col_sorted[..., :k - 1]
    idx = jnp.concatenate(
        [jnp.broadcast_to(col[None, :, None], (B, N, 1)), idx_rest], axis=-1)

    nbr = jnp.take_along_axis(x_lp[:, None, :, :],
                              idx[..., None], axis=2)            # (B, N, k, C)
    # the kernel uses the full-f32 query row for the self slot
    nbr = nbr.at[:, :, 0, :].set(xf)
    center = jnp.broadcast_to(xf[:, :, None, :], nbr.shape)
    h = jnp.concatenate([center, nbr - center], axis=-1)
    for i, (w, b) in enumerate(layers):
        # mirror the kernel: truncation-cast activations x bf16 weights —
        # every product is exact on every backend
        h_t = _split_bf16(h, terms=1)[0]
        w_bf = w.astype(jnp.bfloat16).astype(jnp.float32)
        z = jnp.einsum('bnkc,ch->bnkh', h_t, w_bf,
                       preferred_element_type=jnp.float32,
                       precision=SPLIT_EXACT) + b
        h = jnp.maximum(z, 0.0)
    out = h * a + d
    return jnp.max(out, axis=2)
