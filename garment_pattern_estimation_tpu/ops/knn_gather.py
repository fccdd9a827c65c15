"""Fused kNN + neighbor-gather with a custom VJP: the training-path analog
of the inference-only fused EdgeConv kernel.

The reference's training step spends most of its time in torch-cluster kNN,
the (B, N, k, C) neighbor gather, and the gather's scatter-add backward
(nn/net_blocks.py:124-135 via torch-geometric). On TPU the XLA translation
of that trio is HBM-bound: the kNN runs standalone, the gather re-reads the
point features at random, and the backward scatter serializes. This op fuses
each direction into one Pallas kernel per (batch, query-tile) grid step:

  forward:  squared distances (MXU, f32) -> packed top-k (one int min per
            neighbor slot, ties to the lower index; ops/edgeconv.py packing)
            -> per-slot one-hot gather as an MXU matmul. The distance matrix
            and the one-hots live and die in VMEM.
  backward: d_nbr scatter-add via the transposed one-hot matmul, accumulated
            in a VMEM-resident (N, C) block per batch element — no serialized
            XLA scatter.

Neighbor indices are treated as non-differentiable (the unfused path
stop-gradients the kNN graph too); gradients flow through the gathered
*values* only. The edge MLP + BatchNorm stay on the standard flax/XLA path,
so training numerics (batch statistics, parameter gradients) are identical
to the unfused module by construction.

Returned neighbor layout is (B, k, N, C) — slot-major, so kernel output
blocks are (k, TILE_M, C_pad) with lane-aligned trailing dims and no
transpose on the HBM side. Callers reduce over axis 1 instead of axis 2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .knn import (GHOST as _GHOST, round_up as _round_up,
                  split_bf16 as _split_bf16,
                  cross_from_splits as _cross_from_splits,
                  gather_from_splits as _gather_from_splits,
                  batched_cross_from_splits as _oracle_cross,
                  tree_sum as _tree_sum, _tree_min, SPLIT_EXACT)
from .edgeconv import _IDX_BITS, _IDX_MASK, _MAX_N_PAD, _DIRECT_C_MAX

_INT_MAX = jnp.iinfo(jnp.int32).max
_LANES = 128


def knn_gather_supported(n_points):
    """Packed indices carry _IDX_BITS bits: N_pad <= 2048."""
    return _round_up(n_points, 128) <= _MAX_N_PAD


def _fwd_kernel(*refs, k, d_live=None, value_chunks=2):
    """One grid step: k nearest neighbors + their features for TM query rows
    of one batch element.

    Wide features (d_live=None): keys arrive pre-split into bf16 truncation
    chunks (ops/knn.py::split_bf16) with exact f32 norms: all dot products
    are exact on the MXU; distance/gather accuracy is bounded by the ~2^-14
    split residual (below the packed top-k's quantization for ranking, and
    below the downstream MLP's own bf16 input rounding for values).

    Small features (d_live set — the raw-xyz first layer): distances
    accumulate per-dim on the VPU and gathers are per-dim one-hot tree-sums
    against keys transposed to (D_sub, N_pad) — both exact f32, no MXU."""
    if d_live is not None:
        kt_ref, q_ref, nbr_ref, idx_ref = refs
    else:
        khi_ref, klo_ref, knorm_ref, q_ref, nbr_ref, idx_ref = refs
    q = q_ref[0]                                              # (TM, C_pad) f32
    TM, c_pad = q.shape

    if d_live is not None:
        dists = None
        for dim in range(d_live):                             # D is tiny: unrolled
            diff = q[:, dim][:, None] - kt_ref[0, dim, :][None, :]
            sq = diff * diff
            dists = sq if dists is None else dists + sq
    else:
        k_chunks = [khi_ref[0], klo_ref[0]]                   # (N_pad, C_pad) bf16
        q_norm = jnp.sum(q * q, axis=-1, keepdims=True)
        k_norm = knorm_ref[0]                                 # (1, N_pad) f32
        q_chunks = [c.astype(jnp.bfloat16)
                    for c in _split_bf16(q, pltpu.bitcast)]
        cross = _cross_from_splits(q_chunks, k_chunks)
        dists = jnp.maximum(q_norm + k_norm - 2.0 * cross, 0.0)

    col = jax.lax.broadcasted_iota(jnp.int32, dists.shape, 1)
    bits = pltpu.bitcast(dists, jnp.int32)
    packed = (bits & ~_IDX_MASK) | col
    # self column masked out: slot 0 is the query itself by construction
    # (self-inclusive kNN at distance 0), so only k-1 extraction rounds
    # run; an exact duplicate lands in slot 1 with identical coordinates
    row = pl.program_id(1) * TM + \
        jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)       # global query ids
    packed = jnp.where(col == row, _INT_MAX, packed)

    lane = jax.lax.broadcasted_iota(jnp.int32, (TM, _LANES), 1)
    vlane = jax.lax.broadcasted_iota(jnp.int32, (TM, c_pad), 1)
    idx_out = jnp.where(lane == 0, row, 0)
    for slot in range(k):                                     # k is tiny: unrolled
        if slot > 0:
            nearest = _tree_min(packed)                       # (TM, 1)
            hit = packed == nearest                           # one-hot (TM, N_pad)
            packed = jnp.where(hit, _INT_MAX, packed)
        if slot == 0:
            nbr_ref[0, 0] = q                                 # self slot: no work
        elif d_live is not None:
            # exact per-dim gather: one nonzero per row -> tree-sum is exact
            nbr = jnp.zeros((TM, c_pad), jnp.float32)
            for dim in range(d_live):
                v = _tree_sum(jnp.where(hit, kt_ref[0, dim, :][None, :], 0.0))
                nbr = jnp.where(vlane == dim, v, nbr)
            nbr_ref[0, slot] = nbr
        else:
            # bf16 compute paths gather the top chunk only (values round to
            # bf16 immediately downstream): half the one-hot MXU work
            nbr_ref[0, slot] = _gather_from_splits(hit.astype(jnp.bfloat16),
                                                   k_chunks[:value_chunks])
        if slot > 0:
            idx_out = jnp.where(lane == slot, nearest & _IDX_MASK, idx_out)
    idx_ref[0] = idx_out


def _bwd_kernel(idx_ref, g_ref, dx_ref, *, k, n_pad, value_chunks=2):
    """One grid step: scatter-add TM query rows' neighbor cotangents into the
    batch element's (N_pad, C_pad) gradient block (revisited across query
    tiles — initialized on the first). `value_chunks=1` scatters the top
    bf16 truncation chunk only — exact for bf16-valued cotangents (the bf16
    compute path), half the transposed one-hot MXU work."""
    tile = pl.program_id(1)
    tile_m = idx_ref.shape[1]

    @pl.when(tile == 0)
    def _():
        dx_ref[0] = jnp.zeros_like(dx_ref[0])

    # slot 0 scatters to the query rows themselves (self-inclusive kNN):
    # a direct slice-add at full f32, no one-hot matmul
    dx_ref[0, pl.ds(tile * tile_m, tile_m), :] += g_ref[0, 0]

    acc = None
    for slot in range(1, k):
        idx_s = idx_ref[0][:, slot]                           # (TM,)
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (idx_s.shape[0], n_pad), 1)
        hit = (cols == idx_s[:, None]).astype(jnp.bfloat16)   # (TM, N_pad)
        # truncation-split cotangents: the bf16 casts are lossless
        g_chunks = [c.astype(jnp.bfloat16)
                    for c in _split_bf16(g_ref[0, slot], pltpu.bitcast)]
        def dot_t(a, b):
            return jax.lax.dot_general(                       # one-hot^T @ g
                a, b, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=SPLIT_EXACT)
        contrib = dot_t(hit, g_chunks[0])
        if value_chunks > 1:
            contrib = contrib + dot_t(hit, g_chunks[1])
        acc = contrib if acc is None else acc + contrib
    if acc is not None:
        dx_ref[0] += acc


def _pad_points(x, n_pad, c_pad):
    B, N, C = x.shape
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, n_pad - N), (0, c_pad - C)))
    if n_pad > N:
        xp = xp.at[:, N:, 0].set(_GHOST)  # ghost points: never selected
    return xp


def _fwd_pallas(x, k, interpret, value_chunks=2):
    B, N, C = x.shape
    if k > N:
        raise ValueError(f'knn_gather::k={k} exceeds the point count {N} '
                         '(clamp k at the call site — the output slot count '
                         'is part of downstream shapes)')
    c_pad = _round_up(C, _LANES)
    n_pad = _round_up(N, _LANES)
    if n_pad > _MAX_N_PAD:
        raise ValueError(f'knn_gather::N={N} exceeds the packed-index bound '
                         f'({_MAX_N_PAD}); use knn + gather_neighbors')
    # wide-feature layers need the smaller query tile to fit scoped VMEM
    tile_m = 256 if (n_pad % 256 == 0 and c_pad <= _LANES) else _LANES
    xp = _pad_points(x, n_pad, c_pad)

    d_live = C if C <= _DIRECT_C_MAX else None
    q_spec = pl.BlockSpec((1, tile_m, c_pad), lambda b, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    if d_live is not None:
        # small-C path: keys transposed to (D_sub, N_pad) — exact f32 VPU
        # distances + gathers in the kernel, no splits and no norms
        d_sub = _round_up(C, 8)
        keys_t = jnp.swapaxes(xp[:, :, :d_sub], 1, 2)  # (B, d_sub, n_pad)
        x_inputs = (keys_t, xp)
        x_specs = [
            pl.BlockSpec((1, d_sub, n_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            q_spec]
    else:
        # keys pre-split into bf16 truncation chunks + exact f32 norms
        k_hi, k_lo = (c.astype(jnp.bfloat16) for c in _split_bf16(xp))
        k_norm = jnp.swapaxes(jnp.sum(xp * xp, axis=-1, keepdims=True), 1, 2)
        keys_spec = pl.BlockSpec((1, n_pad, c_pad), lambda b, i: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        x_inputs = (k_hi, k_lo, k_norm, xp)
        x_specs = [
            keys_spec, keys_spec,
            pl.BlockSpec((1, 1, n_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            q_spec]

    nbr, idx = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, d_live=d_live,
                          value_chunks=value_chunks),
        grid=(B, n_pad // tile_m),
        in_specs=x_specs,
        out_specs=[
            pl.BlockSpec((1, k, tile_m, c_pad), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, _LANES), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, k, n_pad, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, n_pad, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(*x_inputs)
    return nbr[:, :, :N, :C], idx


def _bwd_pallas(idx_padded, g, shape, interpret, value_chunks=2):
    """idx_padded (B, N_pad, 128) from the forward; g = d_nbr (B, k, N, C)."""
    B, N, C = shape
    k = g.shape[1]
    c_pad = _round_up(C, _LANES)
    n_pad = idx_padded.shape[1]
    tile_m = 256 if (n_pad % 256 == 0 and c_pad <= _LANES) else _LANES
    gp = jnp.pad(g.astype(jnp.float32),
                 ((0, 0), (0, 0), (0, n_pad - N), (0, c_pad - C)))

    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, n_pad=n_pad,
                          value_chunks=value_chunks),
        grid=(B, n_pad // tile_m),
        in_specs=[
            pl.BlockSpec((1, tile_m, _LANES), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, tile_m, c_pad), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, c_pad), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(idx_padded, gp)
    return dx[:, :N, :C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def knn_gather(x, k, interpret=False, value_chunks=2):
    """(B, N, C) -> (neighbors (B, k, N, C), indices (B, N, k)).

    Neighbor selection matches `ops.knn` semantics (self included, squared
    euclidean, ties to the lower index) up to the packed-distance
    quantization (top 21 mantissa-exponent bits — same deviation as the
    fused inference kernel, PARITY.md). Differentiable in the gathered
    values; the graph itself is a constant of the VJP. Requires k <= N
    (clamp at the call site: the slot count shapes downstream arrays).

    `value_chunks=1` gathers/scatters the top bf16 truncation chunk only —
    for bf16 compute paths, where values round to bf16 immediately
    downstream and cotangents arrive bf16-valued, at half the one-hot MXU
    work per direction. Ranking precision is unaffected (distances always
    use the full split). No effect on the small-C (<=16) per-dim exact
    path."""
    nbr, idx_padded = _fwd_pallas(x, k, interpret, value_chunks)
    return nbr, idx_padded[:, :x.shape[1], :k]


def _knn_gather_fwd(x, k, interpret, value_chunks):
    nbr, idx_padded = _fwd_pallas(x, k, interpret, value_chunks)
    # zero-size carrier records the primal dtype (dtype objects are not
    # valid residual leaves)
    return (nbr, idx_padded[:, :x.shape[1], :k]), (
        idx_padded, x.shape, jnp.zeros((0,), x.dtype))


def _knn_gather_bwd(k, interpret, value_chunks, residuals, cotangents):
    idx_padded, shape, dtype_carrier = residuals
    d_nbr, _ = cotangents  # integer index cotangent is symbolic-zero
    dx = _bwd_pallas(idx_padded, d_nbr, shape, interpret, value_chunks)
    # the scatter-add accumulates in f32; hand back the primal's dtype so
    # bf16 inputs (compute_dtype paths) differentiate cleanly
    return (dx.astype(dtype_carrier.dtype),)


knn_gather.defvjp(_knn_gather_fwd, _knn_gather_bwd)


def knn_gather_reference(x, k, value_chunks=2):
    """Pure-jnp oracle with the kernel's exact selection numerics (packed
    quantized distances); XLA autodiff of this is the gradient oracle."""
    B, N, C = x.shape
    xf = x.astype(jnp.float32)
    if C <= _DIRECT_C_MAX:
        # small-C path: exact f32 distances (per-dim accumulation, matching
        # the kernel's VPU order) and exact gathered values
        dists = None
        for dim in range(C):
            diff = xf[:, :, None, dim] - xf[:, None, :, dim]
            sq = diff * diff
            dists = sq if dists is None else dists + sq
        x_rec = xf
    else:
        q_norm = jnp.sum(xf * xf, axis=-1)
        chunks = _split_bf16(xf)
        cross = _oracle_cross(chunks)
        dists = jnp.maximum(
            q_norm[:, :, None] + q_norm[:, None, :] - 2 * cross, 0.0)
        # the kernel gathers the top `value_chunks` split chunks; the
        # truncation is bitwise ops (zero autodiff), so re-attach an
        # identity gradient — the kernel's VJP likewise scatters the full
        # cotangent
        rec = sum(chunks[:value_chunks])
        x_rec = xf + jax.lax.stop_gradient(rec - xf)
    bits = jax.lax.bitcast_convert_type(dists, jnp.int32)
    col = jnp.arange(N, dtype=jnp.int32)
    packed = (bits & ~_IDX_MASK) | col[None, None, :]
    # slot 0 is the query itself by construction (the kernel masks the self
    # column and extracts only k-1 slots); an exact duplicate lands in a
    # later slot with identical coordinates
    packed = jnp.where(jnp.eye(N, dtype=bool)[None], jnp.iinfo(jnp.int32).max,
                       packed)
    idx_rest = jnp.sort(packed, axis=-1)[..., :k - 1] & _IDX_MASK
    idx = jnp.concatenate(
        [jnp.broadcast_to(col[None, :, None], (B, N, 1)), idx_rest], axis=-1)

    nbr = jnp.take_along_axis(x_rec[:, None, :, :], idx[..., None], axis=2)
    # slot 0 is the query itself (self-inclusive kNN): the kernel skips its
    # gather and uses the full-f32 query row; its gradient flows to the
    # query row directly
    nbr = nbr.at[:, :, 0, :].set(xf)
    return jnp.moveaxis(nbr, 2, 1), idx                            # (B, k, N, C)
