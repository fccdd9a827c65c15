"""Ring kNN + neighbor gather over a `points` mesh axis (sequence/context
parallelism for giant point clouds).

The reference has no distributed story beyond single-process DataParallel
(nn/train.py:124-125) and bounds kNN cost by keeping N=2000 (SURVEY §5.7).
The TPU-native long-context analog shards the *points* axis of a cloud over
ICI: every device holds an (B, S, C) shard of queries that doubles as the
initial key shard, and key shards circulate the ring via `lax.ppermute`.
Each of the P steps contributes a visiting shard's k-1 best candidates
*with their gathered feature rows*; a lexicographic (quantized distance,
global index) merge keeps the running top-(k-1) and re-selects the
surviving values. After P steps every query holds its exact global
neighborhood — no device ever materializes the full cloud, and the
traffic is P-1 shard passes over ICI (the minimum for exact all-to-all
kNN without replicating the cloud).

Semantics match the Pallas kernels (ops/knn.py, ops/edgeconv.py — PARITY.md
deviations #5/#7): distances quantized to their top 21 mantissa-exponent
bits for ranking, ties to the lower global index, slot 0 is the query
itself by construction.

Composed with a local edge-MLP + max application this yields a fully
points-sharded dynamic EdgeConv: `ring_edgeconv` computes features for the
local query shard; downstream global/attention pools reduce with `psum`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.knn import pairwise_sq_dists
# the kernels' quantization class — imported, not copied: PARITY.md #5
# equivalence rests on these being the same bits
from ..ops.edgeconv import _IDX_MASK, _INT_MAX

POINTS_AXIS = 'points'


def _quantized(dists):
    """Distance bits quantized to the packed kernels' 21-bit class (non
    -negative f32 bits are order-isomorphic to their int32 pattern)."""
    bits = jax.lax.bitcast_convert_type(jnp.maximum(dists, 0.0), jnp.int32)
    return bits & ~_IDX_MASK


def _topk_with_values(qd, idx, vals, k):
    """Lexicographic (quantized distance, global index) smallest-k along the
    candidate axis (last of qd/idx; vals has a trailing feature dim).
    Returns (qd, idx, vals) with k candidates, ties to the lower index."""
    pos = jnp.broadcast_to(
        jnp.arange(qd.shape[-1], dtype=jnp.int32), qd.shape)
    qd_s, idx_s, pos_s = jax.lax.sort((qd, idx, pos), dimension=-1, num_keys=2)
    take = lambda a: a[..., :k]
    vals_s = jnp.take_along_axis(vals, pos_s[..., :k, None], axis=-2)
    return take(qd_s), take(idx_s), vals_s


def ring_knn_gather(x_local, k, axis_name=POINTS_AXIS, *, axis_size=None):
    """Global kNN + neighbor features for a points-sharded cloud.

    Args:
      x_local: (B, S, C) — this device's shard of an (B, P*S, C) cloud,
        sharded contiguously (shard p holds global rows [p*S, (p+1)*S)).
      k: neighbors per point, self included.
      axis_name: mesh axis the points are sharded over.
      axis_size: number of shards P (static — the ring unrolls over it).

    Returns:
      neighbors (B, S, k, C) — slot 0 is the query itself — and global
      indices (B, S, k), both local to this device's query shard.
    """
    B, S, C = x_local.shape
    if axis_size is None:
        raise ValueError('ring_knn_gather::axis_size (number of point '
                         'shards) must be static')
    P_ = axis_size
    me = jax.lax.axis_index(axis_name)
    km1 = min(k, P_ * S) - 1
    row = me * S + jnp.arange(S, dtype=jnp.int32)             # global query ids

    acc_qd = jnp.full((B, S, km1), _INT_MAX, jnp.int32)
    acc_i = jnp.zeros((B, S, km1), jnp.int32)
    acc_v = jnp.zeros((B, S, km1, C), x_local.dtype)

    keys = x_local
    perm = [(i, (i + 1) % P_) for i in range(P_)]
    for step in range(P_):                                    # static unroll
        src = (me - step) % P_                                # owner of `keys`
        col = src * S + jnp.arange(S, dtype=jnp.int32)        # global key ids
        d = pairwise_sq_dists(x_local, keys)                  # (B, S, S) exact
        qd = _quantized(d)
        qd = jnp.where(col[None, None, :] == row[None, :, None],
                       _INT_MAX, qd)                          # self -> slot 0
        cand_qd, cand_i, cand_v = _topk_with_values(
            qd, jnp.broadcast_to(col[None, None, :], qd.shape),
            jnp.broadcast_to(keys[:, None, :, :], (B, S, S, C)), km1)
        acc_qd, acc_i, acc_v = _topk_with_values(
            jnp.concatenate([acc_qd, cand_qd], axis=-1),
            jnp.concatenate([acc_i, cand_i], axis=-1),
            jnp.concatenate([acc_v, cand_v], axis=-2), km1)
        if step + 1 < P_:
            keys = jax.lax.ppermute(keys, axis_name, perm)

    nbr = jnp.concatenate([x_local[:, :, None, :], acc_v], axis=2)
    idx = jnp.concatenate([jnp.broadcast_to(row[None, :, None], (B, S, 1)),
                           acc_i], axis=-1)
    return nbr, idx


def ring_edgeconv(x_local, mlp_apply, k, axis_name=POINTS_AXIS, *,
                  axis_size=None, aggr='max'):
    """One points-sharded dynamic EdgeConv layer: ring kNN+gather, then the
    local edge MLP on [x_i ; x_j - x_i] and neighbor aggregation — output
    stays sharded like the input. `mlp_apply` maps (..., 2C) -> (..., F)
    (e.g. a bound flax MLP in eval mode)."""
    nbr, _ = ring_knn_gather(x_local, k, axis_name, axis_size=axis_size)
    center = jnp.broadcast_to(x_local[:, :, None, :], nbr.shape)
    edge = jnp.concatenate([center, nbr - center], axis=-1)
    out = mlp_apply(edge)
    if aggr == 'max':
        return jnp.max(out, axis=2)
    if aggr == 'mean':
        return jnp.mean(out, axis=2)
    if aggr == 'add':
        return jnp.sum(out, axis=2)
    raise ValueError(f'ring_edgeconv::unsupported aggregation {aggr}')


def make_points_mesh(n_devices=None, devices=None):
    """1-D mesh over the points axis (compose with the data axis by building
    a 2-D mesh directly where needed)."""
    import numpy as np
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (POINTS_AXIS,))


def sharded_encoder_step(mesh, params_mlps, x, k, aggrs=None, data_axis=None):
    """Points-sharded stack of dynamic EdgeConv layers over `mesh` (a mesh
    with a `points` axis): shards the cloud's point axis, runs every layer
    through ring kNN over ICI, and returns per-point features plus the
    global mean pool (psum-reduced over points only — the cross-shard
    reduction the unsharded encoder gets for free).

    `params_mlps` is a list of `mlp_apply` callables (one per layer).
    `data_axis` names a batch mesh axis for 2-D data x points meshes: the
    batch shards orthogonally (each ring runs within its data-axis slice,
    so DP and SP compose without interaction)."""
    n_shards = mesh.shape[POINTS_AXIS]
    aggrs = aggrs or ['max'] * len(params_mlps)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(data_axis, POINTS_AXIS, None),
        out_specs=(P(data_axis, POINTS_AXIS, None), P(data_axis)))
    def run(x_local):
        h = x_local
        for mlp_apply, aggr in zip(params_mlps, aggrs):
            h = ring_edgeconv(h, mlp_apply, k, axis_size=n_shards, aggr=aggr)
        # global mean pool: local sum + psum over the points shards; the
        # denominator is static (shard size x shard count) — no collective,
        # and no low-precision rounding of the count
        total = jax.lax.psum(jnp.sum(h, axis=1), POINTS_AXIS)
        return h, total / (h.shape[1] * n_shards)

    return run(x)
