"""Neural building blocks (flax): point-cloud encoders + sequence decoders.

Re-designs of the reference's `nn/net_blocks.py` for rectangular TPU batches:
no torch-geometric flat-batch format — point clouds stay (B, N, C) so every
op is a fused XLA primitive (gathers, matmuls, masked reductions) and the kNN
graph build routes through `ops.knn` (Pallas on TPU).

Recurrent decoders are `lax.scan`-based cells with torch's parameter layout
and gate order (i, f, g, o for LSTM; r, z, n for GRU) so reference `.pth`
checkpoints map onto the pytree without gate reshuffling
(see experiment/torch_import.py).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..ops.knn import knn as knn_search, pairwise_sq_dists
from ..ops.pooling import GLOBAL_POOLS, gather_neighbors
from ..ops.edgeconv import fold_mlp_bn, fused_edgeconv, fused_edgeconv_supported
from ..ops.edgeconv_train import chunked_edgeconv_train
from ..ops.knn_gather import knn_gather, knn_gather_supported


def kaiming_normal_torch(key, shape, dtype=jnp.float32):
    """torch's kaiming_normal_ default: std = sqrt(2 / fan_in) where fan_in is
    the product of all dims but the first (torch weight layout)."""
    fan_in = 1
    for d in shape[1:]:
        fan_in *= d
    std = (2.0 / max(fan_in, 1)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class MLP(nn.Module):
    """Dense -> ReLU -> BatchNorm stacks, in the reference's (non-standard)
    order with BN *after* the activation (nn/net_blocks.py:43-47).

    Accepts (..., features): Dense contracts the last axis and BatchNorm
    reduces every leading axis — statistics over N-D input match a flattened
    (rows, features) pass (torch BatchNorm1d semantics).
    `compute_dtype` runs the matmuls in bf16 on the MXU (params stay f32).
    """
    features: Sequence[int]
    batch_norm: bool = True
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, stats_pairs=None,
                 edge_pair=None):
        """Standard mode: Dense->ReLU->BN stacks on `x`.

        `stats_pairs` mode (x ignored, returns None): drive each BatchNorm's
        running-statistics update from externally computed global (mean, var)
        pairs — the chunked EdgeConv training path (ops/edgeconv_train)
        computes the layer math itself but the running averages must keep
        living at their checkpoint-compatible names. Each BN sees a two-row
        tensor [mean - sqrt(var), mean + sqrt(var)] whose batch statistics
        are exactly (mean, var — biased), so its update rule is untouched.

        `edge_pair` mode (x ignored): the first layer's EdgeConv input
        [x_i ; x_j - x_i] is supplied factored as (center (..., C),
        neighbors (..., C), center_broadcast_axis). Algebraically
        concat(c, n - c) @ W = c @ (W_top - W_bot) + b + n @ W_bot, so the
        center term is one narrow matmul over points (k-fold fewer rows)
        and the (..., 2C) concatenated edge tensor — the widest per-edge
        intermediate of the unfused path — never materializes, in forward
        or backward. Identical parameters, statistics, and math (up to
        f32 summation order) to the standard path.

        Non-final BatchNorms are FOLDED into the next layer's weights at
        runtime: with a = scale * rsqrt(var + eps), d = bias - mean * a,
        BN(r) @ W + b == r @ (a * W) + (d @ W + b) — the normalized
        (..., H) tensor never materializes (the train-mode analog of the
        fused eval kernel's fold_mlp_bn). Batch statistics (train) come
        from an explicit f32 reduction over the relu output; running
        averages update through the BN module itself, so variable names,
        shapes, and update rules are untouched. Same math as stacked flax
        Dense->ReLU->BN up to f32 summation order."""
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        eps = 1e-5
        fold = (self.batch_norm and stats_pairs is None
                and not self.is_initializing())
        pending = None                     # previous layer's deferred (a, d)
        for i, size in enumerate(self.features):
            dense = nn.Dense(size, dtype=dtype)
            bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=eps, dtype=dtype) \
                if self.batch_norm else None
            if stats_pairs is not None:
                mean, var = stats_pairs[i]
                spread = jnp.sqrt(jnp.maximum(var, 0.0))
                bn(jax.lax.stop_gradient(
                    jnp.stack([mean - spread, mean + spread])))
                continue
            if i == 0 and edge_pair is not None:
                center, neighbors, bcast_axis = edge_pair
                if self.is_initializing():
                    # create params at their standard (2C, H) shape
                    dense(jnp.zeros((1, 2 * center.shape[-1]), center.dtype))
                p = self.get_variable('params', f'Dense_{i}')
                W, b = p['kernel'], p['bias']
                C = center.shape[-1]
                if dtype is not None:
                    center, neighbors = center.astype(dtype), neighbors.astype(dtype)
                    W, b = W.astype(dtype), b.astype(dtype)
                point_term = center @ (W[:C] - W[C:]) + b        # (..., H)
                x = jnp.expand_dims(point_term, bcast_axis) + neighbors @ W[C:]
            elif pending is not None:
                p = self.get_variable('params', f'Dense_{i}')
                W, b = p['kernel'], p['bias']
                a, d = pending
                pending = None
                w_fold = a[:, None] * W                          # exact f32
                b_fold = jnp.dot(d, W,
                                 precision=jax.lax.Precision.HIGHEST) + b
                if dtype is not None:
                    x, w_fold, b_fold = (x.astype(dtype), w_fold.astype(dtype),
                                         b_fold.astype(dtype))
                x = x @ w_fold + b_fold
            else:
                x = dense(x)
            x = nn.relu(x)
            if bn is None:
                continue
            if not fold:
                x = bn(x)
                continue
            bn_params = self.get_variable('params', f'BatchNorm_{i}')
            gamma, beta = bn_params['scale'], bn_params['bias']
            if train:
                xf = x.astype(jnp.float32)
                axes = tuple(range(x.ndim - 1))
                mean = jnp.mean(xf, axis=axes)
                var = jnp.maximum(
                    jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean),
                    0.0)                   # biased, flax BatchNorm semantics
                spread = jnp.sqrt(var)
                bn(jax.lax.stop_gradient(   # running-average update only
                    jnp.stack([mean - spread, mean + spread])))
            else:
                stats = self.get_variable('batch_stats', f'BatchNorm_{i}')
                mean, var = stats['mean'], stats['var']
            a = gamma * jax.lax.rsqrt(var + eps)
            d = beta - mean * a
            if i + 1 < len(self.features):
                pending = (a, d)           # fold into the next layer
            else:
                x = x.astype(jnp.float32) * a + d               # final affine
                if dtype is not None:
                    x = x.astype(dtype)
        return None if stats_pairs is not None else x


# ----------------------------------------------------------------------
# EdgeConv encoder (DGCNN-style)
# ----------------------------------------------------------------------

class EdgeConv(nn.Module):
    """One dynamic EdgeConv layer: kNN graph from *current* features, edge
    MLP on [x_i ; x_j - x_i], max (or mean/sum) aggregation over neighbors.

    Eval forward on TPU routes through the fully fused Pallas kernel
    (ops/edgeconv.py: distances + top-k + one-hot gather + folded-BN MLP +
    max, all in VMEM); training keeps the unfused path (batch BN statistics
    + gradients)."""
    mlp_features: Sequence[int]
    k: int = 5
    aggr: str = 'max'
    use_pallas: bool | None = None
    compute_dtype: str | None = None
    # training-path chunking (ops/edgeconv_train): None = auto (on when the
    # widest per-edge intermediate would exceed _CHUNK_TRAIN_BYTES),
    # True/False force
    train_chunked: bool | None = None
    train_chunk_size: int | None = None
    # sweep schedule of the chunked training path: 'chunked' (L statistics
    # sweeps + full final sweep), 'fused_final' (final sweep folded into the
    # last statistics sweep — exact, same memory, default), 'streamed'
    # (additionally stores the layer-(L-2) activations to kill the O(L^2)
    # recompute — exact, costs one (B, N, k, H) HBM buffer)
    train_mode: str = 'fused_final'

    # the unfused path materializes (B, N, k, W) for the WIDEST W among the
    # gathered neighbors (C — the 2C edge concat never materializes with
    # the factored first layer, MLP edge_pair mode) and every MLP hidden
    # layer; up to ~2 GB that is still faster than chunked sweeps on a
    # 16 GB chip — past it (the 128x10k stress config) only the chunked
    # path fits at all
    _CHUNK_TRAIN_BYTES = 1 << 31

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, N, C = x.shape
        mlp = MLP(self.mlp_features, compute_dtype=self.compute_dtype,
                  name='MLP_0')

        if train and not self.is_initializing():
            chunked = self.train_chunked
            if chunked is None:
                widest = max([C] + list(self.mlp_features))
                chunked = (B * N * min(self.k, N) * widest * 4
                           > self._CHUNK_TRAIN_BYTES)
            if chunked:
                # chunked + rematerialized training path: the (B, N, k, C)
                # gather and per-layer MLP intermediates never materialize
                # (stress-config training would OOM otherwise); BN batch
                # statistics are global, gradients exact (edgeconv_train).
                # compute_dtype runs the sweep matmuls in bf16 with f32
                # statistics, mirroring the unfused mixed-precision split
                idx = knn_search(
                    jax.lax.stop_gradient(x).astype(jnp.float32),
                    min(self.k, N), use_pallas=self.use_pallas,
                    **({'interpret': True}
                       if self.use_pallas and jax.default_backend() != 'tpu'
                       else {}))
                out, stats_pairs = chunked_edgeconv_train(
                    x, idx, self.get_variable('params', 'MLP_0'),
                    chunk=self.train_chunk_size, aggr=self.aggr,
                    mode=self.train_mode, compute_dtype=self.compute_dtype)
                mlp(None, train=True, stats_pairs=stats_pairs)
                return out

        pallas_on = self.use_pallas if self.use_pallas is not None \
            else jax.default_backend() == 'tpu'
        if (not train and not self.is_initializing() and pallas_on
                and self.aggr == 'max' and fused_edgeconv_supported(N, C)
                and self.has_variable('batch_stats', 'MLP_0')):
            folded = jax.lax.stop_gradient(
                fold_mlp_bn(self.get_variable('params', 'MLP_0'),
                            self.get_variable('batch_stats', 'MLP_0')))
            # precision follows the module (f32 unless compute_dtype says
            # otherwise): the fused kernel must not silently trade the <=1%
            # reference-parity budget for speed
            mlp_dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype \
                else jnp.float32
            return fused_edgeconv(
                jax.lax.stop_gradient(x), folded, k=self.k,
                mlp_dtype=mlp_dtype,
                interpret=jax.default_backend() != 'tpu')

        if pallas_on and not self.is_initializing() and knn_gather_supported(N):
            # training/fallback path: fused kNN + gather kernel with a
            # scatter-add Pallas backward; edge MLP + BatchNorm stay on flax
            # so batch statistics and parameter gradients are identical to
            # the unfused module. Neighbor layout is slot-major (B, k, N, C).
            # bf16 compute gathers/scatters one truncation chunk (values
            # round to bf16 in the MLP anyway): half the one-hot MXU work
            bf16_mode = (self.compute_dtype is not None
                         and jnp.dtype(self.compute_dtype) == jnp.bfloat16)
            neighbors, _ = knn_gather(x, min(self.k, N),
                                      jax.default_backend() != 'tpu',
                                      1 if bf16_mode else 2)
            k_axis = 1
        else:
            # kNN stays f32: near-tie neighbor ranking is precision-sensitive
            idx = knn_search(jax.lax.stop_gradient(x).astype(jnp.float32),
                             self.k, use_pallas=self.use_pallas,
                             **({'interpret': True}
                                if self.use_pallas
                                and jax.default_backend() != 'tpu'
                                else {}))
            neighbors = gather_neighbors(x, idx)                 # (B, N, k, C)
            k_axis = 2

        # the edge MLP runs on the 4D (B, k|N, N|k, ·) tensors directly:
        # Dense contracts the last axis and BatchNorm reduces the leading
        # axes — identical statistics to a flattened (B*k*N, 2C) pass. The
        # first layer takes the factored (center, neighbors) form (MLP
        # edge_pair mode): the concatenated [x_i ; x_j - x_i] tensor — the
        # widest per-edge intermediate — never materializes
        out = mlp(None, train=train, edge_pair=(x, neighbors, k_axis))

        if self.aggr == 'max':
            return jnp.max(out, axis=k_axis)
        if self.aggr == 'mean':
            return jnp.mean(out, axis=k_axis)
        if self.aggr == 'add':
            return jnp.sum(out, axis=k_axis)
        raise ValueError(f'EdgeConv::unsupported aggregation {self.aggr}')


class EdgeConvFeatures(nn.Module):
    """Point-cloud feature extractor: stacked dynamic EdgeConv layers +
    optional xyz skip connection + global pool + linear head
    (reference: nn/net_blocks.py:93-191).

    Returns (global_encoding | None, per_point_features (B, N, F), mask)."""
    out_size: int
    conv_depth: int = 2
    k_neighbors: int = 5
    econv_hidden: int = 200
    econv_hidden_depth: int = 2
    econv_feature: int = 112
    econv_aggr: str = 'max'
    global_pool: str = 'mean'
    skip_connections: bool = False
    graph_pooling: bool = False
    pool_ratio: float = 0.1
    use_pallas: bool | None = None
    compute_dtype: str | None = None
    # queries per sweep step of the chunked EdgeConv TRAINING path
    # (ops/edgeconv_train); None = the ~256 MB-per-intermediate auto size.
    # Exposed as `NN.edgeconv_train_chunk` for stress-scale tuning
    train_chunk_size: int | None = None
    # sweep schedule of the chunked training path (EdgeConv.train_mode);
    # exposed as `NN.edgeconv_train_mode`
    train_mode: str = 'fused_final'
    # precision islands under bf16 compute: conv layer ids kept at f32.
    # Rationale: conv0 ingests raw (standardized) geometry, where bf16
    # rounding is ~40% relative noise on the x_j - x_i neighbor differences
    # of nearby points; its matmuls are narrow (C=3) and extraction-bound,
    # so f32 there costs little while the wide conv1 MXU work stays bf16
    f32_conv_layers: Sequence[int] = ()

    @nn.compact
    def __call__(self, positions, pool_global: bool = True, train: bool = False):
        if self.graph_pooling:
            features_by_layer = [int(self.econv_feature / c)
                                 for c in range(self.conv_depth, 0, -1)]
            hidden_by_layer = [int(self.econv_hidden / c)
                               for c in range(self.conv_depth, 0, -1)]
        else:
            features_by_layer = [self.econv_feature] * self.conv_depth
            hidden_by_layer = [self.econv_hidden] * self.conv_depth

        out = positions
        for conv_id in range(self.conv_depth):
            mlp_sizes = [hidden_by_layer[conv_id]] * self.econv_hidden_depth \
                        + [features_by_layer[conv_id]]
            conv_dtype = (None if conv_id in tuple(self.f32_conv_layers)
                          else self.compute_dtype)
            out = EdgeConv(mlp_sizes, k=min(self.k_neighbors, out.shape[1]),
                           aggr=self.econv_aggr, use_pallas=self.use_pallas,
                           compute_dtype=conv_dtype,
                           train_chunk_size=self.train_chunk_size,
                           train_mode=self.train_mode,
                           name=f'conv{conv_id}')(out, train=train)
            if self.graph_pooling:
                if self.skip_connections:
                    raise ValueError(
                        'EdgeConvFeatures::graph_pooling coarsens the point set '
                        'and cannot be combined with xyz skip connections '
                        '(invalid in the reference too, net_blocks.py:178-180)')
                out, _ = DynamicGraphPool(
                    features_by_layer[conv_id], k=self.k_neighbors,
                    pool_ratio=self.pool_ratio, use_pallas=self.use_pallas,
                    name=f'gpool{conv_id}')(out, train=train)

        if self.skip_connections:
            out = jnp.concatenate([out.astype(positions.dtype), positions], axis=-1)

        out = out.astype(jnp.float32)  # downstream heads/losses stay f32
        if pool_global:
            pooled = GLOBAL_POOLS[self.global_pool](out)
            encoding = nn.Dense(self.out_size, name='lin')(pooled)
            return encoding, out, None
        return None, out, None

    def pool(self, features, mask=None):
        """The configured global pool as a standalone fn (used by the
        attention head to pool per-panel weighted features)."""
        return GLOBAL_POOLS[self.global_pool](features, mask)


class DynamicGraphPool(nn.Module):
    """Self-attention graph pooling on point features (the reference's
    `DynamicASAPool`, nn/net_blocks.py:194-218, re-expressed with fixed
    capacity for XLA).

    For every node: a kNN cluster is summarized by attention over its
    neighbors; a LEConv-style fitness score ranks clusters; the top
    ceil(ratio*N) clusters survive, their features gated by fitness. The
    third-party ASAPooling CUDA op becomes masked gathers + a top-k —
    same select-by-learned-fitness semantics, static shapes."""
    feature_size: int
    k: int = 10
    pool_ratio: float = 0.5
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, N, C = x.shape
        keep = max(int(np.ceil(self.pool_ratio * N)), 1)
        k = min(self.k, N)

        idx = knn_search(jax.lax.stop_gradient(x), k, use_pallas=self.use_pallas)
        neighbors = gather_neighbors(x, idx)                       # (B, N, k, C)

        # intra-cluster attention: query = max over the cluster (ASAP's master)
        query = jnp.max(neighbors, axis=2)                          # (B, N, C)
        att_in = jnp.concatenate(
            [jnp.broadcast_to(query[:, :, None, :], neighbors.shape), neighbors],
            axis=-1)
        scores = nn.Dense(1, name='att')(att_in)[..., 0]            # (B, N, k)
        weights = jax.nn.softmax(nn.leaky_relu(scores), axis=-1)
        cluster = jnp.einsum('bnk,bnkc->bnc', weights, neighbors)   # (B, N, C)

        # LEConv-style fitness: local feature vs neighborhood mean
        fitness = (nn.Dense(1, name='fit_self')(cluster)[..., 0]
                   + nn.Dense(1, name='fit_nbr')(
                       cluster - jnp.mean(gather_neighbors(cluster, idx), axis=2))[..., 0])
        fitness = jnp.tanh(fitness)                                  # (B, N)

        top_fit, top_idx = jax.lax.top_k(fitness, keep)              # (B, keep)
        selected = jnp.take_along_axis(cluster, top_idx[..., None], axis=1)
        return selected * top_fit[..., None], top_idx


class EdgeConvPoolingFeatures(nn.Module):
    """Three-stage EdgeConv + graph-pool encoder
    (reference: nn/net_blocks.py:221-268)."""
    out_size: int
    n_features1: int = 32
    n_features2: int = 128
    n_features3: int = 256
    k: int = 10
    pool_ratio: float = 0.5
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, positions, pool_global: bool = True, train: bool = False):
        out = EdgeConv([64, 64, self.n_features1], k=self.k,
                       use_pallas=self.use_pallas, name='conv1')(positions, train=train)
        out, _ = DynamicGraphPool(self.n_features1, k=self.k,
                                  pool_ratio=self.pool_ratio,
                                  use_pallas=self.use_pallas, name='pool1')(out, train=train)
        out = EdgeConv([self.n_features2] * 3, k=min(self.k, out.shape[1]),
                       use_pallas=self.use_pallas, name='conv2')(out, train=train)
        out, _ = DynamicGraphPool(self.n_features2, k=min(self.k, out.shape[1]),
                                  pool_ratio=self.pool_ratio,
                                  use_pallas=self.use_pallas, name='pool2')(out, train=train)
        out = EdgeConv([self.n_features3] * 3, k=min(self.k, out.shape[1]),
                       use_pallas=self.use_pallas, name='conv3')(out, train=train)
        pooled = jnp.max(out, axis=1)
        encoding = nn.Dense(self.out_size, name='lin')(pooled)
        return encoding, out, None

    def pool(self, features, mask=None):
        return GLOBAL_POOLS['max'](features, mask)


# ----------------------------------------------------------------------
# PointNet++ encoder
# ----------------------------------------------------------------------

def farthest_point_sampling(positions, num_samples):
    """FPS indices (B, M) over (B, N, 3); starts from point 0 (deterministic)."""
    B, N, _ = positions.shape

    def per_cloud(pts):
        def body(i, state):
            dists, idx = state
            last = pts[idx[i - 1]]
            new_d = jnp.sum((pts - last) ** 2, axis=-1)
            dists = jnp.minimum(dists, new_d)
            idx = idx.at[i].set(jnp.argmax(dists))
            return dists, idx

        init_idx = jnp.zeros(num_samples, dtype=jnp.int32)
        init_d = jnp.full(N, jnp.inf)
        _, idx = jax.lax.fori_loop(1, num_samples, body, (init_d, init_idx))
        return idx

    return jax.vmap(per_cloud)(positions)


class SetAbstraction(nn.Module):
    """FPS centroids + radius neighborhoods + PointNet local feature
    (reference: nn/net_blocks.py:10-25), masked fixed-capacity form."""
    mlp_features: Sequence[int]
    ratio: float = 0.2
    radius: float = 0.3
    max_neighbors: int = 25

    @nn.compact
    def __call__(self, features, positions, train: bool = False):
        B, N, _ = positions.shape
        M = max(int(self.ratio * N), 1)
        centroid_idx = farthest_point_sampling(positions, M)               # (B, M)
        centroids = jnp.take_along_axis(positions, centroid_idx[..., None], axis=1)

        d = pairwise_sq_dists(centroids, positions)                # (B, M, N)
        within = d <= self.radius ** 2
        # cap the neighborhood: nearest `max_neighbors` inside the radius
        capped = jnp.where(within, d, jnp.inf)
        neg_top, nbr_idx = jax.lax.top_k(-capped, min(self.max_neighbors, N))
        valid = jnp.isfinite(-neg_top)                                      # (B, M, K)

        nbr_pos = jnp.take_along_axis(
            positions[:, :, None, :], nbr_idx[..., None], axis=1)           # (B, M, K, 3)
        rel_pos = nbr_pos - centroids[:, :, None, :]
        if features is not None:
            nbr_feat = jnp.take_along_axis(
                features[:, :, None, :], nbr_idx[..., None], axis=1)
            local = jnp.concatenate([nbr_feat, rel_pos], axis=-1)
        else:
            local = rel_pos

        flat = local.reshape(-1, local.shape[-1])
        h = MLP(self.mlp_features)(flat, train=train).reshape(*local.shape[:3], -1)
        h = jnp.where(valid[..., None], h, -jnp.inf)
        pooled = jnp.max(h, axis=2)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)  # empty neighborhoods
        return pooled, centroids


class PointNetPlusPlus(nn.Module):
    """Alternative global encoder (config `feature_extractor:
    PointNetPlusPlus` — reference: nn/net_blocks.py:50-88)."""
    out_size: int
    econv_hidden: int = 200
    econv_feature: int = 150
    r1: float = 0.3

    @nn.compact
    def __call__(self, positions, pool_global: bool = True, train: bool = False):
        h, pos = SetAbstraction(
            [self.econv_hidden, self.econv_hidden, self.econv_feature],
            ratio=0.2, radius=self.r1, name='sa1')(None, positions, train=train)
        # global set abstraction: per-point MLP on [h ; pos], max pool
        local = jnp.concatenate([h, pos], axis=-1)
        flat = local.reshape(-1, local.shape[-1])
        g = MLP([self.econv_hidden, self.econv_hidden, self.econv_feature])(
            flat, train=train).reshape(*local.shape[:2], -1)
        pooled = jnp.max(g, axis=1)
        encoding = nn.Dense(self.out_size, name='lin')(pooled)
        if pool_global:
            return encoding, g, None
        return None, g, None

    def pool(self, features, mask=None):
        return GLOBAL_POOLS['max'](features, mask)


# ----------------------------------------------------------------------
# Recurrent cells (torch layout) + decoders
# ----------------------------------------------------------------------

class TorchLSTM(nn.Module):
    """Multi-layer LSTM over (B, T, C), parameterized like torch.nn.LSTM:
    per layer `w_ih` (in, 4H), `w_hh` (H, 4H), `b_ih`, `b_hh` (4H,), gate
    order (i, f, g, o). Scanned over time with lax.scan."""
    hidden_size: int
    n_layers: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, inputs, init_states, train: bool = False):
        """inputs (B, T, C); init_states: list of (h0, c0) per layer.
        Returns (outputs (B, T, H), final (h, c) of last layer)."""
        x = inputs
        final_states = []
        for layer in range(self.n_layers):
            in_size = x.shape[-1]
            w_ih = self.param(f'l{layer}_w_ih', kaiming_normal_torch,
                              (4 * self.hidden_size, in_size))
            w_hh = self.param(f'l{layer}_w_hh', kaiming_normal_torch,
                              (4 * self.hidden_size, self.hidden_size))
            b_ih = self.param(f'l{layer}_b_ih', _torch_rnn_bias_init(self.hidden_size),
                              (4 * self.hidden_size,))
            b_hh = self.param(f'l{layer}_b_hh', _torch_rnn_bias_init(self.hidden_size),
                              (4 * self.hidden_size,))

            # pre-compute the input projection for the whole sequence (MXU-friendly)
            gates_x = jnp.einsum('btc,gc->btg', x, w_ih) + b_ih + b_hh

            def step(carry, gx):
                h, c = carry
                gates = gx + h @ w_hh.T
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
                return (h_new, c_new), h_new

            (h_fin, c_fin), outs = jax.lax.scan(
                step, init_states[layer], jnp.swapaxes(gates_x, 0, 1))
            x = jnp.swapaxes(outs, 0, 1)
            final_states.append((h_fin, c_fin))
            if self.dropout > 0 and train and layer < self.n_layers - 1:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x, final_states


class TorchGRU(nn.Module):
    """Multi-layer GRU, torch layout/gate order (r, z, n)."""
    hidden_size: int
    n_layers: int

    @nn.compact
    def __call__(self, inputs, init_states, train: bool = False):
        x = inputs
        for layer in range(self.n_layers):
            in_size = x.shape[-1]
            w_ih = self.param(f'l{layer}_w_ih', kaiming_normal_torch,
                              (3 * self.hidden_size, in_size))
            w_hh = self.param(f'l{layer}_w_hh', kaiming_normal_torch,
                              (3 * self.hidden_size, self.hidden_size))
            b_ih = self.param(f'l{layer}_b_ih', _torch_rnn_bias_init(self.hidden_size),
                              (3 * self.hidden_size,))
            b_hh = self.param(f'l{layer}_b_hh', _torch_rnn_bias_init(self.hidden_size),
                              (3 * self.hidden_size,))

            gates_x = jnp.einsum('btc,gc->btg', x, w_ih) + b_ih

            def step(carry, gx):
                h = carry
                gh = h @ w_hh.T + b_hh
                xr, xz, xn = jnp.split(gx, 3, axis=-1)
                hr, hz, hn = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1 - z) * n + z * h
                return h_new, h_new

            _, outs = jax.lax.scan(step, init_states[layer], jnp.swapaxes(gates_x, 0, 1))
            x = jnp.swapaxes(outs, 0, 1)
        return x


def _torch_rnn_bias_init(hidden_size):
    """torch.nn.LSTM/GRU bias default: U(-1/sqrt(H), 1/sqrt(H))."""
    bound = 1.0 / (hidden_size ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _StateInitMixin:
    """Random ('kaiming_normal') or zero initial recurrent states.

    The reference draws *fresh random* initial h/c on every forward
    (nn/net_blocks.py:302-315, 391-392) — a deliberate tiny noise injection
    with std sqrt(2 / (batch * hidden)). We reproduce it via the
    'recurrent_init' rng collection; without that rng, states are zeros
    (deterministic eval / serving)."""

    def _init_states(self, module, batch_size, n_layers, hidden, with_cell=True):
        def draw(name):
            if module.state_init and 'kaiming_normal' in module.state_init \
                    and module.has_rng('recurrent_init'):
                key = module.make_rng('recurrent_init')
                std = (2.0 / (batch_size * hidden)) ** 0.5
                return std * jax.random.normal(key, (batch_size, hidden))
            return jnp.zeros((batch_size, hidden))

        if with_cell:
            return [(draw(f'h{l}'), draw(f'c{l}')) for l in range(n_layers)]
        return [draw(f'h{l}') for l in range(n_layers)]


class LSTMDecoderModule(nn.Module, _StateInitMixin):
    """Encoding -> sequence: the encoding is repeated `out_len` times as the
    LSTM input, a linear head maps hidden states to elements
    (reference: nn/net_blocks.py:363-402)."""
    encoding_size: int
    hidden_size: int
    out_elem_size: int
    n_layers: int
    out_len: int
    dropout: float = 0.0
    state_init: str = 'kaiming_normal'

    @nn.compact
    def __call__(self, encodings, out_len=None, train: bool = False):
        out_len = out_len or self.out_len
        B = encodings.shape[0]
        dec_input = jnp.repeat(encodings[:, None, :], out_len, axis=1)
        states = self._init_states(self, B, self.n_layers, self.hidden_size)
        out, _ = TorchLSTM(self.hidden_size, self.n_layers, self.dropout,
                           name='lstm')(dec_input, states, train=train)
        return nn.Dense(self.out_elem_size, name='lin')(out)


class LSTMDoubleReverseDecoderModule(nn.Module, _StateInitMixin):
    """Reverse-order decode, then a forward refinement pass with a skip
    concat of the original input (reference: nn/net_blocks.py:405-454)."""
    encoding_size: int
    hidden_size: int
    out_elem_size: int
    n_layers: int
    out_len: int
    dropout: float = 0.0
    state_init: str = 'kaiming_normal'

    @nn.compact
    def __call__(self, encodings, out_len=None, train: bool = False):
        out_len = out_len or self.out_len
        B = encodings.shape[0]
        dec_input = jnp.repeat(encodings[:, None, :], out_len, axis=1)
        states = self._init_states(self, B, self.n_layers, self.hidden_size)
        out, fin_states = TorchLSTM(self.hidden_size, self.n_layers, self.dropout,
                                    name='lstm_reverse')(dec_input, states, train=train)
        out = jnp.flip(out, axis=1)
        out = jnp.concatenate([out, dec_input], axis=-1)
        # the forward pass continues from the reverse pass's final state
        out, _ = TorchLSTM(self.hidden_size, self.n_layers, self.dropout,
                           name='lstm_forward')(out, fin_states, train=train)
        return nn.Dense(self.out_elem_size, name='lin')(out)


class GRUDecoderModule(nn.Module, _StateInitMixin):
    """GRU variant of the sequence decoder (reference: nn/net_blocks.py:457-497)."""
    encoding_size: int
    hidden_size: int
    out_elem_size: int
    n_layers: int
    out_len: int
    dropout: float = 0.0
    state_init: str = 'kaiming_normal'

    @nn.compact
    def __call__(self, encodings, out_len=None, train: bool = False):
        out_len = out_len or self.out_len
        B = encodings.shape[0]
        dec_input = jnp.repeat(encodings[:, None, :], out_len, axis=1)
        states = self._init_states(self, B, self.n_layers, self.hidden_size,
                                   with_cell=False)
        out = TorchGRU(self.hidden_size, self.n_layers, name='gru')(
            dec_input, states, train=train)
        return nn.Dense(self.out_elem_size, name='lin')(out)


class LSTMEncoderModule(nn.Module, _StateInitMixin):
    """Sequence -> encoding (last hidden state of the last layer)
    (reference: nn/net_blocks.py:336-360; unused by shipped configs)."""
    encoding_size: int
    n_layers: int
    dropout: float = 0.0
    state_init: str = 'kaiming_normal'

    @nn.compact
    def __call__(self, sequences, train: bool = False):
        B = sequences.shape[0]
        states = self._init_states(self, B, self.n_layers, self.encoding_size)
        _, fin_states = TorchLSTM(self.encoding_size, self.n_layers, self.dropout,
                                  name='lstm')(sequences, states, train=train)
        return fin_states[-1][0]


class MLPDecoder(nn.Module):
    """MLP decode of latent -> fixed-length sequence
    (reference: nn/net_blocks.py:273-298)."""
    encoding_size: int
    hidden_size: int
    out_elem_size: int
    n_layers: int
    out_len: int
    dropout: float = 0.0
    state_init: str = ''

    @nn.compact
    def __call__(self, encodings, out_len=None, train: bool = False):
        out_len = out_len or self.out_len
        sizes = [self.hidden_size * out_len] * self.n_layers \
                + [self.out_elem_size * out_len]
        out = MLP(sizes)(encodings, train=train)
        return out.reshape(encodings.shape[0], out_len, -1)


DECODER_REGISTRY = {
    'LSTMDecoderModule': LSTMDecoderModule,
    'LSTMDoubleReverseDecoderModule': LSTMDoubleReverseDecoderModule,
    'GRUDecoderModule': GRUDecoderModule,
    'MLPDecoder': MLPDecoder,
}

ENCODER_REGISTRY = {
    'EdgeConvFeatures': EdgeConvFeatures,
    'PointNetPlusPlus': PointNetPlusPlus,
    'EdgeConvPoolingFeatures': EdgeConvPoolingFeatures,
}
