"""Memory-bounded TRAINING path for dynamic EdgeConv: chunked, rematerialized,
fully differentiable — the (B, N, k, C) gathered-neighbor tensor and the
(B, N, k, H) edge-MLP intermediates never exist.

The eval path fuses the whole layer in Pallas (ops/edgeconv.py). Training
additionally needs (a) BatchNorm statistics over ALL edge rows — which couple
every chunk, and (b) gradients. This module re-expresses the layer as L+1
sweeps over query chunks (reference layer semantics:
nn/net_blocks.py:124-135 edge MLP on [x_i ; x_j - x_i] + max aggregation,
:43-47 Dense->ReLU->BN ordering):

  sweep l (l = 0..L-1): recompute layers 0..l-1 per chunk with the already
      -known batch statistics, accumulate sum / sum-of-squares of
      relu(z_l) -> (mean_l, var_l). Layer l+1's input depends on BN_l's
      output, so statistics are inherently sequential in l.
  final sweep: apply all layers with the global statistics, max over the
      k neighbor slots.

Every sweep is a `lax.scan` whose body is `jax.checkpoint`ed: forward keeps
only the per-chunk outputs (and O(C) stat partials), backward recomputes the
chunk intermediates. Peak memory is O(B * chunk * k * C) instead of
O(B * N * k * C) — at the 128 x 10k stress config that is the difference
between ~200 MB in flight and a 9.8 GB HBM OOM.

Autodiff handles the BN-statistics coupling exactly: (mean_l, var_l) are
differentiable functions of the weights/inputs, so the backward pass gets
the full training-mode BatchNorm gradient (including the stat terms) without
a hand-written VJP.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _default_chunk(B, N, k, widest):
    """Default query-chunk width: size chunks so the WIDEST per-edge tensor
    (gathered neighbors C or any MLP hidden width — the 2C edge concat never
    materializes with the factored first layer) stays ~1 GB per sweep step.

    The target was swept on-chip at the 128x10k stress config
    (parity_run/chunk_sweep.json, docs/Roofline.md): ~2048-wide chunks beat
    the old 256 MB target's ~524-wide chunks by 4% (4.37 s vs 4.56 s) —
    fewer sweep steps amortize the per-chunk dispatch; the rematerialized
    backward keeps only a handful of these live concurrently.
    """
    per_row = B * k * widest * 4
    return max(32, min(N, (1 << 30) // max(per_row, 1)))


def _layer_params(mlp_params):
    """[(W, b, gamma, beta)] per layer from an MLP variable subtree
    (params collection: Dense_i / BatchNorm_i, models/blocks.MLP)."""
    layers = []
    i = 0
    while f'Dense_{i}' in mlp_params:
        dense = mlp_params[f'Dense_{i}']
        bn = mlp_params.get(f'BatchNorm_{i}')
        layers.append((dense['kernel'], dense['bias'],
                       None if bn is None else bn['scale'],
                       None if bn is None else bn['bias']))
        i += 1
    return layers


def _apply_layers(edge_pair, layers, stats, upto, eps, final_relu_only=False,
                  dtype=None):
    """Layers [0, upto): Dense -> ReLU -> BN with the given global stats.
    When `final_relu_only`, layer upto-1 stops after ReLU (its statistics
    are what the caller is accumulating).

    `edge_pair` is the (center (B, c, C), neighbors (B, c, k, C)) factored
    form of the EdgeConv input: layer 0 computes
    concat(c, n - c) @ W = c @ (W_top - W_bot) + b + n @ W_bot, so the
    center term is one narrow matmul per chunk row and the (B, c, k, 2C)
    concatenated edge tensor never materializes in any sweep (mirrors
    models/blocks.MLP edge_pair mode).

    `dtype` (e.g. bf16) runs the matmuls/ReLU at that precision on the MXU;
    BatchNorm normalization stays f32 — the same split as the unfused
    mixed-precision path (models/blocks.MLP: bf16 layer math, explicit f32
    statistics reductions)."""
    center, nbr = edge_pair
    if dtype is not None:
        center, nbr = center.astype(dtype), nbr.astype(dtype)
    h = None
    for l in range(upto):
        W, b, gamma, beta = layers[l]
        if dtype is not None:
            W, b = W.astype(dtype), b.astype(dtype)
        if l == 0:
            C = center.shape[-1]
            point_term = center @ (W[:C] - W[C:]) + b           # (B, c, H)
            h = jnp.maximum(point_term[:, :, None, :] + nbr @ W[C:], 0.0)
        else:
            if dtype is not None:
                h = h.astype(dtype)
            h = jnp.maximum(h @ W + b, 0.0)
        if final_relu_only and l == upto - 1:
            return h
        if gamma is not None:
            mean, var = stats[l]
            h = (h.astype(jnp.float32) - mean) \
                * jax.lax.rsqrt(var + eps) * gamma + beta
    return h


def chunked_edgeconv_train(x, idx, mlp_params, *, eps=1e-5, chunk=None,
                           aggr='max', mode='chunked', compute_dtype=None):
    """EdgeConv training forward with global BatchNorm batch statistics,
    computed in O(B * chunk * k * C) memory.

    Args:
      x: (B, N, C) point features.
      idx: (B, N, k) neighbor indices, slot 0 = self (ops/knn semantics).
      mlp_params: the layer's MLP params subtree (Dense_i / BatchNorm_i).
      chunk: queries per sweep step (default: whole N in one chunk when
        it is small, else ~512 padded to a divisor of N).
      mode: execution strategy — identical math, different sweep schedules
        (docs/Roofline.md "Layer-streamed statistics"):
        * 'chunked': L statistics sweeps + a full final sweep (the round-4
          baseline). Lowest memory, O(L^2) layer recomputes.
        * 'fused_final': elides the final sweep. BatchNorm is a per-channel
          affine a*h + c with a = gamma*rsqrt(var+eps), and max_k commutes
          with it branchwise — max_k(a*h+c) = a*max_k(h)+c when a>0 and
          a*min_k(h)+c when a<0 (mean/sum commute unconditionally) — so the
          LAST statistics sweep also emits per-chunk max/min of the final
          pre-BN activations and the output is a tiny elementwise combine.
          Exact; no extra memory.
        * 'streamed': 'fused_final' plus the sweep for layer L-2 stores its
          post-ReLU activations (the scan's stacked ys, (B, N, k, H)), so
          the last statistics sweep reads the buffer instead of recomputing
          layers 0..L-2 per chunk. Exact; costs one (B, N, k, H) HBM buffer
          (kept live for the backward pass) — at the 128x10k stress config
          ~5.2 GB f32, the reason this is a mode and not the default.
      compute_dtype: e.g. 'bfloat16' — layer matmuls/ReLU at that precision
        on the MXU, statistics accumulation and BatchNorm normalization in
        f32 (mirrors the unfused mixed-precision path, models/blocks.MLP).
    Returns (out (B, N, F), [(mean_l, var_l)] per layer) — both
    differentiable; statistics are biased (flax BatchNorm semantics).
    """
    B, N, C = x.shape
    k = idx.shape[-1]
    layers = _layer_params(mlp_params)
    L = len(layers)
    cdtype = jnp.dtype(compute_dtype) if compute_dtype else None

    if chunk is None:
        widest = max([C] + [w.shape[1] for w, *_ in layers])
        chunk = _default_chunk(B, N, k, widest)
    chunk = min(chunk, N)
    pad = (-N) % chunk
    if pad:
        # padded queries gather real rows but are excluded from statistics
        # by masking and sliced off the output
        x_q = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0)))
    else:
        x_q = x
    n_chunks = (N + pad) // chunk
    starts = jnp.arange(n_chunks) * chunk

    def chunk_valid(start):
        rows = start + jnp.arange(chunk)
        return (rows < N)[None, :, None, None]                # (1, c, 1, 1)

    # x for gathering must be the UNpadded rows (idx targets < N); the
    # padded query rows only exist on the query side
    def edges_at(start):
        idx_c = jax.lax.dynamic_slice_in_dim(idx, start, chunk, axis=1)
        nbr = jnp.take_along_axis(x[:, :, None, :], idx_c[..., None], axis=1)
        center = jax.lax.dynamic_slice_in_dim(x_q, start, chunk, axis=1)
        return center, nbr                       # factored: see _apply_layers

    if mode not in ('chunked', 'fused_final', 'streamed'):
        raise ValueError(f'unknown EdgeConv train mode {mode!r}')
    if mode == 'fused_final' and layers[-1][2] is None:
        # no statistics sweep for the last layer to ride — keep the plain
        # final sweep (streamed runs its own buffer-fed final sweep instead)
        mode = 'chunked'
    fuse = mode in ('fused_final', 'streamed')
    buf_layer = L - 2 if (mode == 'streamed' and L >= 2) else None

    count = B * N * k
    stats = []
    h_buf = None      # streamed: stacked post-ReLU chunks of layer L-2
    final_agg = None  # fused: per-chunk pre-BN aggregates of layer L-1
    for l in range(L):
        need_stats = layers[l][2] is not None
        produce_buf = l == buf_layer
        is_final = fuse and l == L - 1
        if not (need_stats or produce_buf or is_final):
            stats.append(None)
            continue

        def sweep_body(carry, xs, _l=l, _need=need_stats,
                       _produce=produce_buf, _final=is_final):
            s1, s2 = carry
            if buf_layer is not None and _l == L - 1:
                # streamed final sweep: BN_{L-2}(stored buffer) -> layer L-1
                start, h_prev = xs
                gp, bp = layers[buf_layer][2], layers[buf_layer][3]
                if gp is not None:
                    m, v = stats[buf_layer]
                    h_prev = (h_prev.astype(jnp.float32) - m) \
                        * jax.lax.rsqrt(v + eps) * gp + bp
                Wl, bl = layers[_l][0], layers[_l][1]
                if cdtype is not None:
                    h_prev, Wl, bl = (h_prev.astype(cdtype),
                                      Wl.astype(cdtype), bl.astype(cdtype))
                a = jnp.maximum(h_prev @ Wl + bl, 0.0)
            else:
                start = xs
                a = _apply_layers(edges_at(start), layers, stats, _l + 1,
                                  eps, final_relu_only=True, dtype=cdtype)
            if _need:
                av = jnp.where(chunk_valid(start),
                               a.astype(jnp.float32), 0.0)
                carry = (s1 + jnp.sum(av, axis=(0, 1, 2)),
                         s2 + jnp.sum(av * av, axis=(0, 1, 2)))
            if _final:
                if aggr == 'max':
                    ys = (jnp.max(a, axis=2), jnp.min(a, axis=2))
                elif aggr == 'mean':
                    ys = jnp.mean(a, axis=2)
                else:
                    ys = jnp.sum(a, axis=2)
            elif _produce:
                ys = a
            else:
                ys = None
            return carry, ys

        width = layers[l][0].shape[1]
        xs = (starts, h_buf) if (buf_layer is not None and l == L - 1) \
            else starts
        (s1, s2), ys = jax.lax.scan(
            jax.checkpoint(sweep_body),
            (jnp.zeros(width, jnp.float32), jnp.zeros(width, jnp.float32)),
            xs)
        if need_stats:
            mean = s1 / count
            # E[a^2] - E[a]^2, clamped like flax BatchNorm's biased estimator
            var = jnp.maximum(s2 / count - mean * mean, 0.0)
            stats.append((mean, var))
        else:
            stats.append(None)
        if is_final:
            final_agg = ys
        elif produce_buf:
            h_buf = ys

    if fuse:
        # BN_{L-1} is a per-channel affine a*h + c; apply it AFTER the
        # k-aggregation (exact: max_k commutes branchwise on sign(a),
        # mean/sum commute unconditionally)
        gamma, beta = layers[-1][2], layers[-1][3]
        if gamma is not None:
            m, v = stats[-1]
            a_aff = gamma * jax.lax.rsqrt(v + eps)
            c_aff = beta - m * a_aff
        else:
            width = layers[-1][0].shape[1]
            a_aff = jnp.ones(width, jnp.float32)
            c_aff = jnp.zeros(width, jnp.float32)
        final_agg = jax.tree_util.tree_map(
            lambda t: t.astype(jnp.float32), final_agg)
        if aggr == 'max':
            mx, mn = final_agg
            outs = jnp.where(a_aff > 0, mx * a_aff + c_aff,
                             mn * a_aff + c_aff)
        elif aggr == 'mean':
            outs = final_agg * a_aff + c_aff
        else:  # sum: the affine constant adds once per neighbor slot
            outs = final_agg * a_aff + k * c_aff
        return jnp.moveaxis(outs, 0, 1).reshape(B, N + pad, -1)[:, :N], stats

    def out_body(_, start):
        h = _apply_layers(edges_at(start), layers, stats, L, eps,
                          dtype=cdtype)
        if aggr == 'max':
            return None, jnp.max(h, axis=2)
        if aggr == 'mean':
            return None, jnp.mean(h, axis=2)
        return None, jnp.sum(h, axis=2)

    _, outs = jax.lax.scan(jax.checkpoint(out_body), None, starts)
    out = jnp.moveaxis(outs, 0, 1).reshape(B, N + pad, -1)[:, :N]
    return out, stats
