"""Measured bound for the rejected fused train-mode MLP+gather kernel
(docs/Roofline.md "What a further 2x on the training step would take";
VERDICT r4 #8 asked for the measurement to be committed).

The proposal: fuse the edge-MLP (+ two-pass BatchNorm statistics + a
hand-written VJP through the statistics coupling) into the gather kernel so
the per-sweep hidden activations never round-trip HBM. Its achievable win is
bounded above by an ablation that makes the L statistics sweeps FREE: run
the chunked training step with the statistics replaced by constants (one
final sweep only, still fully differentiable). A real fused kernel still
pays the final sweep's gather + matmuls + max — so
    time(current) - time(no-stat-sweeps)
is an upper bound on what the hand-derived fusion could save; the Roofline
paragraph's "bounded at ~20-25%" claim is auditable against it.

Run on the TPU (the chunked path only engages at stress scale):
    python parity_run/fused_mlp_ablation.py
Writes parity_run/fused_mlp_ablation.json.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def no_stat_sweep_variant(x, idx, mlp_params, *, eps=1e-5, chunk=None,
                          aggr='max'):
    """chunked_edgeconv_train with the L statistics sweeps elided: BN uses
    constant (0, 1) statistics. NOT a training-correct path — a timing
    ablation that models 'statistics for free', the best case of the fused
    two-pass kernel."""
    from garment_pattern_estimation_tpu.ops.edgeconv_train import (
        _layer_params, _apply_layers, _default_chunk)

    B, N, C = x.shape
    k = idx.shape[-1]
    layers = _layer_params(mlp_params)
    L = len(layers)
    stats = [None if layers[l][2] is None else
             (jnp.zeros(layers[l][0].shape[1], jnp.float32),
              jnp.ones(layers[l][0].shape[1], jnp.float32))
             for l in range(L)]

    if chunk is None:
        widest = max([C] + [w.shape[1] for w, *_ in layers])
        chunk = _default_chunk(B, N, k, widest)
    chunk = min(chunk, N)
    pad = (-N) % chunk
    x_q = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    idx_p = jnp.pad(idx, ((0, 0), (0, pad), (0, 0))) if pad else idx
    starts = jnp.arange((N + pad) // chunk) * chunk

    def edges_at(start):
        idx_c = jax.lax.dynamic_slice_in_dim(idx_p, start, chunk, axis=1)
        nbr = jnp.take_along_axis(x[:, :, None, :], idx_c[..., None], axis=1)
        center = jax.lax.dynamic_slice_in_dim(x_q, start, chunk, axis=1)
        return center, nbr

    def out_body(_, start):
        h = _apply_layers(edges_at(start), layers, stats, L, eps)
        if aggr == 'max':
            return None, jnp.max(h, axis=2)
        if aggr == 'mean':
            return None, jnp.mean(h, axis=2)
        return None, jnp.sum(h, axis=2)

    _, outs = jax.lax.scan(jax.checkpoint(out_body), None, starts)
    out = jnp.moveaxis(outs, 0, 1).reshape(B, N + pad, -1)[:, :N]
    return out, stats


def main():
    import bench
    import garment_pattern_estimation_tpu.models.blocks as blocks

    print(f'backend: {jax.default_backend()}')
    results = {'backend': jax.default_backend()}

    print('current chunked training step (stress 128x10k, 3 steps)...')
    current = bench.measure_train_step(batch=128, num_points=10000, steps=3)
    results['stress_train_step_ms'] = current

    print('ablation: statistics sweeps elided...')
    orig = blocks.chunked_edgeconv_train
    blocks.chunked_edgeconv_train = no_stat_sweep_variant
    try:
        ablated = bench.measure_train_step(batch=128, num_points=10000,
                                           steps=3)
    finally:
        blocks.chunked_edgeconv_train = orig
    results['stress_train_step_no_stat_sweeps_ms'] = ablated

    win = (current - ablated) / current
    results['stat_sweep_share_of_step'] = round(win, 4)
    results['note'] = (
        'upper bound of the fused MLP+gather train kernel: it can at best '
        'make the statistics sweeps free; the final sweep (gather + MLP + '
        'max) remains. share = (current - ablated) / current.')
    out = Path(__file__).parent / 'fused_mlp_ablation.json'
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
