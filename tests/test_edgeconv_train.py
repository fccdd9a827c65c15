"""Chunked rematerialized EdgeConv training path (ops/edgeconv_train) vs the
reference-semantics unfused path: outputs, BatchNorm running-stat updates,
and GRADIENTS (params and inputs) must match — the chunking is a memory
optimization, not a semantics change."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from garment_pattern_estimation_tpu.models.blocks import EdgeConv

B, N, C = 3, 40, 6


@pytest.fixture()
def x(rng):
    return jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))


def _conv(chunked, chunk=None):
    return EdgeConv([16, 12], k=4, use_pallas=False,
                    train_chunked=chunked, train_chunk_size=chunk)


def _run(conv, variables, x):
    return conv.apply(variables, x, train=True, mutable=['batch_stats'])


def test_forward_and_stats_match_unfused(x):
    conv_ref = _conv(False)
    variables = conv_ref.init(jax.random.PRNGKey(0), x, train=True)

    out_ref, mut_ref = _run(conv_ref, variables, x)
    out_chk, mut_chk = _run(_conv(True, chunk=16), variables, x)

    np.testing.assert_allclose(np.asarray(out_chk), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)
    ref_stats = jax.tree_util.tree_leaves(mut_ref['batch_stats'])
    chk_stats = jax.tree_util.tree_leaves(mut_chk['batch_stats'])
    for a, b in zip(chk_stats, ref_stats):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_uneven_chunking_matches(x):
    """N=40 with chunk=16 -> padded final chunk: padded rows must not leak
    into statistics or outputs. atol sits just above f32 reassociation
    noise: the unfused path's factored first layer (MLP edge_pair mode)
    sums the same products in a different order than the chunked sweeps."""
    conv_ref = _conv(False)
    variables = conv_ref.init(jax.random.PRNGKey(1), x, train=True)
    out_ref, mut_ref = _run(conv_ref, variables, x)
    out_chk, mut_chk = _run(_conv(True, chunk=16), variables, x)
    np.testing.assert_allclose(np.asarray(out_chk), np.asarray(out_ref),
                               rtol=1e-5, atol=5e-6)
    np.testing.assert_allclose(
        np.asarray(mut_chk['batch_stats']['MLP_0']['BatchNorm_1']['var']),
        np.asarray(mut_ref['batch_stats']['MLP_0']['BatchNorm_1']['var']),
        rtol=1e-5)


def test_gradients_match_unfused(x):
    conv_ref = _conv(False)
    variables = conv_ref.init(jax.random.PRNGKey(2), x, train=True)
    params = variables['params']
    stats = variables['batch_stats']

    def loss(conv, p, pts):
        out, _ = conv.apply({'params': p, 'batch_stats': stats}, pts,
                            train=True, mutable=['batch_stats'])
        return jnp.sum(out ** 2) / out.size

    g_ref_p, g_ref_x = jax.grad(
        lambda p, pts: loss(conv_ref, p, pts), argnums=(0, 1))(params, x)
    g_chk_p, g_chk_x = jax.grad(
        lambda p, pts: loss(_conv(True, chunk=16), p, pts),
        argnums=(0, 1))(params, x)

    for a, b in zip(jax.tree_util.tree_leaves(g_chk_p),
                    jax.tree_util.tree_leaves(g_ref_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_chk_x), np.asarray(g_ref_x),
                               rtol=2e-4, atol=1e-6)


def test_auto_policy_picks_chunked_only_when_big():
    small = EdgeConv([8], k=3, use_pallas=False)
    # widest per-edge tensor with the factored first layer is max(C, MLP
    # widths) — tiny input stays unfused, the stress config goes chunked
    assert (B * N * 3 * max(C, 8) * 4) < EdgeConv._CHUNK_TRAIN_BYTES
    big_edges = 128 * 10000 * 5 * max(150, 200) * 4
    assert big_edges > EdgeConv._CHUNK_TRAIN_BYTES


def test_nn_config_chunk_knob_plumbs_through():
    """NN.edgeconv_train_chunk reaches the EdgeConv modules (the stress
    -scale sweep knob; chunk-size invariance itself is tested above)."""
    from garment_pattern_estimation_tpu.models import build_model

    data_config = {'element_size': 4, 'max_panel_len': 6, 'max_pattern_len': 5,
                   'rotation_size': 4, 'translation_size': 3,
                   'standardize': {'gt_shift': {'outlines': [0.0] * 4,
                                                'rotations': [0.0] * 4,
                                                'translations': [0.0] * 3},
                                   'gt_scale': {'outlines': [1.0] * 4,
                                                'rotations': [1.0] * 4,
                                                'translations': [1.0] * 3}}}
    model = build_model('GarmentSegmentPattern3D', data_config,
                        {'edgeconv_train_chunk': 384, 'EConv_hidden': 8,
                         'EConv_feature': 8, 'panel_encoding_size': 8,
                         'panel_hidden_size': 8, 'panel_n_layers': 1},
                        {'loss_components': ['shape']})
    assert model.module.edgeconv_train_chunk == 384
    # the attribute reaches the encoder submodule (flax requires a scope to
    # build it, so construct the encoder spec via a bound clone)
    encoder = model.module.bind(
        model.init_variables(
            __import__('jax').random.PRNGKey(0),
            __import__('numpy').zeros((2, 16, 3), 'float32'))).encoder
    assert encoder.train_chunk_size == 384


def test_default_chunk_matches_swept_target():
    """The default chunk heuristic targets ~1 GB of widest per-edge tensor
    per sweep step — the on-chip swept optimum for the 128x10k stress
    config (parity_run/chunk_sweep.json, docs/Roofline.md). Locks the
    heuristic so a refactor cannot silently regress the swept 4.4 s step."""
    from garment_pattern_estimation_tpu.ops.edgeconv_train import _default_chunk

    # stress config: B=128, N=10000, k=5, widest MLP width 200
    chunk = _default_chunk(128, 10000, 5, 200)
    assert 1024 <= chunk <= 2560, chunk          # swept-best neighborhood
    assert chunk * 128 * 5 * 200 * 4 <= (1 << 30)  # <= 1 GB per sweep
    # small shapes: whole N in one chunk
    assert _default_chunk(2, 128, 5, 64) == 128
    # floor: never below 32 even at absurd widths
    assert _default_chunk(4096, 100000, 40, 4096) == 32
