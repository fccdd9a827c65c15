"""The three sweep schedules of the chunked EdgeConv training path
(ops/edgeconv_train `mode`: 'chunked' | 'fused_final' | 'streamed') are
execution strategies, not math changes: outputs, BatchNorm batch statistics,
and gradients must match the 'chunked' baseline — including negative
BatchNorm scales (the max-through-affine branch flip that 'fused_final'
relies on), ragged chunk padding, BN-less final layers, and single-layer
MLPs. docs/Roofline.md "Layer-streamed statistics"."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from garment_pattern_estimation_tpu.models.blocks import EdgeConv
from garment_pattern_estimation_tpu.ops.edgeconv_train import (
    chunked_edgeconv_train)
from garment_pattern_estimation_tpu.ops.knn import knn as knn_search

B, N, C, K = 2, 23, 5, 4    # N=23 with chunk=7 -> ragged final chunk

MODES = ('fused_final', 'streamed')


def _setup(widths=(11, 9, 7), seed=0, flip_gammas=True):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    conv = EdgeConv(list(widths), k=K, use_pallas=False)
    params = conv.init(jax.random.PRNGKey(seed), x, train=True)['params']
    mlp = jax.tree_util.tree_map(jnp.asarray, params['MLP_0'])
    if flip_gammas:
        # default BN scales are all-ones: flip signs so the a<0 branch of
        # max_k(a*h+c) = a*min_k(h)+c is actually exercised
        mlp = dict(mlp)
        for name in list(mlp):
            if name.startswith('BatchNorm'):
                bn = dict(mlp[name])
                scale = np.asarray(bn['scale'])
                signs = np.where(np.arange(scale.size) % 2 == 0, 1.0, -1.0)
                bn['scale'] = jnp.asarray(scale + 0.3) * signs
                bn['bias'] = jnp.asarray(
                    rng.normal(size=scale.shape).astype(np.float32))
                mlp[name] = bn
    idx = knn_search(x, K, use_pallas=False)
    return x, idx, mlp


def _tree_close(a, b, rtol=2e-4, atol=1e-6):
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize('aggr', ['max', 'mean', 'sum'])
@pytest.mark.parametrize('mode', MODES)
def test_forward_and_stats_match_chunked(mode, aggr):
    x, idx, mlp = _setup()
    out_ref, st_ref = chunked_edgeconv_train(x, idx, mlp, chunk=7, aggr=aggr,
                                             mode='chunked')
    out, st = chunked_edgeconv_train(x, idx, mlp, chunk=7, aggr=aggr,
                                     mode=mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=5e-6)
    _tree_close(st, st_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('mode', MODES)
def test_gradients_match_chunked(mode):
    x, idx, mlp = _setup()

    def loss(p, pts, _mode):
        out, stats = chunked_edgeconv_train(pts, idx, p, chunk=7, aggr='max',
                                            mode=_mode)
        # touch the statistics in the loss too: their VJP (the BN coupling
        # terms) must survive the schedule change, not just the output path
        stat_term = sum(jnp.sum(m) + jnp.sum(v)
                        for pair in stats if pair is not None
                        for m, v in [pair])
        return jnp.sum(out ** 2) / out.size + 0.01 * stat_term

    g_ref = jax.grad(lambda p, pts: loss(p, pts, 'chunked'),
                     argnums=(0, 1))(mlp, x)
    g = jax.grad(lambda p, pts: loss(p, pts, mode), argnums=(0, 1))(mlp, x)
    _tree_close(g, g_ref, rtol=3e-4, atol=2e-6)


def test_negative_gamma_branch_is_exercised_and_exact():
    """With an all-negative final BN scale, fused_final must route the
    aggregation through min_k — identical to chunked's max over BN'd
    values."""
    x, idx, mlp = _setup(flip_gammas=False)
    mlp = dict(mlp)
    last = sorted(n for n in mlp if n.startswith('BatchNorm'))[-1]
    bn = dict(mlp[last])
    bn['scale'] = -jnp.abs(jnp.asarray(bn['scale'])) - 0.5
    mlp[last] = bn
    out_ref, _ = chunked_edgeconv_train(x, idx, mlp, chunk=7, mode='chunked')
    for mode in MODES:
        out, _ = chunked_edgeconv_train(x, idx, mlp, chunk=7, mode=mode)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                                   rtol=1e-5, atol=5e-6)


@pytest.mark.parametrize('mode', MODES)
def test_bnless_final_layer_falls_back_exactly(mode):
    """A hand-built MLP whose final layer has no BatchNorm: 'fused_final'
    has no statistics sweep to ride (falls back to the chunked final
    sweep); 'streamed' still streams. Both must equal 'chunked'."""
    rng = np.random.default_rng(3)
    mlp = {
        'Dense_0': {'kernel': jnp.asarray(
            rng.normal(size=(2 * C, 8)).astype(np.float32) * 0.3),
            'bias': jnp.asarray(rng.normal(size=8).astype(np.float32))},
        'BatchNorm_0': {'scale': jnp.asarray(
            (rng.normal(size=8) * 0.5).astype(np.float32)),
            'bias': jnp.zeros(8, jnp.float32)},
        'Dense_1': {'kernel': jnp.asarray(
            rng.normal(size=(8, 6)).astype(np.float32) * 0.3),
            'bias': jnp.asarray(rng.normal(size=6).astype(np.float32))},
    }
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    idx = knn_search(x, K, use_pallas=False)
    out_ref, st_ref = chunked_edgeconv_train(x, idx, mlp, chunk=7,
                                             mode='chunked')
    out, st = chunked_edgeconv_train(x, idx, mlp, chunk=7, mode=mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=5e-6)
    assert st[1] is None and st_ref[1] is None
    _tree_close(st[0], st_ref[0], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('mode', MODES)
def test_single_layer_mlp(mode):
    x, idx, mlp = _setup(widths=(9,))
    out_ref, _ = chunked_edgeconv_train(x, idx, mlp, chunk=7, mode='chunked')
    out, _ = chunked_edgeconv_train(x, idx, mlp, chunk=7, mode=mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=5e-6)


def test_unknown_mode_rejected():
    x, idx, mlp = _setup(widths=(9,))
    with pytest.raises(ValueError, match='train mode'):
        chunked_edgeconv_train(x, idx, mlp, chunk=7, mode='warp')


def test_module_level_streamed_matches_unfused():
    """EdgeConv(train_mode='streamed', train_chunked=True) against the
    unfused reference-semantics path: outputs + running-stat updates +
    gradients (the same bar the chunked path passes in
    test_edgeconv_train.py)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(3, 40, 6)).astype(np.float32))
    conv_ref = EdgeConv([16, 12], k=4, use_pallas=False, train_chunked=False)
    variables = conv_ref.init(jax.random.PRNGKey(0), x, train=True)
    conv_str = EdgeConv([16, 12], k=4, use_pallas=False, train_chunked=True,
                        train_chunk_size=16, train_mode='streamed')

    out_ref, mut_ref = conv_ref.apply(variables, x, train=True,
                                      mutable=['batch_stats'])
    out_str, mut_str = conv_str.apply(variables, x, train=True,
                                      mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(out_str), np.asarray(out_ref),
                               rtol=1e-5, atol=5e-6)
    _tree_close(mut_str['batch_stats'], mut_ref['batch_stats'],
                rtol=1e-5, atol=1e-6)

    def loss(conv, p, pts):
        out, _ = conv.apply({'params': p,
                             'batch_stats': variables['batch_stats']},
                            pts, train=True, mutable=['batch_stats'])
        return jnp.sum(out ** 2) / out.size

    g_ref = jax.grad(lambda p, pts: loss(conv_ref, p, pts),
                     argnums=(0, 1))(variables['params'], x)
    g_str = jax.grad(lambda p, pts: loss(conv_str, p, pts),
                     argnums=(0, 1))(variables['params'], x)
    _tree_close(g_str, g_ref, rtol=2e-4, atol=1e-6)


def test_nn_config_mode_knob_plumbs_through():
    """NN.edgeconv_train_mode reaches the EdgeConv modules and persists in
    the merged config (so load_model rebuilds the same schedule)."""
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
                        {'edgeconv_train_mode': 'streamed', 'EConv_hidden': 8,
                         'EConv_feature': 8, 'panel_encoding_size': 8,
                         'panel_hidden_size': 8, 'panel_n_layers': 1},
                        {'loss_components': ['shape']})
    assert model.module.edgeconv_train_mode == 'streamed'
    assert model.config['edgeconv_train_mode'] == 'streamed'
    encoder = model.module.bind(
        model.init_variables(
            jax.random.PRNGKey(0), np.zeros((2, 16, 3), 'float32'))).encoder
    assert encoder.train_mode == 'streamed'
    # default is the exact, memory-neutral fused_final schedule
    model_def = build_model('GarmentSegmentPattern3D', data_config,
                            {'EConv_hidden': 8, 'EConv_feature': 8,
                             'panel_encoding_size': 8, 'panel_hidden_size': 8,
                             'panel_n_layers': 1},
                            {'loss_components': ['shape']})
    assert model_def.config['edgeconv_train_mode'] == 'fused_final'


@pytest.mark.parametrize('mode', ('chunked',) + MODES)
def test_bf16_chunked_matches_unfused_bf16(mode):
    """compute_dtype='bfloat16' now reaches the chunked path (previously it
    forced the unfused path, which OOMs at stress scale): bf16 sweep
    matmuls + f32 statistics must track the unfused mixed-precision path
    within bf16 rounding."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(3, 40, 6)).astype(np.float32))
    conv_ref = EdgeConv([16, 12], k=4, use_pallas=False,
                        compute_dtype='bfloat16', train_chunked=False)
    variables = conv_ref.init(jax.random.PRNGKey(0), x, train=True)
    conv_chk = EdgeConv([16, 12], k=4, use_pallas=False,
                        compute_dtype='bfloat16', train_chunked=True,
                        train_chunk_size=16, train_mode=mode)

    out_ref, mut_ref = conv_ref.apply(variables, x, train=True,
                                      mutable=['batch_stats'])
    out_chk, mut_chk = conv_chk.apply(variables, x, train=True,
                                      mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(out_chk, np.float32),
                               np.asarray(out_ref, np.float32),
                               rtol=3e-2, atol=3e-2)
    _tree_close(mut_chk['batch_stats'], mut_ref['batch_stats'],
                rtol=3e-2, atol=3e-2)
    # and against the exact f32 unfused path: bf16 rounding, nothing worse
    conv_f32 = EdgeConv([16, 12], k=4, use_pallas=False, train_chunked=False)
    out_f32, _ = conv_f32.apply(variables, x, train=True,
                                mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(out_chk, np.float32),
                               np.asarray(out_f32), rtol=5e-2, atol=5e-2)

    def loss(conv, p):
        out, _ = conv.apply({'params': p,
                             'batch_stats': variables['batch_stats']},
                            x, train=True, mutable=['batch_stats'])
        return jnp.sum(out.astype(jnp.float32) ** 2) / out.size

    g_ref = jax.grad(lambda p: loss(conv_ref, p))(variables['params'])
    g_chk = jax.grad(lambda p: loss(conv_chk, p))(variables['params'])
    _tree_close(g_chk, g_ref, rtol=1.5e-1, atol=3e-2)
