"""Numerical parity of the scanned LSTM/GRU cells vs torch.nn.LSTM/GRU with
identical (imported) weights — the exact contract the .pth shape-model import
relies on (gate order i,f,g,o / r,z,n and torch weight layout)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from garment_pattern_estimation_tpu.models.blocks import TorchLSTM, TorchGRU

B, T, C, H, LAYERS = 3, 5, 7, 11, 2


def _lstm_params_from_torch(lstm):
    params = {}
    for layer in range(lstm.num_layers):
        params[f'l{layer}_w_ih'] = jnp.asarray(
            getattr(lstm, f'weight_ih_l{layer}').detach().numpy())
        params[f'l{layer}_w_hh'] = jnp.asarray(
            getattr(lstm, f'weight_hh_l{layer}').detach().numpy())
        params[f'l{layer}_b_ih'] = jnp.asarray(
            getattr(lstm, f'bias_ih_l{layer}').detach().numpy())
        params[f'l{layer}_b_hh'] = jnp.asarray(
            getattr(lstm, f'bias_hh_l{layer}').detach().numpy())
    return params


def test_lstm_matches_torch():
    import torch
    torch.manual_seed(0)
    lstm = torch.nn.LSTM(C, H, LAYERS, batch_first=True)
    x = torch.randn(B, T, C)
    h0 = torch.zeros(LAYERS, B, H)
    c0 = torch.zeros(LAYERS, B, H)
    with torch.no_grad():
        out_torch, _ = lstm(x, (h0, c0))

    module = TorchLSTM(hidden_size=H, n_layers=LAYERS)
    params = _lstm_params_from_torch(lstm)
    init_states = [(jnp.zeros((B, H)), jnp.zeros((B, H))) for _ in range(LAYERS)]
    out_jax, _ = module.apply({'params': params}, jnp.asarray(x.numpy()), init_states)

    np.testing.assert_allclose(np.asarray(out_jax), out_torch.numpy(),
                               atol=5e-4, rtol=5e-3)


def test_gru_matches_torch():
    import torch
    torch.manual_seed(1)
    gru = torch.nn.GRU(C, H, LAYERS, batch_first=True)
    x = torch.randn(B, T, C)
    h0 = torch.zeros(LAYERS, B, H)
    with torch.no_grad():
        out_torch, _ = gru(x, h0)

    module = TorchGRU(hidden_size=H, n_layers=LAYERS)
    params = _lstm_params_from_torch(gru)
    init_states = [jnp.zeros((B, H)) for _ in range(LAYERS)]
    out_jax = module.apply({'params': params}, jnp.asarray(x.numpy()), init_states)

    # formula parity is exact in f64 (1e-16); f32 drift is torch-vs-XLA
    # transcendental approximations compounding over layers/steps
    np.testing.assert_allclose(np.asarray(out_jax), out_torch.numpy(),
                               atol=2e-3, rtol=2e-2)


def test_shape_model_pth_import_roundtrip(tmp_path):
    """Fabricate a shape-model .pth with the reference's exact key scheme and
    check it loads into the attention model and runs."""
    import torch
    from garment_pattern_estimation_tpu.experiment import import_shape_model
    from garment_pattern_estimation_tpu.models import build_model

    torch.manual_seed(2)
    econv_feat, att_in, enc = 10, 13, 16  # att_in = feat + 3 (skip connections)
    P, L = 5, 6
    sd = {}

    def mlp_keys(prefix, sizes):
        for i, (cin, cout) in enumerate(zip(sizes[:-1], sizes[1:])):
            sd[f'{prefix}.{i}.0.weight'] = torch.randn(cout, cin)
            sd[f'{prefix}.{i}.0.bias'] = torch.randn(cout)
            sd[f'{prefix}.{i}.2.weight'] = torch.rand(cout) + 0.5
            sd[f'{prefix}.{i}.2.bias'] = torch.randn(cout) * 0.1
            sd[f'{prefix}.{i}.2.running_mean'] = torch.randn(cout) * 0.1
            sd[f'{prefix}.{i}.2.running_var'] = torch.rand(cout) + 0.5
            sd[f'{prefix}.{i}.2.num_batches_tracked'] = torch.tensor(0)

    def lstm_keys(prefix, in_size, hidden, layers):
        for k in range(layers):
            cin = in_size if k == 0 else hidden
            sd[f'{prefix}.weight_ih_l{k}'] = torch.randn(4 * hidden, cin) * 0.1
            sd[f'{prefix}.weight_hh_l{k}'] = torch.randn(4 * hidden, hidden) * 0.1
            sd[f'{prefix}.bias_ih_l{k}'] = torch.randn(4 * hidden) * 0.1
            sd[f'{prefix}.bias_hh_l{k}'] = torch.randn(4 * hidden) * 0.1

    mlp_keys('feature_extractor.conv_layers.0.nn', [2 * 3, 12, 12, econv_feat])
    mlp_keys('point_segment_mlp.0', [att_in, att_in, att_in, P])
    sd['panel_dec_lin.weight'] = torch.randn(enc, att_in)
    sd['panel_dec_lin.bias'] = torch.randn(enc)
    lstm_keys('panel_decoder.lstm', enc, enc, 1)
    sd['panel_decoder.lin.weight'] = torch.randn(4 + 3 + 1, enc)
    sd['panel_decoder.lin.bias'] = torch.randn(8)
    sd['placement_decoder.weight'] = torch.randn(7, enc)
    sd['placement_decoder.bias'] = torch.randn(7)

    pth = tmp_path / 'shape.pth'
    torch.save({'epoch': 12, 'model_state_dict':
                {'module.' + k: v for k, v in sd.items()}}, pth)

    ckpt = import_shape_model(pth)
    assert ckpt['epoch'] == 12
    variables = ckpt['variables']

    data_config = {
        'element_size': 4, 'rotation_size': 4, 'translation_size': 3,
        'max_panel_len': L, 'max_pattern_len': P, 'max_num_stitches': 4,
        'explicit_stitch_tags': False,
        'standardize': {'gt_shift': {'outlines': [0, 0, 0, 0],
                                     'rotations': [0, 0, 0, 0],
                                     'translations': [0, 0, 0],
                                     'stitch_tags': [0, 0, 0]},
                        'gt_scale': {'outlines': [1, 1, 1, 1],
                                     'rotations': [1, 1, 1, 1],
                                     'translations': [1, 1, 1],
                                     'stitch_tags': [1, 1, 1]}},
    }
    nn_config = {
        'panel_encoding_size': enc, 'panel_hidden_size': enc, 'panel_n_layers': 1,
        'pattern_encoding_size': enc, 'pattern_hidden_size': enc,
        'EConv_hidden': 12, 'EConv_feature': econv_feat, 'EConv_hidden_depth': 2,
        'conv_depth': 1, 'k_neighbors': 4, 'skip_connections': True,
        'global_pool': 'mean', 'local_attention': True,
    }
    model = build_model('GarmentSegmentPattern3D', data_config, nn_config,
                        {'panel_order_inariant_loss': False,
                         'panel_origin_invariant_loss': False},
                        use_pallas=False)

    # imported variables must structurally match a fresh init
    fresh = model.init_variables(jax.random.PRNGKey(0),
                                 jnp.zeros((2, 40, 3), jnp.float32))
    fresh_paths = {jax.tree_util.keystr(p)
                   for p, _ in jax.tree_util.tree_flatten_with_path(fresh['params'])[0]}
    imported_paths = {jax.tree_util.keystr(p)
                      for p, _ in jax.tree_util.tree_flatten_with_path(variables['params'])[0]}
    assert fresh_paths == imported_paths

    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(2, 40, 3)).astype(np.float32))
    preds = model.apply(variables, feats, train=False)
    assert preds['outlines'].shape == (2, P, L, 4)
    assert np.isfinite(np.asarray(preds['outlines'])).all()
