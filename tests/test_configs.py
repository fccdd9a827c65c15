"""The shipped YAML configs parse and build working models at published scale."""
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

CONFIG_DIR = Path(__file__).parent.parent / 'configs'


@pytest.mark.parametrize('config_name', ['att.yaml', 'att_bf16.yaml',
                                         'stitch_model.yaml',
                                         'lstm_stitch_tags.yaml',
                                         'synthetic_quick.yaml'])
def test_config_parses_with_expected_sections(config_name):
    config = yaml.safe_load((CONFIG_DIR / config_name).read_text())
    for section in ('experiment', 'dataset', 'data_split', 'NN', 'trainer'):
        assert section in config, f'{config_name} missing {section}'
    assert 'loss' in config['NN']
    assert 'batch_size' in config['trainer']


def test_att_config_builds_published_scale_model():
    from garment_pattern_estimation_tpu.models import build_model

    config = yaml.safe_load((CONFIG_DIR / 'att.yaml').read_text())
    ds = config['dataset']
    data_config = {
        'element_size': ds['element_size'], 'rotation_size': ds['rotation_size'],
        'translation_size': ds['translation_size'],
        'max_panel_len': ds['max_panel_len'], 'max_pattern_len': ds['max_pattern_len'],
        'max_num_stitches': ds['max_num_stitches'],
        'explicit_stitch_tags': ds['explicit_stitch_tags'],
        'standardize': ds['standardize'],
    }
    model = build_model(config['NN']['model'], data_config, config['NN'],
                        config['NN']['loss'], use_pallas=False)
    assert model.config['EConv_feature'] == 150
    assert model.config['local_attention'] is True
    assert model.loss.config['epoch_with_stitches'] == 40

    feats = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 3))
                        .astype(np.float32))
    variables = model.init_variables(jax.random.PRNGKey(0), feats)
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(variables['params']))
    # published scale: ~0.4M-2M parameters (EConv 200/150 + LSTM 250x3)
    assert 3e5 < n_params < 5e6, n_params
    preds = model.apply(variables, feats, train=False)
    assert preds['outlines'].shape == (2, 23, 14, 4)


def test_bf16_config_runs_mixed_precision_forward():
    """att_bf16.yaml: compute_dtype reaches the encoder (bf16 matmuls) while
    predictions and parameters stay f32."""
    from garment_pattern_estimation_tpu.models import build_model

    config = yaml.safe_load((CONFIG_DIR / 'att_bf16.yaml').read_text())
    assert config['NN']['compute_dtype'] == 'bfloat16'
    ds = config['dataset']
    data_config = {
        'element_size': ds['element_size'], 'rotation_size': ds['rotation_size'],
        'translation_size': ds['translation_size'],
        'max_panel_len': ds['max_panel_len'], 'max_pattern_len': ds['max_pattern_len'],
        'max_num_stitches': ds['max_num_stitches'],
        'explicit_stitch_tags': ds['explicit_stitch_tags'],
        'standardize': ds['standardize'],
    }
    model = build_model(config['NN']['model'], data_config, config['NN'],
                        config['NN']['loss'], use_pallas=False)
    assert model.module.compute_dtype == 'bfloat16'
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 3))
                        .astype(np.float32))
    variables = model.init_variables(jax.random.PRNGKey(0), feats)
    for leaf in jax.tree_util.tree_leaves(variables['params']):
        assert leaf.dtype == jnp.float32
    preds = model.apply(variables, feats, train=False)
    assert preds['outlines'].dtype == jnp.float32


def test_stitch_config_builds_and_accepts_reference_checkpoint_shape():
    from garment_pattern_estimation_tpu.models import build_model

    config = yaml.safe_load((CONFIG_DIR / 'stitch_model.yaml').read_text())
    model = build_model(config['NN']['model'], {'element_size': 16},
                        config['NN'], config['NN']['loss'])
    pairs = jnp.asarray(np.random.default_rng(1).normal(size=(4, 10, 16))
                        .astype(np.float32))
    variables = model.init_variables(jax.random.PRNGKey(0), pairs)
    kernel = variables['params']['mlp']['Dense_0']['kernel']
    assert kernel.shape == (16, 200)  # matches neural_tailor_stitch_model.pth
