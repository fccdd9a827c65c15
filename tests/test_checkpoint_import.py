"""Reference .pth import: the shipped NeuralTailor stitch model must load into
our flax module and reproduce the torch forward pass bit-for-bit (f32)."""
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from garment_pattern_estimation_tpu.experiment import (
    import_stitch_model, load_checkpoint_any, save_checkpoint_file,
    load_checkpoint_file,
)
from garment_pattern_estimation_tpu.models import build_model

REFERENCE_PTH = Path('/root/reference/models/att/neural_tailor_stitch_model.pth')


@pytest.mark.skipif(not REFERENCE_PTH.exists(), reason='reference checkpoint absent')
def test_stitch_pth_imports_and_matches_torch():
    import torch
    import torch.nn.functional as F

    ckpt = import_stitch_model(REFERENCE_PTH)
    variables = ckpt['variables']

    model = build_model('StitchOnEdge3DPairs', {'element_size': 16},
                        {'stitch_hidden_size': 200, 'stitch_mlp_n_layers': 3})
    rng = np.random.default_rng(0)
    pairs = rng.normal(size=(7, 16)).astype(np.float32)

    # flax forward (eval mode, running stats)
    logits_jax = np.asarray(model.apply(variables, jnp.asarray(pairs), train=False))

    # torch oracle: replay Linear->ReLU->BatchNorm with the raw .pth weights
    sd = torch.load(str(REFERENCE_PTH), map_location='cpu',
                    weights_only=False)['model_state_dict']
    x = torch.from_numpy(pairs)
    for i in range(4):
        w = sd[f'module.mlp.{i}.0.weight']
        b = sd[f'module.mlp.{i}.0.bias']
        x = F.relu(F.linear(x, w, b))
        x = F.batch_norm(
            x, sd[f'module.mlp.{i}.2.running_mean'], sd[f'module.mlp.{i}.2.running_var'],
            sd[f'module.mlp.{i}.2.weight'], sd[f'module.mlp.{i}.2.bias'],
            training=False, eps=1e-5)
    logits_torch = x.squeeze(-1).numpy()

    np.testing.assert_allclose(logits_jax, logits_torch, atol=2e-5, rtol=1e-4)


@pytest.mark.skipif(not REFERENCE_PTH.exists(), reason='reference checkpoint absent')
def test_load_checkpoint_any_detects_pth():
    ckpt = load_checkpoint_any(REFERENCE_PTH)
    assert 'variables' in ckpt
    assert 'mlp' in ckpt['variables']['params']


def test_msgpack_roundtrip(tmp_path):
    state = {'epoch': 3,
             'variables': {'params': {'w': np.arange(6, dtype=np.float32).reshape(2, 3)}},
             'note': 7}
    path = tmp_path / 'ckpt.msgpack'
    save_checkpoint_file(state, path)
    restored = load_checkpoint_file(path)
    assert restored['epoch'] == 3
    np.testing.assert_array_equal(restored['variables']['params']['w'],
                                  state['variables']['params']['w'])
