"""Shape-model `.pth` import validation (VERDICT round-1 gap #2).

Builds a reference-format torch checkpoint with random (non-trivial) weights
and BatchNorm stats, replays the forward in plain torch, and asserts the
flax forward on the imported variables matches — the same oracle strategy
test_checkpoint_import.py uses for the stitch model, extended to EdgeConv +
attention + LSTM decoders + placement head (reference load path:
nn/experiment.py:311-335)."""
import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

from garment_pattern_estimation_tpu.experiment.torch_import import import_shape_model
from garment_pattern_estimation_tpu.experiment.torch_reference import (
    TorchGarmentSegmentPattern3D, TorchGarmentFullPattern3D,
    randomize_reference_weights)
from garment_pattern_estimation_tpu.models import build_model

SMALL = dict(max_pattern_len=5, max_panel_len=6, element_size=4,
             stitch_tag_dim=3, panel_encoding_size=24, panel_hidden_size=24,
             panel_n_layers=2, econv_hidden=16, econv_hidden_depth=2,
             econv_feature=12, k_neighbors=5, conv_depth=2,
             skip_connections=True)

DATA_CONFIG = {
    'element_size': 4, 'rotation_size': 4, 'translation_size': 3,
    'max_panel_len': 6, 'max_pattern_len': 5, 'max_num_stitches': 4,
    'standardize': {
        'gt_shift': {'outlines': [0, 0, 0, 0], 'rotations': [0, 0, 0, 0],
                     'translations': [0, 0, 0], 'stitch_tags': [0, 0, 0]},
        'gt_scale': {'outlines': [1, 1, 1, 1], 'rotations': [1, 1, 1, 1],
                     'translations': [1, 1, 1], 'stitch_tags': [1, 1, 1]},
    },
}

NN_SMALL = {
    'panel_encoding_size': 24, 'panel_hidden_size': 24, 'panel_n_layers': 2,
    'pattern_encoding_size': 24, 'pattern_hidden_size': 24,
    'pattern_n_layers': 2, 'EConv_hidden': 16, 'EConv_hidden_depth': 2,
    'EConv_feature': 12, 'k_neighbors': 5, 'conv_depth': 2,
    'skip_connections': True, 'global_pool': 'mean', 'local_attention': True,
}


def _save_reference_pth(model, path, with_dataparallel_prefix=True):
    sd = model.state_dict()
    if with_dataparallel_prefix:
        sd = {f'module.{k}': v for k, v in sd.items()}
    torch.save({'model_state_dict': sd, 'epoch': 41,
                'optimizer_state_dict': {}}, str(path))


def _compare(preds_flax, preds_torch, keys):
    for key in keys:
        got = np.asarray(preds_flax[key])
        want = preds_torch[key].detach().numpy()
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-4,
            err_msg=f'imported forward diverges on <{key}>')


def test_import_att_model_forward_parity(tmp_path, rng):
    ref = randomize_reference_weights(
        TorchGarmentSegmentPattern3D(**SMALL), seed=3).eval()
    pth = tmp_path / 'att_checkpoint.pth'
    _save_reference_pth(ref, pth)

    imported = import_shape_model(pth)
    assert imported['epoch'] == 41

    x = rng.normal(size=(2, 120, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    model = build_model('GarmentSegmentPattern3D', DATA_CONFIG, NN_SMALL, {},
                        use_pallas=False)
    preds = model.module.apply(imported['variables'], jnp.asarray(x),
                               train=False)
    _compare(preds, want, ['outlines', 'rotations', 'translations',
                           'stitch_tags', 'free_edges_mask', 'att_weights'])


def test_import_base_model_forward_parity(tmp_path, rng):
    ref = randomize_reference_weights(
        TorchGarmentFullPattern3D(**SMALL, pattern_encoding_size=24,
                                  pattern_hidden_size=24, pattern_n_layers=2),
        seed=4).eval()
    pth = tmp_path / 'base_checkpoint.pth'
    _save_reference_pth(ref, pth)

    imported = import_shape_model(pth, model_name='GarmentFullPattern3D')

    x = rng.normal(size=(2, 120, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    model = build_model('GarmentFullPattern3D', DATA_CONFIG, NN_SMALL, {},
                        use_pallas=False)
    preds = model.module.apply(imported['variables'], jnp.asarray(x),
                               train=False)
    _compare(preds, want, ['outlines', 'rotations', 'translations',
                           'stitch_tags', 'free_edges_mask'])
