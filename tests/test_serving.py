"""AOT serving export: serialize -> reload -> exact agreement with the live
pipeline (standardize + forward + un-standardize), shape validation, manifest."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from garment_pattern_estimation_tpu.models import build_model
from garment_pattern_estimation_tpu.experiment.serving import (
    build_serving_fn, export_serving_artifact, load_serving_artifact)

DATA_CONFIG = {
    'element_size': 4, 'rotation_size': 4, 'translation_size': 3,
    'max_panel_len': 6, 'max_pattern_len': 5, 'max_num_stitches': 6,
    'explicit_stitch_tags': False,
    'standardize': {
        'f_shift': [0.1, -2.0, 0.5], 'f_scale': [3.0, 5.0, 2.0],
        'gt_shift': {
            'outlines': [0, 0, 0.1, 0.05],
            'rotations': [-0.7, -0.9, -1, 0],
            'translations': [-55, -20, -17],
            'stitch_tags': [-60, -78, -53],
        },
        'gt_scale': {
            'outlines': [25, 31, 0.27, 0.24],
            'rotations': [1.7, 1.9, 1.7, 1],
            'translations': [109, 98, 37],
            'stitch_tags': [120, 156, 106],
        },
    },
}

NN_CONFIG = {
    'panel_encoding_size': 16, 'panel_hidden_size': 16, 'panel_n_layers': 1,
    'pattern_encoding_size': 16, 'pattern_hidden_size': 16, 'pattern_n_layers': 1,
    'EConv_hidden': 8, 'EConv_feature': 8, 'k_neighbors': 3,
    'conv_depth': 1, 'skip_connections': True, 'global_pool': 'mean',
    'local_attention': True,
}

B, N = 2, 40


@pytest.fixture(scope='module')
def tiny_model():
    model = build_model('GarmentSegmentPattern3D', DATA_CONFIG, NN_CONFIG,
                        {'loss_components': ['shape'],
                         'quality_components': [],
                         'panel_origin_invariant_loss': False,
                         'panel_order_inariant_loss': False},
                        use_pallas=False)
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    variables = model.init_variables(jax.random.PRNGKey(0), sample)
    variables = {'params': variables['params'],
                 'batch_stats': variables['batch_stats']}
    return model, variables


@pytest.fixture(scope='module')
def artifact_dir(tiny_model, tmp_path_factory):
    model, variables = tiny_model
    out = tmp_path_factory.mktemp('serving') / 'artifact'
    manifest = export_serving_artifact(
        model, variables, DATA_CONFIG, out, batch_size=B, num_points=N)
    return out, manifest


def test_export_manifest(artifact_dir):
    out, manifest = artifact_dir
    assert (out / 'model.jaxexport').exists()
    assert (out / 'manifest.json').exists()
    assert manifest['input']['shape'] == [B, N, 3]
    assert manifest['model'] == 'GarmentSegmentPattern3D'
    assert 'outlines' in manifest['outputs']
    assert manifest['data_config']['max_pattern_len'] == 5


def test_roundtrip_matches_live_pipeline(tiny_model, artifact_dir):
    """The reloaded program reproduces standardize+forward+unstandardize
    bit-for-bit (same platform, same program)."""
    model, variables = tiny_model
    out, _ = artifact_dir
    served = load_serving_artifact(out)

    rng = np.random.default_rng(7)
    points = rng.normal(size=(B, N, 3)).astype(np.float32) * 10.0

    live = jax.jit(build_serving_fn(model, variables, DATA_CONFIG))(points)
    reloaded = served(jnp.asarray(points))

    assert set(live) == set(reloaded)
    for key in live:
        np.testing.assert_array_equal(
            np.asarray(live[key]), np.asarray(reloaded[key]),
            err_msg=f'serving output {key} diverged after export round-trip')
    # un-standardization actually applied: physical-unit translations are far
    # from the standardized range at this init
    assert np.abs(np.asarray(reloaded['translations'])).max() > 1.0


def test_input_shape_validation(artifact_dir):
    out, _ = artifact_dir
    served = load_serving_artifact(out)
    with pytest.raises(ValueError, match='input shape'):
        served(np.zeros((B + 1, N, 3), np.float32))


def test_unstandardize_keys(tiny_model):
    """gt-keyed outputs are affine-mapped, passthrough keys are untouched."""
    model, variables = tiny_model
    rng = np.random.default_rng(3)
    points = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))

    serve = build_serving_fn(model, variables, DATA_CONFIG)
    served_out = serve(points)

    std = DATA_CONFIG['standardize']
    x = (points - jnp.asarray(std['f_shift'])) / jnp.asarray(std['f_scale'])
    raw = model.module.apply(variables, x, train=False)
    for key in ('outlines', 'rotations', 'translations', 'stitch_tags'):
        expected = np.asarray(raw[key]) * np.asarray(std['gt_scale'][key]) \
            + np.asarray(std['gt_shift'][key])
        np.testing.assert_allclose(np.asarray(served_out[key]), expected,
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(served_out['free_edges_mask']),
                                  np.asarray(raw['free_edges_mask']))


def test_output_names_exact(artifact_dir):
    """Manifest output names map positions to dict keys EXACTLY (recovered
    from the out_tree with index leaves, not via a sorted() assumption)."""
    _, manifest = artifact_dir
    names = list(manifest['outputs'])
    assert set(names) >= {'outlines', 'rotations', 'translations'}
    # shapes recorded under each name must match that OUTPUT's aval: the
    # rotations entry must carry the rotation head's width, etc.
    assert manifest['outputs']['rotations']['shape'][-1] == 4
    assert manifest['outputs']['translations']['shape'][-1] == 3


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='TPU-backend export (fused kernels embedded); '
                           'bench.py::measure_serving_artifact exercises it '
                           'on the real chip')
def test_tpu_export_load_roundtrip(tiny_model, tmp_path):
    model, variables = tiny_model
    export_serving_artifact(model, variables, DATA_CONFIG, tmp_path,
                            batch_size=2, num_points=N)
    served = load_serving_artifact(tmp_path)
    out = served(np.zeros((2, N, 3), np.float32))
    assert np.isfinite(np.asarray(out['outlines'])).all()
