"""On-device mesh sampling vs the host sampler: distributional parity
(area-weighting, barycentric uniformity), padding invariance, snapping
(reference scope: libigl calls at nn/data/datasets.py:832-905)."""
import numpy as np
import jax
import jax.numpy as jnp

from garment_pattern_estimation_tpu.preprocess.device_sampling import (
    face_areas, pad_mesh, sample_surface, sample_surface_batched,
    snap_to_vertices)
from garment_pattern_estimation_tpu.preprocess.mesh import sample_mesh_points


def _two_tri_mesh():
    # one small + one 4x-larger triangle, coplanar
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [2, 0, 0], [4, 0, 0], [2, 2, 0]], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    return verts, faces


def test_area_weighting_and_support():
    verts, faces = _two_tri_mesh()
    areas = np.asarray(face_areas(jnp.asarray(verts), jnp.asarray(faces)))
    np.testing.assert_allclose(areas, [0.5, 2.0], atol=1e-6)

    pts, fids = sample_surface(jax.random.PRNGKey(0), jnp.asarray(verts),
                               jnp.asarray(faces), 4000)
    fids = np.asarray(fids)
    frac_large = (fids == 1).mean()
    assert abs(frac_large - 0.8) < 0.03  # 2.0 / 2.5 area share
    pts = np.asarray(pts)
    assert np.all(pts[:, 2] == 0)        # on the z=0 plane
    # inside the union of the triangles' bounding boxes
    assert pts[:, 0].min() >= 0 and pts[:, 0].max() <= 4 + 1e-5


def test_barycentric_mean_matches_host_sampler():
    """Mean of uniform surface samples ~= area-weighted centroid: compare
    the device sampler against the (seeded) host sampler statistically."""
    verts, faces = _two_tri_mesh()
    host = sample_mesh_points(8000, verts, faces, seed=3)
    dev = np.asarray(sample_surface(jax.random.PRNGKey(3), jnp.asarray(verts),
                                    jnp.asarray(faces), 8000)[0])
    np.testing.assert_allclose(host.mean(0), dev.mean(0), atol=0.05)
    np.testing.assert_allclose(host.std(0), dev.std(0), atol=0.05)


def test_padding_is_never_sampled():
    verts, faces = _two_tri_mesh()
    pv, pf, _ = pad_mesh(verts, faces, v_cap=16, f_cap=10)
    _, fids = sample_surface(jax.random.PRNGKey(1), jnp.asarray(pv),
                             jnp.asarray(pf), 2000)
    assert np.asarray(fids).max() <= 1  # degenerate pad faces: zero area


def test_batched_and_jitted():
    verts, faces = _two_tri_mesh()
    pv, pf, _ = pad_mesh(verts, faces, 8, 4)
    vb = jnp.stack([jnp.asarray(pv), jnp.asarray(pv) * 2.0])
    fb = jnp.stack([jnp.asarray(pf)] * 2)
    fn = jax.jit(lambda k, v, f: sample_surface_batched(k, v, f, 500, 0.0))
    pts, fids = fn(jax.random.PRNGKey(2), vb, fb)
    assert pts.shape == (2, 500, 3) and fids.shape == (2, 500)
    # second mesh is scaled 2x: its samples live in the scaled range
    assert float(jnp.max(pts[1])) > float(jnp.max(pts[0]))


def test_snap_to_vertices_masks_padding():
    verts, faces = _two_tri_mesh()
    pv, pf, n_verts = pad_mesh(verts, faces, 16, 10)
    queries = jnp.asarray(verts[:3] + 0.01)
    valid = jnp.arange(16) < n_verts
    idx = snap_to_vertices(queries, jnp.asarray(pv), valid)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2])
    # without the mask, padded zero-vertices would capture near-origin points
    idx_raw = snap_to_vertices(jnp.asarray([[0.001, 0.001, 0.0]]),
                               jnp.asarray(pv), valid)
    assert int(idx_raw[0]) == 0


# ----------------------------------------------------------------------
# pipeline integration: dataset.on_device_sampling mode end to end
# ----------------------------------------------------------------------

def test_on_device_sampling_trains_and_evaluates(synthetic_dataset_root,
                                                 tmp_path):
    """`on_device_sampling: true` swaps host clouds for padded mesh features;
    the whole stack (Trainer, eval_metrics, make_predict_fn) must run the
    fused sample+noise+snap stage ahead of the encoder."""
    from garment_pattern_estimation_tpu.data import Garment3DPatternFullDataset
    from garment_pattern_estimation_tpu.experiment import ExperimentWrappper
    from garment_pattern_estimation_tpu.models import build_model
    from garment_pattern_estimation_tpu.train import (
        Trainer, eval_metrics, make_predict_fn)
    from garment_pattern_estimation_tpu.preprocess.device_sampling import (
        maybe_batch_sampler)

    dataset = Garment3DPatternFullDataset(
        synthetic_dataset_root,
        {'data_folders': ['tee_synth_300', 'skirt_synth_300'],
         'mesh_samples': 60, 'on_device_sampling': True,
         'mesh_vertex_cap': 256, 'mesh_face_cap': 512,
         'point_noise_w': 0.01,
         'panel_classification': str(synthetic_dataset_root / 'panel_classes.json')},
        gt_caching=True, feature_caching=True)

    sample = dataset[0]
    assert isinstance(sample['features'], dict)
    assert sample['features']['verts'].shape == (256, 3)
    assert sample['features']['faces'].shape == (512, 3)
    # synthetic data ships segmentation files: vertex labels must be present
    assert (sample['features']['vert_labels'] >= 0).any()

    experiment = ExperimentWrappper(
        {'experiment': {'project_name': 'test-project', 'run_name': 'ods'}},
        output_root=tmp_path)
    trainer = Trainer(
        {'batch_size': 4, 'epochs': 2, 'random_seed': 3,
         'learning_rate': 2e-3, 'optimizer': 'Adam',
         'lr_scheduling': {'mode': '1cyclic'},
         'early_stopping': {'window': 1e-8, 'patience': 50}},
        experiment, dataset,
        {'valid_per_type': 1, 'test_per_type': 1, 'type': 'count',
         'random_seed': 10},
        with_norm=True, with_visualization=False)
    trainer.init_randomizer()
    model = build_model(
        'GarmentSegmentPattern3D', dataset.config,
        {'panel_encoding_size': 16, 'panel_hidden_size': 16,
         'panel_n_layers': 1, 'EConv_hidden': 10, 'EConv_feature': 8,
         'k_neighbors': 4, 'conv_depth': 1, 'skip_connections': True,
         'local_attention': True},
        {'loss_components': ['shape', 'loop'],
         'quality_components': ['shape', 'discrete'],
         'panel_order_inariant_loss': False,
         'panel_origin_invariant_loss': False},
        use_pallas=False)
    variables, _ = trainer.fit(model)
    assert trainer.device_sampler is not None

    import json
    records = [json.loads(line) for line in
               (experiment.run_dir() / 'metrics.jsonl').read_text().splitlines()]
    losses = [r['loss'] for r in records if 'loss' in r]
    assert losses and all(np.isfinite(v) for v in losses)

    metrics = eval_metrics(model, variables, trainer.datawrapper, 'validation')
    assert metrics['full_loss'] is not None and np.isfinite(metrics['full_loss'])
    assert 'panel_shape_l2' in metrics

    # mesh -> prediction in one jit
    predict = make_predict_fn(model, variables,
                              device_sampler=maybe_batch_sampler(dataset.config))
    batch = next(iter(trainer.datawrapper.loaders.validation))
    preds = predict(batch['features'])
    assert preds['outlines'].shape[0] == batch['ground_truth']['outlines'].shape[0]
    assert np.isfinite(preds['outlines']).all()
