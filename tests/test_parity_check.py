"""End-to-end run of the parity harness (cli/parity_check.py) on synthetic
data with synthetic reference-format checkpoints: the imported flax forward
must match the torch replica's metrics within the 1% north-star tolerance,
and the two-stage stitch path must produce a report."""
import json

import pytest
import yaml

torch = pytest.importorskip('torch')


@pytest.fixture(scope='module')
def parity_env(tmp_path_factory):
    from garment_pattern_estimation_tpu.utils import synthetic
    from garment_pattern_estimation_tpu.experiment.torch_reference import (
        TorchGarmentSegmentPattern3D, TorchStitchOnEdge3DPairs,
        randomize_reference_weights)

    root = tmp_path_factory.mktemp('parity')
    data = root / 'data'
    synthetic.generate_dataset(data, samples_per_folder=6, seed=5)
    synthetic.panel_classes_for_templates(data / 'panel_classes.json')

    nn = {'model': 'GarmentSegmentPattern3D', 'feature_extractor': 'EdgeConvFeatures',
          'conv_depth': 1, 'k_neighbors': 5, 'EConv_hidden': 12,
          'EConv_feature': 10, 'EConv_hidden_depth': 1, 'EConv_aggr': 'max',
          'global_pool': 'mean', 'skip_connections': True,
          'local_attention': True, 'panel_decoder': 'LSTMDecoderModule',
          'panel_encoding_size': 16, 'panel_hidden_size': 16,
          'panel_n_layers': 1, 'stitch_tag_dim': 3,
          'loss': {'loss_components': ['shape', 'loop', 'rotation', 'translation'],
                   'quality_components': ['shape', 'discrete', 'rotation', 'translation'],
                   'panel_origin_invariant_loss': False,
                   'panel_order_inariant_loss': False}}
    shape_config = {
        'experiment': {'project_name': 'Parity', 'run_name': 'shape', 'run_id': None},
        'dataset': {'class': 'Garment3DPatternFullDataset',
                    'data_folders': ['tee_synth_300', 'skirt_synth_300',
                                     'jumpsuit_synth_300'],
                    'mesh_samples': 60, 'obj_filetag': 'sim', 'point_noise_w': 0,
                    'panel_classification': str(data / 'panel_classes.json')},
        'data_split': {'valid_per_type': 1, 'test_per_type': 2,
                       'random_seed': 10, 'type': 'count'},
        'NN': nn,
        'trainer': {'batch_size': 4, 'epochs': 1, 'random_seed': 1,
                    'learning_rate': 0.002, 'optimizer': 'Adam',
                    'lr_scheduling': {'mode': '1cyclic'}},
    }
    shape_yaml = root / 'shape.yaml'
    shape_yaml.write_text(yaml.safe_dump(shape_config, sort_keys=False))

    # synthetic reference-format checkpoints (sizes must match the config;
    # max_pattern_len/max_panel_len are inferred from the synthetic data)
    replica = randomize_reference_weights(TorchGarmentSegmentPattern3D(
        max_pattern_len=9, max_panel_len=6, element_size=4,
        panel_encoding_size=16, panel_hidden_size=16, panel_n_layers=1,
        econv_hidden=12, econv_hidden_depth=1, econv_feature=10,
        k_neighbors=5, conv_depth=1, skip_connections=True), seed=8)
    shape_pth = root / 'shape.pth'
    torch.save({'model_state_dict': replica.state_dict(), 'epoch': 1}, shape_pth)

    stitch = randomize_reference_weights(
        TorchStitchOnEdge3DPairs(hidden=16, n_layers=2), seed=9)
    stitch_pth = root / 'stitch.pth'
    torch.save({'model_state_dict': stitch.state_dict(), 'epoch': 1}, stitch_pth)

    stitch_config = {
        'experiment': {'project_name': 'Parity', 'run_name': 'stitch', 'run_id': None},
        'dataset': {'class': 'GarmentStitchPairsDataset',
                    'stitched_edge_pairs_num': 20,
                    'non_stitched_edge_pairs_num': 20},
        'NN': {'model': 'StitchOnEdge3DPairs', 'stitch_hidden_size': 16,
               'stitch_mlp_n_layers': 2,
               'loss': {'loss_components': ['edge_pair_class'],
                        'quality_components': ['edge_pair_class',
                                               'edge_pair_stitch_recall']}},
        'trainer': {'batch_size': 2},
    }
    stitch_yaml = root / 'stitch.yaml'
    stitch_yaml.write_text(yaml.safe_dump(stitch_config, sort_keys=False))
    return root, data, shape_yaml, shape_pth, stitch_yaml, stitch_pth


def test_parity_check_torch_cross_check(parity_env, tmp_path, monkeypatch):
    root, data, shape_yaml, shape_pth, _, _ = parity_env
    monkeypatch.chdir(tmp_path)
    from garment_pattern_estimation_tpu.cli import parity_check

    rc = parity_check.main([
        '--dataset_root', str(data), '--shape_config', str(shape_yaml),
        '--shape_pth', str(shape_pth), '--torch_cross_check',
        '--output', str(tmp_path / 'report.json')])
    assert rc == 0, 'imported flax forward diverged >1% from the torch replica'
    report = json.loads((tmp_path / 'report.json').read_text())
    assert 'panel_shape_l2' in report['shape_metrics']
    assert all(c['pass'] for c in report['comparisons'])


def test_parity_check_two_stage_and_expected(parity_env, tmp_path, monkeypatch):
    root, data, shape_yaml, shape_pth, stitch_yaml, stitch_pth = parity_env
    monkeypatch.chdir(tmp_path)
    from garment_pattern_estimation_tpu.cli import parity_check

    # first pass: record our own metrics as the "published" expectations —
    # a second run must then PASS the 1% comparison against them
    rc = parity_check.main([
        '--dataset_root', str(data), '--shape_config', str(shape_yaml),
        '--shape_pth', str(shape_pth), '--stitch_config', str(stitch_yaml),
        '--stitch_pth', str(stitch_pth),
        '--output', str(tmp_path / 'first.json')])
    assert rc == 0
    first = json.loads((tmp_path / 'first.json').read_text())
    assert 'stitch_metrics' in first
    assert 'stitch_f1' in first['stitch_metrics']

    # the --expected branch reduces to _compare_rows over the recorded
    # metrics: exercise the PASS/FAIL tolerance directly instead of paying
    # two more full harness runs (dataset rebuild + checkpoint import +
    # eval) for the same comparison logic
    ours = first['shape_metrics']
    expected = dict(ours)
    expected['panel_shape_l2'] *= 1.005   # within 1%: must still PASS
    rows = parity_check._compare_rows(ours, expected, list(expected),
                                      'published')
    assert all(delta <= 0.01 for _, _, _, delta, _ in rows)

    expected['panel_shape_l2'] *= 1.10    # push beyond tolerance: must FAIL
    rows = parity_check._compare_rows(ours, expected, list(expected),
                                      'published')
    assert any(delta > 0.01 for _, _, _, delta, _ in rows)


def test_parity_check_torch_train_cross_check(parity_env, tmp_path, monkeypatch):
    """--torch_train_cross_check: BOTH stacks train (no checkpoint needed);
    the report carries both trained columns and the first-step losses —
    computed from identical init/batches — must agree tightly."""
    root, data, shape_yaml, _, _, _ = parity_env
    monkeypatch.chdir(tmp_path)
    from garment_pattern_estimation_tpu.cli import parity_check

    rc = parity_check.main([
        '--dataset_root', str(data), '--shape_config', str(shape_yaml),
        '--torch_train_cross_check', '--train_epochs', '3',
        '--tolerance', '0.5',   # 3 tiny epochs are nowhere near converged:
                                # this test checks the machinery; the 1% run
                                # is the published docs/ParityResults table
        '--noise_floor', '--noise_seeds', '2',
        '--output', str(tmp_path / 'train_ab.json')])
    assert rc == 0
    report = json.loads((tmp_path / 'train_ab.json').read_text())
    assert 'panel_shape_l2' in report['trained_shape_metrics']
    assert 'panel_shape_l2' in report['torch_trained_metrics']
    first = report['train_loss_first_step']
    assert abs(first['torch'] - first['ours']) <= 1e-3 * abs(first['torch'])
    # multi-seed noise floor: one metrics dict per extra torch seed, and the
    # per-metric floor is the worst seed-vs-seed-0 spread
    assert len(report['torch_noise_seed_metrics']) == 2
    floors = report['torch_noise_floor']
    base = report['torch_trained_metrics']['panel_shape_l2']
    expected_floor = max(
        abs(m['panel_shape_l2'] - base) / abs(base)
        for m in report['torch_noise_seed_metrics'])
    assert floors['panel_shape_l2'] == pytest.approx(expected_floor)
    comps = [c for c in report['comparisons']
             if c['metric'].startswith('torch_trained:')]
    assert comps and all(c['pass'] for c in comps)


def test_torch_stitch_loss_matches_jax_oracle():
    """torch_pattern_stitch_loss is an exact mirror of
    losses/components.pattern_stitch_loss (both triplet and hardnet forms)."""
    import numpy as np
    import jax.numpy as jnp
    from garment_pattern_estimation_tpu.losses.components import (
        pattern_stitch_loss)
    from garment_pattern_estimation_tpu.experiment.torch_reference import (
        torch_pattern_stitch_loss)

    rng = np.random.default_rng(0)
    B, P, L, S = 3, 5, 6, 8
    tags = rng.normal(size=(B, P, L, 3)).astype(np.float32)
    stitches = rng.integers(0, P * L, size=(B, 2, S)).astype(np.int64)
    nums = np.array([3, 8, 1], dtype=np.int64)

    for hardnet in (False, True):
        jax_total, jax_terms = pattern_stitch_loss(
            jnp.asarray(tags), jnp.asarray(stitches), jnp.asarray(nums),
            margin=0.3, use_hardnet=hardnet)
        t_total, t_terms = torch_pattern_stitch_loss(
            torch.from_numpy(tags), torch.from_numpy(stitches),
            torch.from_numpy(nums), margin=0.3, use_hardnet=hardnet)
        assert float(t_total) == pytest.approx(float(jax_total), rel=1e-5)
        for key in jax_terms:
            assert float(t_terms[key]) == pytest.approx(
                float(jax_terms[key]), rel=1e-5), (hardnet, key)


def test_parity_check_stitch_train_cross_check(parity_env, tmp_path,
                                               monkeypatch):
    """--stitch_train_cross_check: both pair classifiers train from the same
    init on the same pair batches; the report carries both converged stitch
    metric columns and a seed-grounded noise floor."""
    root, data, _, _, _, _ = parity_env
    monkeypatch.chdir(tmp_path)
    from garment_pattern_estimation_tpu.cli import parity_check

    stitch_ab = {
        'experiment': {'project_name': 'Parity', 'run_name': 'stitch-ab',
                       'run_id': None},
        'dataset': {'class': 'GarmentStitchPairsDataset',
                    'data_folders': ['tee_synth_300', 'skirt_synth_300',
                                     'jumpsuit_synth_300'],
                    'stitched_edge_pairs_num': 20,
                    'non_stitched_edge_pairs_num': 20,
                    'pairs_seed': 3},
        'data_split': {'valid_per_type': 1, 'test_per_type': 2,
                       'random_seed': 10, 'type': 'count'},
        'NN': {'model': 'StitchOnEdge3DPairs', 'stitch_hidden_size': 16,
               'stitch_mlp_n_layers': 2,
               'loss': {'loss_components': ['edge_pair_class'],
                        'quality_components': ['edge_pair_class',
                                               'edge_pair_stitch_recall']}},
        'trainer': {'batch_size': 2, 'learning_rate': 0.002},
    }
    stitch_yaml = tmp_path / 'stitch_ab.yaml'
    stitch_yaml.write_text(yaml.safe_dump(stitch_ab, sort_keys=False))

    rc = parity_check.main([
        '--dataset_root', str(data), '--stitch_config', str(stitch_yaml),
        '--stitch_train_cross_check', '--train_epochs', '3',
        '--tolerance', '0.9',   # machinery test, not a convergence claim
        '--noise_floor', '--noise_seeds', '1',
        '--output', str(tmp_path / 'stitch_ab.json')])
    assert rc == 0
    report = json.loads((tmp_path / 'stitch_ab.json').read_text())
    assert 'edge_pair_class_acc' in report['stitch_trained_metrics']
    assert 'stitch_f1' in report['torch_stitch_trained_metrics']
    first = report['stitch_train_loss_first_step']
    assert abs(first['torch'] - first['ours']) <= 1e-3 * abs(first['torch'])
    assert len(report['torch_stitch_noise_seed_metrics']) == 1
    comps = [c for c in report['comparisons']
             if c['metric'].startswith('torch_stitch_trained:')]
    assert comps


def test_parity_check_train_cross_check_with_stitch_terms(parity_env,
                                                          tmp_path,
                                                          monkeypatch):
    """The shape training A/B accepts stitch/free_class components: both
    stacks train through the epoch_with_stitches loss-structure change and
    report stitch quality metrics (GarmentFullPattern3D recipe)."""
    root, data, _, _, _, _ = parity_env
    monkeypatch.chdir(tmp_path)
    from garment_pattern_estimation_tpu.cli import parity_check

    config = {
        'experiment': {'project_name': 'Parity', 'run_name': 'lstm-ab',
                       'run_id': None},
        'dataset': {'class': 'Garment3DPatternFullDataset',
                    'data_folders': ['tee_synth_300', 'skirt_synth_300',
                                     'jumpsuit_synth_300'],
                    'mesh_samples': 60, 'obj_filetag': 'sim',
                    'point_noise_w': 0,
                    'panel_classification': str(data / 'panel_classes.json')},
        'data_split': {'valid_per_type': 1, 'test_per_type': 2,
                       'random_seed': 10, 'type': 'count'},
        'NN': {'model': 'GarmentFullPattern3D',
               'feature_extractor': 'EdgeConvFeatures',
               'conv_depth': 1, 'k_neighbors': 5, 'EConv_hidden': 12,
               'EConv_feature': 10, 'EConv_hidden_depth': 1,
               'EConv_aggr': 'max', 'global_pool': 'mean',
               'skip_connections': True,
               'panel_decoder': 'LSTMDecoderModule',
               'panel_encoding_size': 16, 'panel_hidden_size': 16,
               'panel_n_layers': 1,
               'pattern_decoder': 'LSTMDecoderModule',
               'pattern_encoding_size': 16, 'pattern_hidden_size': 16,
               'pattern_n_layers': 1, 'stitch_tag_dim': 3,
               'loss': {'loss_components': ['shape', 'loop', 'rotation',
                                            'translation', 'stitch',
                                            'free_class'],
                        'quality_components': ['shape', 'discrete',
                                               'rotation', 'translation',
                                               'stitch', 'free_class'],
                        'epoch_with_stitches': 2,
                        'stitch_tags_margin': 0.3,
                        'panel_origin_invariant_loss': False,
                        'panel_order_inariant_loss': False}},
        'trainer': {'batch_size': 4, 'epochs': 1, 'random_seed': 1,
                    'learning_rate': 0.002, 'optimizer': 'Adam',
                    'lr_scheduling': {'mode': '1cyclic'}},
    }
    shape_yaml = tmp_path / 'lstm_ab.yaml'
    shape_yaml.write_text(yaml.safe_dump(config, sort_keys=False))

    rc = parity_check.main([
        '--dataset_root', str(data), '--shape_config', str(shape_yaml),
        '--torch_train_cross_check', '--train_epochs', '4',
        '--tolerance', '0.9',   # machinery test, not a convergence claim
        '--output', str(tmp_path / 'lstm_ab.json')])
    assert rc == 0
    report = json.loads((tmp_path / 'lstm_ab.json').read_text())
    # the stitch phase ran in BOTH stacks: stitch quality columns exist
    assert 'stitch_precision' in report['trained_shape_metrics']
    assert 'free_edge_acc' in report['torch_trained_metrics']
    first = report['train_loss_first_step']
    assert abs(first['torch'] - first['ours']) <= 1e-3 * abs(first['torch'])


def test_parity_check_jax_seeds_and_torch_reuse(parity_env, tmp_path,
                                                monkeypatch):
    """--jax_seeds trains matched-init extra JAX stacks and reports paired
    cross-framework deltas; --torch_from_report reuses a previous report's
    torch columns without re-training torch."""
    root, data, shape_yaml, _, _, _ = parity_env
    monkeypatch.chdir(tmp_path)
    from garment_pattern_estimation_tpu.cli import parity_check

    rc = parity_check.main([
        '--dataset_root', str(data), '--shape_config', str(shape_yaml),
        '--torch_train_cross_check', '--train_epochs', '2',
        '--tolerance', '0.9', '--jax_seeds', '1',
        '--noise_floor', '--noise_seeds', '1',
        '--output', str(tmp_path / 'first.json')])
    assert rc == 0
    first = json.loads((tmp_path / 'first.json').read_text())
    assert len(first['jax_seed_metrics']) == 1
    paired = first['paired_cross_framework_deltas']
    # pool = seed0 pair + 1 extra matched pair
    assert len(paired['panel_shape_l2']['per_seed_signed']) == 2
    assert paired['panel_shape_l2']['mean_abs'] >= 0

    rc = parity_check.main([
        '--dataset_root', str(data), '--shape_config', str(shape_yaml),
        '--torch_train_cross_check', '--train_epochs', '2',
        '--tolerance', '0.9', '--jax_seeds', '1',
        '--torch_from_report', str(tmp_path / 'first.json'),
        '--output', str(tmp_path / 'second.json')])
    assert rc == 0
    second = json.loads((tmp_path / 'second.json').read_text())
    assert second['torch_columns_reused_from'].endswith('first.json')
    # torch columns identical to the first report (no retraining)
    assert second['torch_trained_metrics'] == first['torch_trained_metrics']
    assert second['torch_noise_seed_metrics'] == \
        first['torch_noise_seed_metrics']
    # floors derive from the reused seeds; comparisons still produced
    assert 'panel_shape_l2' in second['torch_noise_floor']
    assert any(c['metric'].startswith('torch_trained:')
               for c in second['comparisons'])


def test_parity_check_stop_after_jax_and_resume(parity_env, tmp_path,
                                                monkeypatch, capsys):
    """--stop_after_jax trains only the accelerator arms and flushes them;
    rerunning the same campaign with --resume skips every completed arm
    (the VM-restart recovery path: each arm is flushed to --output the
    moment it finishes)."""
    root, data, shape_yaml, _, _, _ = parity_env
    monkeypatch.chdir(tmp_path)
    from garment_pattern_estimation_tpu.cli import parity_check

    out = tmp_path / 'ab.json'
    base_args = [
        '--dataset_root', str(data), '--shape_config', str(shape_yaml),
        '--torch_train_cross_check', '--train_epochs', '2',
        '--tolerance', '0.9', '--jax_seeds', '1',
        '--noise_floor', '--noise_seeds', '1',
        '--resume', '--output', str(out)]

    rc = parity_check.main(base_args + ['--stop_after_jax'])
    assert rc == 0
    r1 = json.loads(out.read_text())
    assert r1['stopped_after_jax'] is True
    assert 'panel_shape_l2' in r1['_resume_jax_base_metrics']
    assert len(r1['_resume_jax_seed_metrics']) == 1
    # no torch arm has trained yet
    assert 'torch_trained_metrics' not in r1
    assert '_resume_torch_base_metrics' not in r1
    capsys.readouterr()

    # resume: jax arms reload, only the torch arms train
    rc = parity_check.main(base_args)
    assert rc == 0
    printed = capsys.readouterr().out
    assert 'our base arm reloaded' in printed
    assert 'training JAX seed' not in printed
    r2 = json.loads(out.read_text())
    assert 'stopped_after_jax' not in r2
    assert r2['trained_shape_metrics']['panel_shape_l2'] == \
        r1['_resume_jax_base_metrics']['panel_shape_l2']
    assert len(r2['paired_cross_framework_deltas']
               ['panel_shape_l2']['per_seed_signed']) == 2
    capsys.readouterr()

    # a fully-complete report resumes as a pure no-op: nothing retrains
    rc = parity_check.main(base_args)
    assert rc == 0
    printed = capsys.readouterr().out
    assert 'training the torch reference recipe' not in printed
    assert 'noise floor' not in printed
    r3 = json.loads(out.read_text())
    assert r3['torch_trained_metrics'] == r2['torch_trained_metrics']
    assert r3['torch_noise_seed_metrics'] == r2['torch_noise_seed_metrics']

    # paired_ci consumes partially-completed reports via the _resume_ stashes
    import importlib.util as ilu
    from pathlib import Path
    spec = ilu.spec_from_file_location(
        'paired_ci',
        Path(__file__).resolve().parent.parent / 'parity_run' / 'paired_ci.py')
    paired_ci = ilu.module_from_spec(spec)
    spec.loader.exec_module(paired_ci)
    partial = {k: v for k, v in r2.items() if k.startswith('_resume_')}
    assert len(paired_ci.pairs_from_report(partial)) == 2
    assert len(paired_ci.pairs_from_report(r1)) == 0
