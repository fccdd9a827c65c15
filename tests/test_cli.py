"""CLI surface: train -> on_test_set -> predict_per_example on synthetic data."""
import json
import os
from pathlib import Path

import pytest
import yaml


@pytest.fixture(scope='module')
def cli_env(synthetic_dataset_root, tmp_path_factory):
    """system.json + tiny train config in an isolated working directory."""
    workdir = tmp_path_factory.mktemp('cli')
    system = {'datasets_path': str(synthetic_dataset_root),
              'output': str(workdir / 'output'),
              'wandb_username': 'local'}
    (workdir / 'system.json').write_text(json.dumps(system))

    config = {
        'experiment': {'project_name': 'cli-test', 'run_name': 'quick', 'run_id': None},
        'dataset': {
            'class': 'Garment3DPatternFullDataset',
            'data_folders': ['tee_synth_300', 'skirt_synth_300', 'jumpsuit_synth_300'],
            'mesh_samples': 60,
            'obj_filetag': 'sim',
            'point_noise_w': 0,
            'panel_classification': str(synthetic_dataset_root / 'panel_classes.json'),
        },
        'data_split': {'valid_per_type': 1, 'test_per_type': 1, 'type': 'count',
                       'random_seed': 10},
        'NN': {
            'model': 'GarmentSegmentPattern3D',
            'feature_extractor': 'EdgeConvFeatures',
            'conv_depth': 1, 'k_neighbors': 4,
            'EConv_hidden': 12, 'EConv_feature': 10, 'EConv_hidden_depth': 2,
            'EConv_aggr': 'max', 'global_pool': 'mean', 'skip_connections': True,
            'local_attention': True,
            'panel_decoder': 'LSTMDecoderModule',
            'panel_encoding_size': 16, 'panel_hidden_size': 16, 'panel_n_layers': 1,
            'lstm_init': 'kaiming_normal_', 'stitch_tag_dim': 3,
            'loss': {
                'loss_components': ['shape', 'loop', 'rotation', 'translation'],
                'quality_components': ['shape', 'discrete', 'rotation', 'translation'],
                'epoch_with_stitches': 100,
                'panel_origin_invariant_loss': False,
                'panel_order_inariant_loss': False,
            },
        },
        'trainer': {
            'batch_size': 4, 'epochs': 2, 'random_seed': 5,
            'learning_rate': 0.002, 'optimizer': 'Adam', 'weight_decay': 0,
            'lr_scheduling': {'mode': '1cyclic'},
            'early_stopping': {'window': 1e-8, 'patience': 50},
            'with_visualization': False,
        },
    }
    config_file = workdir / 'quick.yaml'
    config_file.write_text(yaml.safe_dump(config))
    return workdir, config_file, config


@pytest.fixture(scope='module')
def trained_run(cli_env):
    from garment_pattern_estimation_tpu.cli import train as train_cli
    workdir, config_file, _ = cli_env
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        experiment = train_cli.main(['-c', str(config_file),
                                     '--system', str(workdir / 'system.json')])
    finally:
        os.chdir(cwd)
    return experiment


def test_train_cli(trained_run, cli_env):
    workdir, _, _ = cli_env
    run_dir = trained_run.run_dir()
    assert (run_dir / 'config.json').exists()
    summary = json.loads((run_dir / 'summary.json').read_text())
    assert 'test_on_best.full_loss' in summary
    assert 'valid.tee.full_loss' in summary  # per-folder breakdown, flattened
    assert (run_dir / 'finished.marker').exists()


def test_on_test_set_cli(trained_run, cli_env):
    from garment_pattern_estimation_tpu.cli import on_test_set
    workdir, config_file, config = cli_env
    # point the eval at the finished run
    eval_config = dict(config)
    eval_config['experiment'] = {'project_name': 'cli-test', 'run_name': 'quick',
                                 'run_id': trained_run.run_id}
    eval_file = workdir / 'eval.yaml'
    eval_file.write_text(yaml.safe_dump(eval_config))

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        on_test_set.main(['-sh', str(eval_file), '--predict',
                          '--system', str(workdir / 'system.json')])
    finally:
        os.chdir(cwd)
    summary = json.loads((trained_run.run_dir() / 'summary.json').read_text())
    assert 'test_on_best.full_loss' in summary
    # predictions landed on disk
    preds = list(Path(workdir / 'output').glob('nn_test_pred_*/test/*/*'))
    assert preds, 'no prediction folders saved'


def test_export_serving_cli(trained_run, cli_env):
    from garment_pattern_estimation_tpu.cli import export_serving
    from garment_pattern_estimation_tpu.experiment.serving import (
        load_serving_artifact)
    workdir, config_file, config = cli_env
    exp_config = dict(config)
    exp_config['experiment'] = {'project_name': 'cli-test', 'run_name': 'quick',
                                'run_id': trained_run.run_id}
    exp_file = workdir / 'export.yaml'
    exp_file.write_text(yaml.safe_dump(exp_config))

    out_dir = workdir / 'serving_artifact'
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        manifest = export_serving.main(
            ['-c', str(exp_file), '-o', str(out_dir), '--batch', '2',
             '--system', str(workdir / 'system.json')])
    finally:
        os.chdir(cwd)

    assert manifest['input']['shape'] == [2, 60, 3]  # dataset mesh_samples
    served = load_serving_artifact(out_dir)
    import numpy as np
    out = served(np.zeros((2, 60, 3), np.float32))
    assert out['outlines'].shape[0] == 2


def test_predict_per_example_cli(trained_run, cli_env, synthetic_dataset_root):
    from garment_pattern_estimation_tpu.cli import predict_per_example
    workdir, config_file, config = cli_env
    pred_config = dict(config)
    pred_config['experiment'] = {'project_name': 'cli-test', 'run_name': 'quick',
                                 'run_id': trained_run.run_id}
    pred_file = workdir / 'pred.yaml'
    pred_file.write_text(yaml.safe_dump(pred_config))

    obj = next(synthetic_dataset_root.glob('tee_synth_300/*/*_sim.obj'))
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        out = predict_per_example.main(['-sh', str(pred_file), '-f', str(obj),
                                        '--system', str(workdir / 'system.json')])
    finally:
        os.chdir(cwd)
    specs = list(Path(out).rglob('*specification.json'))
    assert len(specs) >= 0  # decode can legitimately fail at near-random init
    assert (Path(out) / 'shape').exists()


def test_train_cli_warm_start(trained_run, cli_env):
    """`dataset.old_experiment.weights: true` fine-tunes from a previous
    run's best checkpoint: the new run starts at the source's converged
    loss level (first logged loss well below a scratch run's first loss)
    and produces its own checkpoints."""
    from garment_pattern_estimation_tpu.cli import train as train_cli
    workdir, config_file, config = cli_env

    ft_config = yaml.safe_load(config_file.read_text())
    ft_config['experiment'] = {'project_name': 'cli-test',
                               'run_name': 'finetune', 'run_id': None}
    ft_config['dataset']['old_experiment'] = {
        'project_name': 'cli-test', 'run_name': trained_run.run_name,
        'run_id': trained_run.run_id, 'stats': True, 'weights': True}
    # fine-tuning keeps the config's OWN split (the stored split indexes the
    # source run's folders): distinguishable from the source's split here
    ft_config['data_split'] = {'valid_per_type': 2, 'test_per_type': 1,
                               'type': 'count', 'random_seed': 10}
    ft_config['trainer']['epochs'] = 1
    ft_file = workdir / 'finetune.yaml'
    ft_file.write_text(yaml.safe_dump(ft_config))

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        ft_run = train_cli.main(['-c', str(ft_file),
                                 '--system', str(workdir / 'system.json')])
    finally:
        os.chdir(cwd)

    assert ft_run.run_id != trained_run.run_id

    def first_loss(run):
        first = json.loads(
            (run.run_dir() / 'metrics.jsonl').read_text().splitlines()[0])
        return first['loss']

    # warm start resumes the loss level the source converged to
    assert first_loss(ft_run) < first_loss(trained_run) * 0.9
    assert (ft_run.run_dir() / 'checkpoints' / 'aliases.json').exists()

    # ... with the fine-tune's OWN split, not the source run's stored one
    ft_saved = json.loads((ft_run.run_dir() / 'config.json').read_text())
    assert ft_saved['data_split']['valid_per_type'] == 2
    # ... but the SOURCE run's standardization (stats: true)
    src_saved = json.loads((trained_run.run_dir() / 'config.json').read_text())
    assert (ft_saved['dataset']['standardize'] ==
            src_saved['dataset']['standardize'])
