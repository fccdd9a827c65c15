"""End-to-end smoke: train the attention model on the synthetic dataset for a
few epochs through the full Trainer/ExperimentWrappper stack, evaluate, save
predictions, and resume from checkpoints."""
import jax
import numpy as np
import pytest

from garment_pattern_estimation_tpu.data import Garment3DPatternFullDataset
from garment_pattern_estimation_tpu.experiment import ExperimentWrappper
from garment_pattern_estimation_tpu.models import build_model
from garment_pattern_estimation_tpu.train import Trainer, eval_metrics, make_predict_fn

FOLDERS = ['tee_synth_300', 'skirt_synth_300', 'jumpsuit_synth_300']

NN_CONFIG = {
    'panel_encoding_size': 24, 'panel_hidden_size': 24, 'panel_n_layers': 1,
    'pattern_encoding_size': 24, 'pattern_hidden_size': 24, 'pattern_n_layers': 1,
    'EConv_hidden': 12, 'EConv_feature': 10, 'k_neighbors': 4, 'conv_depth': 1,
    'skip_connections': True, 'global_pool': 'mean', 'local_attention': True,
}
LOSS_CONFIG = {
    'loss_components': ['shape', 'loop', 'rotation', 'translation'],
    'quality_components': ['shape', 'discrete', 'rotation', 'translation'],
    'panel_order_inariant_loss': False,
    'panel_origin_invariant_loss': False,
    'epoch_with_stitches': 100,
}
TRAINER_SETUP = {
    'batch_size': 4, 'epochs': 3, 'random_seed': 16,
    'learning_rate': 2e-3, 'optimizer': 'Adam', 'weight_decay': 0,
    'lr_scheduling': {'mode': '1cyclic'},
    'early_stopping': {'window': 1e-8, 'patience': 50},
}


@pytest.fixture(scope='module')
def trained(synthetic_dataset_root, tmp_path_factory):
    out_dir = tmp_path_factory.mktemp('experiments')
    dataset = Garment3DPatternFullDataset(
        synthetic_dataset_root,
        {'data_folders': FOLDERS, 'mesh_samples': 60,
         'panel_classification': str(synthetic_dataset_root / 'panel_classes.json')},
        gt_caching=True, feature_caching=True)

    experiment = ExperimentWrappper(
        {'experiment': {'project_name': 'test-project', 'run_name': 'smoke'}},
        output_root=out_dir)

    trainer = Trainer(TRAINER_SETUP, experiment, dataset,
                      {'valid_per_type': 1, 'test_per_type': 1, 'type': 'count',
                       'random_seed': 10},
                      with_norm=True, with_visualization=False)
    trainer.init_randomizer()

    model = build_model('GarmentSegmentPattern3D', dataset.config, NN_CONFIG,
                        LOSS_CONFIG, use_pallas=False)
    variables, _ = trainer.fit(model)
    return dataset, experiment, trainer, model, variables, out_dir


def test_training_ran_and_logged(trained):
    dataset, experiment, trainer, model, variables, out_dir = trained
    metrics_file = experiment.run_dir() / 'metrics.jsonl'
    assert metrics_file.exists()
    import json
    records = [json.loads(line) for line in metrics_file.read_text().splitlines()]
    train_records = [r for r in records if 'loss' in r]
    assert len(train_records) == 3 * 2  # 3 epochs x 2 balanced batches (9 train / 4)
    # loss decreased from the first to the last epoch
    assert train_records[-1]['loss'] < train_records[0]['loss']
    assert all(np.isfinite(r['loss']) for r in train_records)
    # learning rate followed a schedule
    assert train_records[0]['learning_rate'] != train_records[-1]['learning_rate']


def test_checkpoints_and_best_alias(trained):
    _, experiment, *_ = trained
    aliases = experiment._aliases()
    assert 'latest' in aliases and 'best' in aliases
    ckpt = experiment.get_checkpoint_file('best')
    assert 'variables' in ckpt and 'opt_state' in ckpt
    assert ckpt['epoch'] <= 2


def test_load_model_honors_alias(trained):
    # load_model(alias=...) must load THAT checkpoint, not silently 'best'
    # (used by checkpoint-selection probes; regression: alias was ignored).
    dataset, experiment, *_ = trained
    if experiment._aliases()['latest'] == experiment._aliases()['best']:
        # force best != latest: save a perturbed state, which only bumps
        # the 'latest' alias
        ckpt = experiment.get_checkpoint_file('best')
        perturbed = dict(ckpt)
        perturbed['variables'] = jax.tree_util.tree_map(
            lambda x: x + 1.0 if np.issubdtype(np.asarray(x).dtype, np.floating)
            else x, ckpt['variables'])
        experiment.save_checkpoint(perturbed)
    assert experiment._aliases()['latest'] != experiment._aliases()['best']
    _, vars_best = experiment.load_model(dataset.config, alias='best')
    _, vars_latest = experiment.load_model(dataset.config, alias='latest')
    leaves_b = jax.tree_util.tree_leaves(vars_best)
    leaves_l = jax.tree_util.tree_leaves(vars_latest)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves_b, leaves_l))


def test_eval_metrics_full_stack(trained):
    dataset, experiment, trainer, model, variables, _ = trained
    metrics = eval_metrics(model, variables, trainer.datawrapper, 'validation')
    assert metrics['full_loss'] is not None and np.isfinite(metrics['full_loss'])
    assert 'panel_shape_l2' in metrics
    assert 'num_panels_accuracy' in metrics
    breakdown = eval_metrics(model, variables, trainer.datawrapper,
                             'valid_per_data_folder')
    assert set(breakdown.keys()) == {'tee', 'skirt', 'jumpsuit'}


def test_prediction_roundtrip(trained, tmp_path):
    dataset, experiment, trainer, model, variables, _ = trained
    predict_fn = make_predict_fn(model, variables)
    pred_path = experiment.prediction(
        tmp_path, predict_fn, trainer.datawrapper, nick='smoke', sections=['test'])
    spec_files = list(pred_path.rglob('*_predicted__specification.json'))
    assert len(spec_files) >= 1  # some predictions may fail to decode at random init
    # predictions keep ORIGINAL folder names so they can serve as a dataset
    # root for the stitch model (reference: experiment.py:245 orig_folder_names)
    folders = {p.name for p in (pred_path / 'test').iterdir() if p.is_dir()}
    assert folders <= {'tee_synth_300', 'skirt_synth_300', 'jumpsuit_synth_300'}
    assert folders


def test_resume_from_checkpoint(trained, synthetic_dataset_root):
    dataset, experiment, trainer, model, variables, out_dir = trained
    # new trainer resuming the same run: starts at epoch 3, trains 1 more
    experiment2 = ExperimentWrappper(
        {'experiment': {'project_name': 'test-project', 'run_name': 'smoke',
                        'run_id': experiment.run_id}},
        output_root=out_dir)
    setup = dict(TRAINER_SETUP, epochs=4)
    trainer2 = Trainer(setup, experiment2, dataset,
                       {'valid_per_type': 1, 'test_per_type': 1, 'type': 'count',
                        'random_seed': 10},
                       with_norm=True)
    trainer2.init_randomizer()
    model2 = build_model('GarmentSegmentPattern3D', dataset.config, NN_CONFIG,
                         LOSS_CONFIG, use_pallas=False)
    trainer2.fit(model2)
    assert experiment2.resumed
    assert experiment2.last_epoch() >= 3


def test_zero_batch_training_subset_fails_loudly(trained, tmp_path):
    """Regression: a training subset smaller than one batch yields zero
    batches (partial batches are dropped, reference semantics) — the trainer
    must refuse instead of silently 'training' on nothing."""
    dataset = trained[0]
    experiment = ExperimentWrappper(
        {'experiment': {'project_name': 'test-project', 'run_name': 'zero'}},
        output_root=tmp_path)
    setup = dict(TRAINER_SETUP, batch_size=4096)
    trainer = Trainer(setup, experiment, dataset,
                      {'valid_per_type': 1, 'test_per_type': 1,
                       'type': 'count', 'random_seed': 10},
                      with_norm=True, with_visualization=False)
    trainer.init_randomizer()
    model = build_model('GarmentSegmentPattern3D', dataset.config, NN_CONFIG,
                        LOSS_CONFIG, use_pallas=False)
    with pytest.raises(ValueError, match='produces no batches'):
        trainer.fit(model)


def test_onecycle_schedule_never_nan():
    """Regression: optax's onecycle emits NaN for every step when
    transition_steps <= 3 (tiny-run configs); the trainer clamps it."""
    from garment_pattern_estimation_tpu.train.trainer import Trainer

    trainer = Trainer.__new__(Trainer)
    trainer.setup = {'learning_rate': 2e-3, 'epochs': 2,
                     'lr_scheduling': {'mode': '1cyclic'}, 'optimizer': 'Adam'}
    trainer._make_optimizer(steps_per_epoch=1)
    values = [float(trainer.schedule(i)) for i in range(6)]
    assert all(np.isfinite(values)), values


def test_f32_precision_tail(synthetic_dataset_root, tmp_path_factory, capsys):
    """`trainer.f32_tail_epochs` under bf16 compute switches the jitted
    steps to f32 for the last K scheduled epochs: training completes, the
    switch is announced once, params keep improving across the boundary
    (same optimizer state), and the final checkpoint evaluates cleanly."""
    out_dir = tmp_path_factory.mktemp('experiments')
    dataset = Garment3DPatternFullDataset(
        synthetic_dataset_root,
        {'data_folders': FOLDERS, 'mesh_samples': 60,
         'panel_classification': str(synthetic_dataset_root / 'panel_classes.json')},
        gt_caching=True, feature_caching=True)
    experiment = ExperimentWrappper(
        {'experiment': {'project_name': 'test-project', 'run_name': 'tail'}},
        output_root=out_dir)
    setup = dict(TRAINER_SETUP, epochs=3, f32_tail_epochs=1)
    trainer = Trainer(setup, experiment, dataset,
                      {'valid_per_type': 1, 'test_per_type': 1, 'type': 'count',
                       'random_seed': 10},
                      with_norm=True, with_visualization=False)
    trainer.init_randomizer()
    model = build_model('GarmentSegmentPattern3D', dataset.config,
                        dict(NN_CONFIG, compute_dtype='bfloat16'),
                        LOSS_CONFIG, use_pallas=False)
    variables, _ = trainer.fit(model)

    out = capsys.readouterr().out
    assert out.count('precision tail: compute_dtype bfloat16 -> float32') == 1
    # both precisions compiled a train step (cache keyed on compute_dtype)
    train_keys = [k for k in trainer._step_cache if k[0] == 'train']
    assert {k[-1] for k in train_keys} == {'bfloat16', None}
    # the run produced a usable final state
    metrics = eval_metrics(model, variables, trainer.datawrapper, 'test')
    assert np.isfinite(metrics['full_loss'])


def test_f32_tail_entered_on_early_stop(synthetic_dataset_root,
                                        tmp_path_factory, capsys):
    """An early-stop signal during the bf16 phase enters the f32 tail
    (rather than ending the run before the tail was reached); a second
    early-stop signal inside the tail then genuinely stops."""
    out_dir = tmp_path_factory.mktemp('experiments')
    dataset = Garment3DPatternFullDataset(
        synthetic_dataset_root,
        {'data_folders': FOLDERS, 'mesh_samples': 60,
         'panel_classification': str(synthetic_dataset_root / 'panel_classes.json')},
        gt_caching=True, feature_caching=True)
    experiment = ExperimentWrappper(
        {'experiment': {'project_name': 'test-project', 'run_name': 'tailjump'}},
        output_root=out_dir)
    # patience 0 + huge window: the flat-window rule fires every epoch
    # after the first two — long before the scheduled tail boundary
    setup = dict(TRAINER_SETUP, epochs=40, f32_tail_epochs=5,
                 early_stopping={'window': 1e9, 'patience': 0})
    trainer = Trainer(setup, experiment, dataset,
                      {'valid_per_type': 1, 'test_per_type': 1, 'type': 'count',
                       'random_seed': 10},
                      with_norm=True, with_visualization=False)
    trainer.init_randomizer()
    model = build_model('GarmentSegmentPattern3D', dataset.config,
                        dict(NN_CONFIG, compute_dtype='bfloat16'),
                        LOSS_CONFIG, use_pallas=False)
    trainer.fit(model)

    out = capsys.readouterr().out
    assert 'entering the f32 precision tail early' in out
    assert out.count('precision tail: compute_dtype bfloat16 -> float32') == 1
    assert 'Stopped training early' in out       # the tail itself then stops
    # the run did not burn the full 40-epoch budget
    assert out.count('Validation Loss') < 12
