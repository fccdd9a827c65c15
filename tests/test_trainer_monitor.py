"""trainer.best_by: checkpoint-selection monitor.

The reference's best-alias rule is lowest total validation loss
(nn/trainer.py:120-125); after the epoch-40 loss-structure change that rule
stops tracking threshold-style metrics (a best-val checkpoint measured 0.42
edge accuracy while later checkpoints sit at 1.0 —
parity_run/lstm_rerun_ckpt_probe.json). `trainer.best_by` selects 'best' by
a named validation metric instead, ties broken by the loss rule.
"""
import json

import numpy as np
import pytest

from garment_pattern_estimation_tpu.data import Garment3DPatternFullDataset
from garment_pattern_estimation_tpu.experiment import ExperimentWrappper
from garment_pattern_estimation_tpu.models import build_model
from garment_pattern_estimation_tpu.train import Trainer

FOLDERS = ['tee_synth_300', 'skirt_synth_300', 'jumpsuit_synth_300']
NN_CONFIG = {
    'panel_encoding_size': 24, 'panel_hidden_size': 24, 'panel_n_layers': 1,
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


# ---------- unit: the selection rule ----------

def test_best_update_loss_rule():
    up = Trainer._best_update
    assert up(1.0, None, None, None, False)            # first finite loss
    assert up(0.5, None, 1.0, None, False)             # improvement
    assert not up(2.0, None, 1.0, None, False)         # regression
    assert not up(np.nan, None, 1.0, None, False)      # NaN never latches
    assert up(1.0, None, np.nan, None, False)          # recovers from NaN best


def test_best_update_monitor_max_with_loss_tiebreak():
    up = Trainer._best_update
    # higher monitor wins even with worse loss
    assert up(9.0, 0.8, 1.0, 0.5, True)
    assert not up(0.1, 0.4, 1.0, 0.5, True)
    # equal monitor: fall back to the loss rule
    assert up(0.5, 0.8, 1.0, 0.8, True)
    assert not up(2.0, 0.8, 1.0, 0.8, True)
    # minimize direction
    assert up(9.0, 0.3, 1.0, 0.5, False)
    assert not up(0.1, 0.7, 1.0, 0.5, False)
    # NaN monitor never latches; None/NaN best always replaced by finite
    assert not up(0.1, np.nan, 1.0, 0.5, True)
    assert up(0.1, 0.2, 1.0, None, True)
    assert up(0.1, 0.2, 1.0, np.nan, True)


def test_monitor_direction_inference_and_explicit_mode(capsys):
    tracker = ExperimentWrappper({'experiment': {}})
    t = Trainer(dict(TRAINER_SETUP, best_by='num_edges_accuracy'), tracker)
    assert t._monitor_max and t._monitor_needs_quality
    assert 'maximize' in capsys.readouterr().out
    # a loss-suffixed monitor needs no quality eval and minimizes
    t = Trainer(dict(TRAINER_SETUP, best_by='translation_loss'), tracker)
    assert not t._monitor_max and not t._monitor_needs_quality
    # explicit mode overrides the name inference
    t = Trainer(dict(TRAINER_SETUP, best_by='panel_shape_l2',
                     best_by_mode='min'), tracker)
    assert not t._monitor_max
    t = Trainer(dict(TRAINER_SETUP, best_by='custom_score',
                     best_by_mode='max'), tracker)
    assert t._monitor_max
    with pytest.raises(ValueError, match='best_by_mode'):
        Trainer(dict(TRAINER_SETUP, best_by='x', best_by_mode='up'), tracker)


def test_partially_constructed_trainer_has_monitor_defaults():
    """Regression: probes/tests build Trainers via __new__ (only mesh +
    _step_cache set); _eval_step_fn reads the monitor attributes and must
    see the class defaults, not crash (round-4 HEAD breakage)."""
    t = Trainer.__new__(Trainer)
    assert t._monitor_needs_quality is False
    assert t._monitor_key is None
    assert t.device_sampler is None and t.mesh is None


# ---------- e2e: the best alias tracks the monitor ----------

@pytest.fixture(scope='module')
def monitored(synthetic_dataset_root, tmp_path_factory):
    out_dir = tmp_path_factory.mktemp('experiments')
    dataset = Garment3DPatternFullDataset(
        synthetic_dataset_root,
        {'data_folders': FOLDERS, 'mesh_samples': 60,
         'panel_classification': str(synthetic_dataset_root / 'panel_classes.json')},
        gt_caching=True, feature_caching=True)
    experiment = ExperimentWrappper(
        {'experiment': {'project_name': 'test-project', 'run_name': 'monitor'}},
        output_root=out_dir)
    setup = dict(TRAINER_SETUP, epochs=4, best_by='num_edges_accuracy')
    trainer = Trainer(setup, experiment, dataset,
                      {'valid_per_type': 1, 'test_per_type': 1, 'type': 'count',
                       'random_seed': 10},
                      with_norm=True, with_visualization=False)
    trainer.init_randomizer()
    model = build_model('GarmentSegmentPattern3D', dataset.config, NN_CONFIG,
                        LOSS_CONFIG, use_pallas=False)
    trainer.fit(model)
    return dataset, experiment


def test_best_alias_tracks_monitor(monitored):
    _, experiment = monitored
    records = [json.loads(line) for line in
               (experiment.run_dir() / 'metrics.jsonl').read_text().splitlines()]
    epochs = [r for r in records if 'valid_num_edges_accuracy' in r]
    assert len(epochs) == 4  # quality eval ran in every validation pass
    monitors = [r['valid_num_edges_accuracy'] for r in epochs]
    # the recorded best_monitor is the running max of the monitor
    assert epochs[-1]['best_monitor'] == pytest.approx(max(monitors))
    assert experiment.summary['best_monitor'] == pytest.approx(max(monitors))
    # the best alias points at an epoch achieving that monitor value
    best_epoch = experiment.get_checkpoint_file('best')['epoch']
    assert monitors[best_epoch] == pytest.approx(max(monitors))
    # among max-monitor epochs, ties broke to the lowest validation loss
    tied = [r for r, m in zip(epochs, monitors)
            if m == pytest.approx(max(monitors))]
    assert epochs[best_epoch]['valid_loss'] == pytest.approx(
        min(r['valid_loss'] for r in tied))


def test_monitor_absent_falls_back_to_loss_rule(synthetic_dataset_root,
                                                tmp_path_factory, capsys):
    """A phase-dependent monitor (e.g. stitch_precision before the stitch
    phase) is absent from the validation dict: the trainer must warn and use
    the loss rule, not crash (ADVICE r4)."""
    out_dir = tmp_path_factory.mktemp('experiments')
    dataset = Garment3DPatternFullDataset(
        synthetic_dataset_root,
        {'data_folders': FOLDERS, 'mesh_samples': 60,
         'panel_classification': str(synthetic_dataset_root / 'panel_classes.json')},
        gt_caching=True, feature_caching=True)
    experiment = ExperimentWrappper(
        {'experiment': {'project_name': 'test-project', 'run_name': 'absent'}},
        output_root=out_dir)
    setup = dict(TRAINER_SETUP, epochs=2, best_by='stitch_precision')
    trainer = Trainer(setup, experiment, dataset,
                      {'valid_per_type': 1, 'test_per_type': 1, 'type': 'count',
                       'random_seed': 10},
                      with_norm=True, with_visualization=False)
    trainer.init_randomizer()
    model = build_model('GarmentSegmentPattern3D', dataset.config, NN_CONFIG,
                        LOSS_CONFIG, use_pallas=False)
    trainer.fit(model)  # must complete
    out = capsys.readouterr().out
    assert out.count('using the validation-loss rule') == 1  # warned once
    assert 'best' in experiment._aliases()  # loss rule still latched a best
