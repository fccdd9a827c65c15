"""One REAL multi-device training run, end to end (VERDICT r4 #6).

Drives ``cli.train`` twice at synthetic_quick scale on the virtual 8-device
CPU mesh: once with ``trainer.mesh: {data: 8}`` (batch sharded over all 8
devices, params replicated, gradient psum — the reference trained whole runs
under DataParallel, nn/train.py:124) and once on a single device with the
same seed/split/schedule. The whole L5/L6 surface runs under sharding —
epoch loop, per-epoch validation, checkpointing with best alias, final
four-section eval — not just a single step.

Asserts:
  * both runs complete with finished.marker + best checkpoints;
  * first-epoch validation losses agree to ~1e-4 relative (identical math
    modulo reduction order);
  * final best-checkpoint test metrics agree within a chaos-of-training
    tolerance (float noise amplifies over 20 epochs; systematic sharding
    bugs produce far larger gaps — the first-epoch bound is the sharp one).

Writes parity_run/multichip_train_demo.json and exits nonzero on failure.

Run:
    JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python parity_run/multichip_train_demo.py
"""
import json
import os
import sys
import tempfile
import time
from pathlib import Path

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
os.environ.setdefault('JAX_PLATFORM_NAME', 'cpu')
if 'xla_force_host_platform_device_count' not in os.environ.get('XLA_FLAGS', ''):
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import yaml  # noqa: E402

# the axon sitecustomize may have imported jax before this script's env
# lines ran (freezing env-derived config) — override the live config too,
# exactly like tests/conftest.py
try:
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_platform_name', 'cpu')
except Exception:
    pass

BASE_CONFIG = {
    'experiment': {'project_name': 'Multichip-Demo', 'run_id': None},
    'dataset': {
        'class': 'Garment3DPatternFullDataset',
        'data_folders': ['tee_synth_300', 'skirt_synth_300', 'jumpsuit_synth_300'],
        'mesh_samples': 500, 'obj_filetag': 'sim', 'point_noise_w': 0,
        'panel_classification': './data/panel_classes.json',
        'max_datapoints_per_type': 40,
    },
    'data_split': {'valid_per_type': 3, 'test_per_type': 3,
                   'random_seed': 10, 'type': 'count'},
    'NN': {
        'model': 'GarmentSegmentPattern3D',
        'feature_extractor': 'EdgeConvFeatures',
        'conv_depth': 2, 'k_neighbors': 5, 'EConv_hidden': 64,
        'EConv_hidden_depth': 2, 'EConv_feature': 48, 'EConv_aggr': 'max',
        'global_pool': 'mean', 'skip_connections': True,
        'local_attention': True, 'panel_decoder': 'LSTMDecoderModule',
        'panel_encoding_size': 64, 'panel_hidden_size': 64,
        'panel_n_layers': 2, 'lstm_init': '', 'stitch_tag_dim': 3,
        'loss': {
            'loss_components': ['shape', 'loop', 'rotation', 'translation'],
            'quality_components': ['shape', 'discrete', 'rotation', 'translation'],
            'epoch_with_stitches': 100,
            'panel_origin_invariant_loss': False,
            'panel_order_inariant_loss': False,
        },
    },
    'trainer': {
        # batch 8 = one sample per device on the 8-way mesh; the 31-sample
        # training subset leaves a remainder batch every epoch, exercising
        # the pad-to-mesh-multiple path end to end
        'batch_size': 8, 'epochs': 20, 'random_seed': 10,
        'learning_rate': 0.002, 'optimizer': 'Adam', 'weight_decay': 0,
        'lr_scheduling': {'mode': '1cyclic'},
        'early_stopping': {'window': 1e-4, 'patience': 50},
        'with_visualization': False,
    },
}

METRIC_KEYS = ('full_loss', 'panel_shape_l2', 'num_panels_accuracy',
               'num_edges_accuracy', 'rotation_l2', 'translation_l2')


def run_one(tag, mesh, out_root):
    from garment_pattern_estimation_tpu.cli import train as train_cli

    cfg = json.loads(json.dumps(BASE_CONFIG))  # deep copy
    cfg['experiment']['run_name'] = f'mc_{tag}'
    # ALWAYS pin the mesh: with no trainer.mesh the Trainer defaults to a
    # data-parallel mesh over every visible device, so the 'single' arm
    # would silently shard over the same 8 devices as the mesh arm
    cfg['trainer']['mesh'] = mesh if mesh else {'data': 1}
    with tempfile.TemporaryDirectory() as tmp:
        cfg_path = Path(tmp) / f'{tag}.yaml'
        cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))
        system = Path(tmp) / 'system.json'
        system.write_text(json.dumps(
            {'datasets_path': './data', 'output': str(out_root)}))
        t0 = time.time()
        experiment = train_cli.main(['-c', str(cfg_path),
                                     '--system', str(system)])
        wall = time.time() - t0

    run_dir = experiment.run_dir()
    assert (run_dir / 'finished.marker').exists(), f'{tag}: no finished.marker'
    aliases = json.loads((run_dir / 'checkpoints' / 'aliases.json').read_text())
    assert 'best' in aliases and 'latest' in aliases, f'{tag}: aliases missing'
    records = [json.loads(l) for l in
               (run_dir / 'metrics.jsonl').read_text().splitlines()]
    epoch_recs = [r for r in records if 'valid_loss' in r]
    summary = json.loads((run_dir / 'summary.json').read_text())
    return {
        'run': experiment.full_name(),
        'wall_s': round(wall, 1),
        'epochs_ran': len(epoch_recs),
        'first_valid_loss': epoch_recs[0]['valid_loss'],
        'final_valid_loss': epoch_recs[-1]['valid_loss'],
        'best_epoch': aliases['best'],
        'test_on_best': {k: summary['test_on_best'].get(k)
                         for k in METRIC_KEYS},
    }


def main():
    devices = jax.devices()
    print(f'devices: {len(devices)} x {devices[0].platform}')
    assert len(devices) >= 8, 'need the 8-device virtual mesh'

    out_root = Path('./output/multichip_demo')
    sharded = run_one('mesh8', {'data': 8}, out_root)
    single = run_one('single', None, out_root)

    rel = abs(sharded['first_valid_loss'] - single['first_valid_loss']) \
        / abs(single['first_valid_loss'])
    checks = {'first_epoch_valid_rel_delta': rel}
    ok = rel < 1e-3
    deltas = {}
    for key in METRIC_KEYS:
        a, b = sharded['test_on_best'][key], single['test_on_best'][key]
        if a is None or b is None:
            continue
        deltas[key] = abs(a - b) / max(abs(b), 1e-3)
    checks['final_test_metric_rel_deltas'] = deltas
    # chaos bound: 20 epochs of divergence-amplified float noise; a sharding
    # BUG (wrong psum, dropped remainder rows, desynced params) shows up as
    # O(1) differences and a broken first-epoch bound
    ok = ok and all(v < 0.30 for v in deltas.values())
    ok = ok and sharded['epochs_ran'] == single['epochs_ran'] == 20

    report = {'sharded': sharded, 'single': single, 'checks': checks,
              'pass': bool(ok)}
    out = Path(__file__).parent / 'multichip_train_demo.json'
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))
    print('PASS' if ok else 'FAIL')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
