"""Eval-time precision attribution for the bf16 placement regression.

The full-scale bf16 training A/B (docs/DemoResults.md) costs ~1.7x on
placement L2 at convergence, and the conv0 precision island made it WORSE.
This probe separates *forward quantization* from *training dynamics*: it
evaluates one f32-trained checkpoint under bf16 compute applied at
different sites and reads which site moves rotation/translation L2 at
eval time. If no eval-time variant reproduces the placement gap, the
regression is a training-dynamics effect (gradient/update noise), not a
forward-precision one — and islanding forward layers can't fix it.

Usage (after an f32 run of demo_configs/shape_full.yaml exists):

    python parity_run/precision_probe.py \
        -c demo_configs/shape_full.yaml -o parity_run/precision_probe.json
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

from garment_pattern_estimation_tpu.cli.common import (
    load_yaml, system_properties, make_experiment)
from garment_pattern_estimation_tpu.train import eval_metrics


# name -> NN-config patch applied on top of the stored (f32) run config
VARIANTS = {
    # control: must reproduce the run's recorded test metrics
    'f32': {},
    # the serving/experimentation mode as shipped
    'bf16_all': {'compute_dtype': 'bfloat16'},
    # conv0 exact (the round-3 island that destabilized in training)
    'bf16_island_conv0': {'compute_dtype': 'bfloat16',
                          'f32_conv_layers': [0]},
    # conv1 (the wide feature layer feeding attention+placement) exact
    'bf16_island_conv1': {'compute_dtype': 'bfloat16',
                          'f32_conv_layers': [1]},
    # only the attention MLP in bf16 (both convs exact)
    'bf16_att_only': {'compute_dtype': 'bfloat16',
                      'f32_conv_layers': [0, 1]},
    # convs in bf16, attention MLP exact
    'bf16_convs_only': {'compute_dtype': 'bfloat16',
                        'f32_attention_mlp': True},
}

METRIC_KEYS = ('panel_shape_l2', 'rotation_l2', 'translation_l2',
               'num_panels_accuracy', 'num_edges_accuracy')


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--config', default='demo_configs/shape_full.yaml')
    parser.add_argument('--system', default='./system.json')
    parser.add_argument('-o', '--out', default='parity_run/precision_probe.json')
    parser.add_argument('--run_id', default=None,
                        help='run id of the finished experiment (overrides '
                             'the yaml, which usually ships run_id: null)')
    args = parser.parse_args(argv)

    config = load_yaml(args.config)
    if args.run_id:
        config.setdefault('experiment', {})['run_id'] = args.run_id
    system_info = system_properties(args.system)
    experiment = make_experiment(config, system_info)
    if not experiment.is_finished():
        print('Warning::probing an unfinished experiment')
    dataset, wrapper = experiment.load_dataset(
        Path(system_info['datasets_path']))

    results = {}
    for name, patch in VARIANTS.items():
        model, variables = experiment.load_model(
            dataset.config, nn_overrides=patch)
        metrics = eval_metrics(model, variables, wrapper, 'test')
        row = {k: float(v) for k, v in metrics.items()
               if any(k.endswith(m) or k == m for m in METRIC_KEYS)
               or k in METRIC_KEYS}
        results[name] = {'patch': patch, 'metrics': row}
        print(f'{name:>22}: ' + ', '.join(
            f'{k}={v:.4g}' for k, v in sorted(row.items())))

    Path(args.out).write_text(json.dumps(results, indent=1))
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
