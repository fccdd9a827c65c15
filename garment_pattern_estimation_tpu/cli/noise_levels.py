"""Robustness sweep over point-cloud noise levels.

Counterpart of nn/evaluation_scripts/noise_levels.py: re-evaluates the shape
model with gaussian noise sigma in {0.0 .. 1.0} added to input clouds and
dumps the per-level metric summaries.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

from .common import load_yaml, system_properties, make_experiment
from ..train import eval_metrics


NOISE_LEVELS = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-sh', '--shape_config', type=str, default='./configs/att.yaml')
    parser.add_argument('-u', '--unseen', action='store_true')
    parser.add_argument('--levels', type=float, nargs='*', default=NOISE_LEVELS)
    parser.add_argument('--system', type=str, default='./system.json')
    args = parser.parse_args(argv)

    shape_config = load_yaml(args.shape_config)
    system_info = system_properties(args.system)
    experiment = make_experiment(shape_config, system_info)
    section = 'full' if args.unseen else 'test'

    summaries = {}
    model = variables = None
    for level in args.levels:
        dataset, wrapper = experiment.load_dataset(
            Path(system_info['datasets_path']),
            {'obj_filetag': 'sim', 'point_noise_w': level},
            unseen=args.unseen)
        if model is None:
            # the checkpoint/model is identical across noise levels — only
            # the dataset's noise injection changes; load once
            model, variables = experiment.load_model(dataset.config)
        metrics = eval_metrics(model, variables, wrapper, section)
        summaries[str(level)] = metrics
        print(f'noise {level}: {metrics}')
        experiment.add_statistic(f'noise_{level}', metrics)

    out_file = Path(system_info['output']) / 'noise_levels_summary.json'
    out_file.parent.mkdir(parents=True, exist_ok=True)
    with open(out_file, 'w') as f:
        json.dump(summaries, f, indent=2)
    print(f'Saved {out_file}')
    return summaries


if __name__ == '__main__':
    main()
