"""Evaluate a finished run's 'best' and 'latest' checkpoints on its test
split (+ per-folder breakdown) through the stored config — the instrument
behind the LSTM checkpoint-selection finding (parity_run/
lstm_rerun_ckpt_probe.json, round 4) and the round-5 best_by verification.

Usage:
    python parity_run/ckpt_probe.py <project>/<run_name>_<run_id> \
        [--output probe.json] [--system ./system.json]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('run', help='<project>/<run_name>_<run_id>')
    parser.add_argument('--output', default='')
    parser.add_argument('--system', default='./system.json')
    args = parser.parse_args(argv)

    from garment_pattern_estimation_tpu.cli.common import (system_properties,
                                                           make_experiment)
    from garment_pattern_estimation_tpu.train import eval_metrics

    system_info = system_properties(args.system)
    project, run_full = args.run.split('/', 1)
    run_name, run_id = run_full.rsplit('_', 1)
    experiment = make_experiment(
        {'experiment': {'project_name': project, 'run_name': run_name,
                        'run_id': run_id}}, system_info)
    dataset, wrapper = experiment.load_dataset(system_info['datasets_path'])

    report = {'run': args.run, 'summary_best_monitor':
              experiment.summary.get('best_monitor')}
    for alias in ('best', 'latest'):
        model, variables = experiment.load_model(dataset.config, alias=alias)
        model.loss.with_quality_eval = True
        report[alias] = {
            'ckpt_version': experiment._aliases().get(alias),
            'test': eval_metrics(model, variables, wrapper, 'test'),
            'per_folder': eval_metrics(model, variables, wrapper,
                                       'test_per_data_folder'),
        }
        print(alias, json.dumps({k: round(v, 4) for k, v in
                                 report[alias]['test'].items()
                                 if isinstance(v, float)}, indent=None))

    out = args.output or f'parity_run/probe_{run_name}_{run_id}.json'
    Path(out).write_text(json.dumps(report, indent=1, default=float))
    print(f'-> {out}')


if __name__ == '__main__':
    main()
