"""Training entry point.

Counterpart of nn/train.py::

    python -m garment_pattern_estimation_tpu.cli.train -c configs/att.yaml

Supports the reference's YAML schema (experiment / dataset+data_split / NN /
trainer sections) including the `old_experiment` flows: reuse a previous
run's data stats, or train the stitch model on a previous shape model's
predictions (the two-model pipeline handoff, SURVEY.md §3.5).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from .common import load_yaml, system_properties, make_experiment, merge_repos
from ..models import build_model
from ..train import Trainer, eval_metrics, make_predict_fn


def get_values_from_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', '-c', help='YAML configuration file',
                        type=str, default='./configs/att.yaml')
    parser.add_argument('--system', help='system properties JSON',
                        type=str, default='./system.json')
    args = parser.parse_args(argv)
    return load_yaml(args.config), args


def get_old_data_config(in_config, system_info, output_root):
    """Pull data stats/config from a previous run (train.py:34-62)."""
    old_experiment = make_experiment(
        {'experiment': in_config['old_experiment']}, system_info)
    split, _, data_config = old_experiment.data_info()
    minimal = {
        key: data_config.get(key) for key in (
            'standardize', 'max_pattern_len', 'max_panel_len', 'max_num_stitches',
            'max_datapoints_per_type', 'panel_classification', 'filter_by_params',
            'mesh_samples', 'obj_filetag')
    }
    minimal['point_noise_w'] = data_config.get('point_noise_w', 0)
    in_config.update({k: v for k, v in minimal.items() if v is not None})
    return split, in_config


def main(argv=None):
    np.set_printoptions(precision=4, suppress=True)
    config, args = get_values_from_args(argv)
    system_info = system_properties(args.system)

    experiment = make_experiment(config, system_info)
    datasets_path = Path(system_info['datasets_path'])

    # --- old-experiment dataflows ---
    dataset_section = config['dataset']
    old = dataset_section.get('old_experiment')
    if old and old.get('predictions'):
        # train on a previous shape model's predictions (stitch-model bootstrap)
        shape_experiment = make_experiment({'experiment': old}, system_info)
        shape_dataset, shape_wrapper = shape_experiment.load_dataset(datasets_path)
        shape_model, shape_variables = shape_experiment.load_model(shape_dataset.config)
        predict_fn = make_predict_fn(shape_model, shape_variables)
        pred_path = shape_experiment.prediction(
            Path(system_info['output']), predict_fn, shape_wrapper, nick='',
            sections=['train', 'validation', 'test'])
        datasets_path = merge_repos(pred_path, ['train', 'validation', 'test'])
    if old and old.get('stats'):
        old_split, config['dataset'] = get_old_data_config(
            dataset_section, system_info, system_info['output'])
        # fine-tuning (weights: true) on a different dataset composition
        # keeps its OWN split when one is given: the stored split indexes
        # the source run's folders and would drop every new-type datapoint
        if not (old.get('weights') and config.get('data_split')):
            config['data_split'] = old_split

    # --- dataset ---
    from ..data import DATASET_REGISTRY
    data_class = DATASET_REGISTRY[config['dataset'].get(
        'class', 'Garment3DPatternFullDataset')]
    dataset = data_class(datasets_path, config['dataset'],
                         gt_caching=True, feature_caching=True)

    # --- trainer ---
    trainer = Trainer(config['trainer'], experiment, dataset,
                      config.get('data_split', {}), with_norm=True,
                      with_visualization=config['trainer'].get(
                          'with_visualization', False))
    trainer.init_randomizer()

    # --- model ---
    # a points-sharded (2-D) mesh needs the XLA encoder path: the Pallas
    # kernels assume a device-local point axis (docs/Running.md TPU notes)
    mesh_cfg = config['trainer'].get('mesh')
    use_pallas = False if (isinstance(mesh_cfg, dict)
                           and int(mesh_cfg.get('points', 1)) > 1) else None
    model = build_model(config['NN'].get('model', 'GarmentSegmentPattern3D'),
                        dataset.config, config['NN'],
                        config['NN'].get('loss', {}), use_pallas=use_pallas)
    model.loss.with_quality_eval = True
    model.loss.debug_prints = True

    # record canonicalization flags into the dataset config: prediction
    # saving must not propagate GT stitch/edge ids for models trained with
    # order/origin matching (their panel slots are arbitrary)
    dataset.config['order_matching'] = bool(
        model.loss.config.get('panel_order_inariant_loss', False))
    dataset.config['origin_matching'] = bool(
        model.loss.config.get('panel_origin_invariant_loss', False))

    # --- warm start (fine-tuning) ---
    # `dataset.old_experiment.weights: true` initializes from that run's
    # best checkpoint instead of random init: a fresh run id, a fresh
    # optimizer/schedule, pre-trained parameters. Extends the reference's
    # old_experiment flows (its pre-trained fallback lives only in eval,
    # experiment.py:311-335); pair with `stats: true` so the new run keeps
    # the standardization the pre-trained weights were fit under.
    warm_variables = None
    if old and old.get('weights'):
        source = make_experiment({'experiment': old}, system_info)
        checkpoint = source.get_best_model()
        warm_variables = checkpoint['variables'] \
            if 'variables' in checkpoint else checkpoint
        print(f'Train::warm start from {source.full_name()} (best checkpoint)')

    # --- train ---
    variables, _ = trainer.fit(model, variables=warm_variables)

    # --- final evaluation on the best checkpoint ---
    try:
        best = experiment.get_best_model()
        variables = best['variables']
    except Exception as e:  # NOT BaseException: Ctrl-C must abort, not
        print(e)            # silently continue into four eval sections
        print('Train::Warning::evaluating with the current (final) model state')

    if (config['trainer'].get('f32_tail_epochs')
            and config['NN'].get('compute_dtype')):
        # the best checkpoint of a bf16+tail run comes from the f32 tail:
        # evaluate it at f32 too, not through the in-memory bf16 forward
        # (eval-time bf16 on an f32 checkpoint skews placement <0.5% —
        # parity_run/precision_probe.json — but zero is cheaper than small)
        print('Train::f32 tail run: final eval with an f32 forward')
        model = build_model(config['NN'].get('model', 'GarmentSegmentPattern3D'),
                            dataset.config,
                            dict(config['NN'], compute_dtype=None),
                            config['NN'].get('loss', {}), use_pallas=use_pallas)
        model.loss.with_quality_eval = True

    datawrapper = trainer.datawrapper
    experiment.add_statistic('valid_on_best',
                             eval_metrics(model, variables, datawrapper, 'validation'),
                             log='Validation metrics')
    experiment.add_statistic('valid',
                             eval_metrics(model, variables, datawrapper,
                                          'valid_per_data_folder'),
                             log='Validation metrics breakdown')
    experiment.add_statistic('test_on_best',
                             eval_metrics(model, variables, datawrapper, 'test'),
                             log='Test metrics')
    experiment.add_statistic('test',
                             eval_metrics(model, variables, datawrapper,
                                          'test_per_data_folder'),
                             log='Test metrics breakdown')
    experiment.stop()
    return experiment


if __name__ == '__main__':
    main()
