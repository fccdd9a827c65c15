"""Export a trained shape model as a self-contained AOT serving artifact.

    python -m garment_pattern_estimation_tpu.cli.export_serving \
        -c configs/att.yaml -o ./serving/att_b64 --batch 64 [--bf16]

Loads the experiment's best checkpoint, fuses feature standardization +
forward + prediction un-standardization into one program, and serializes it
with `jax.export` (experiment/serving.py). The resulting directory is the
whole deployment: no model code, config, or checkpoint needed at serving
time. `--bf16` exports the mixed-precision serving mode (encoder matmuls on
the MXU in bf16, outputs f32); `--platforms` lowers for an explicit platform
list (e.g. a CPU artifact exported from a TPU host).

The reference has no equivalent — its deployment unit is the research repo
itself (nn/evaluation_scripts/predict_per_example.py:114-210).
"""
from __future__ import annotations

import argparse
from pathlib import Path

from .common import load_yaml, system_properties, make_experiment


def get_values_from_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', '--config', type=str, default='./configs/att.yaml')
    parser.add_argument('-o', '--output', type=str, required=True,
                        help='artifact directory to create')
    parser.add_argument('-b', '--batch', type=int, default=64,
                        help='serving batch size baked into the program')
    parser.add_argument('-n', '--points', type=int, default=None,
                        help='points per cloud (default: dataset mesh_samples)')
    parser.add_argument('--bf16', action='store_true',
                        help='export the bf16 mixed-precision serving mode')
    parser.add_argument('--platforms', type=str, nargs='*', default=None,
                        help='lowering platforms (default: current backend)')
    parser.add_argument('--alias', type=str, default='best',
                        help='checkpoint alias to export')
    parser.add_argument('--system', type=str, default='./system.json')
    args = parser.parse_args(argv)
    return load_yaml(args.config), args


def main(argv=None):
    config, args = get_values_from_args(argv)
    system_info = system_properties(args.system)
    experiment = make_experiment(config, system_info)
    if not experiment.is_finished():
        print('Warning::Exporting an unfinished experiment')

    from ..experiment.serving import export_serving_artifact
    from ..models import build_model

    _, stored_batch, data_config = experiment.data_info()
    nn_config = dict(experiment.NN_config())
    if args.bf16:
        nn_config['compute_dtype'] = 'bfloat16'
    model = build_model(nn_config.get('model', 'GarmentSegmentPattern3D'),
                        data_config, nn_config, nn_config.get('loss', {}))
    checkpoint = experiment.get_best_model() if args.alias == 'best' \
        else experiment.get_checkpoint_file(args.alias)
    variables = checkpoint.get('variables', checkpoint)

    num_points = args.points or data_config.get('mesh_samples', 2000)
    manifest = export_serving_artifact(
        model, variables, data_config, args.output,
        batch_size=args.batch or stored_batch, num_points=num_points,
        platforms=args.platforms,
        extra_manifest={'experiment': experiment.full_name(),
                        'checkpoint_alias': args.alias,
                        'compute_dtype': 'bfloat16' if args.bf16 else 'float32'})
    print(f'export_serving::ok {args.output} '
          f'(platforms={manifest["platforms"]}, '
          f'{manifest["blob_bytes"] / 1e6:.1f} MB, '
          f'input {manifest["input"]["shape"]})')
    return manifest


if __name__ == '__main__':
    main()
