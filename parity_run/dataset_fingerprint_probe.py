"""Verify a regenerated ./data copy reproduces the ab_r5 campaign batches.

The campaign report (`train_ab_r5_a.json`) pins the torch/JAX step-0 loss
from the matched init (torch.manual_seed(train_seed=1)) on the first
materialized batch: 0.752232551574707 (log: `torch step 0/1800
loss=0.75223`). The synthetic generator and every split/loader seed are
deterministic, so a faithful regeneration must land the SAME loss to ~1e-5
relative; anything else means the dataset (or panel-classes file) differs
and the --resume arms would not be matched-init pairs.

Usage: JAX_PLATFORM_NAME=cpu python parity_run/dataset_fingerprint_probe.py
"""
import numpy as np
import torch

from garment_pattern_estimation_tpu.cli.parity_check import (
    get_args, _build_shape_stack, _replica_from_config)
from garment_pattern_estimation_tpu.experiment.torch_reference import (
    torch_composed_loss, _torch_gt)

EXPECTED = 0.752232551574707  # train_ab_r5_a.json::_jax_loss_first_step


def main():
    args = get_args(['--dataset_root', 'data',
                     '--shape_config', 'parity_run/ab_r5.yaml',
                     '--torch_train_cross_check', '--train_seed', '1'])
    config, dataset, wrapper, model, _ = _build_shape_stack(
        args, load_checkpoint=False)
    first_epoch = [
        {'features': np.asarray(b['features'], np.float32),
         'ground_truth': {k: np.asarray(v)
                          for k, v in b['ground_truth'].items()}}
        for b in wrapper.loaders.train]
    torch.manual_seed(args.train_seed)
    replica = _replica_from_config(config, dataset)
    replica.train()
    pad = torch.from_numpy(np.asarray(model.loss.pad_vector, np.float32))
    batch = first_epoch[0]
    preds = replica(torch.from_numpy(batch['features']))
    loss, _ = torch_composed_loss(
        preds, _torch_gt(batch['ground_truth']), pad,
        config['NN']['loss'].get('loop_loss_weight', 1.0))
    loss = float(loss.detach())
    rel = abs(loss - EXPECTED) / EXPECTED
    print(f'step-0 loss {loss:.9f} vs expected {EXPECTED:.9f} '
          f'(rel {rel:.2e}) -> {"MATCH" if rel < 1e-4 else "MISMATCH"}')


if __name__ == '__main__':
    main()
