"""Cross-framework training-dynamics parity: the flax/optax training stack
must reproduce the torch reference recipe step for step.

Same init (torch state_dict imported through experiment/torch_import), same
batches, same per-step lr (one optax schedule drives both optimizers), same
composed loss (losses/composed vs experiment/torch_reference.torch_composed
_loss — reference: nn/trainer.py:162-185, nn/metrics/composed_loss.py:222-284).
CPU matmuls are exact f32 on both sides, so the trajectories should only
drift by reduction-order noise."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from garment_pattern_estimation_tpu.models import build_model
from garment_pattern_estimation_tpu.experiment.torch_import import import_shape_model
from garment_pattern_estimation_tpu.experiment.torch_reference import (
    TorchGarmentSegmentPattern3D, train_reference_torch, torch_composed_loss,
    _torch_gt)

B, N, P, L = 4, 96, 5, 6

DATA_CONFIG = {
    'element_size': 4, 'rotation_size': 4, 'translation_size': 3,
    'max_panel_len': L, 'max_pattern_len': P, 'max_num_stitches': 4,
    'standardize': {
        'gt_shift': {'outlines': [0, 0, 0, 0], 'rotations': [0, 0, 0, 0],
                     'translations': [0, 0, 0], 'stitch_tags': [0, 0, 0]},
        'gt_scale': {'outlines': [1, 1, 1, 1], 'rotations': [1, 1, 1, 1],
                     'translations': [1, 1, 1], 'stitch_tags': [1, 1, 1]},
    },
}
NN_CONFIG = {
    'panel_encoding_size': 16, 'panel_hidden_size': 16, 'panel_n_layers': 2,
    'EConv_hidden': 12, 'EConv_feature': 10, 'EConv_hidden_depth': 2,
    'k_neighbors': 4, 'conv_depth': 2, 'skip_connections': True,
    'local_attention': True, 'lstm_init': '',
}
LOSS_CONFIG = {
    'loss_components': ['shape', 'loop', 'rotation', 'translation'],
    'quality_components': [],
    'panel_order_inariant_loss': False,
    'panel_origin_invariant_loss': False,
}


def _random_batches(rng, n_batches):
    batches = []
    for _ in range(n_batches):
        batches.append({
            'features': rng.normal(size=(B, N, 3)).astype(np.float32),
            'ground_truth': {
                'outlines': rng.normal(
                    size=(B, P, L, 4)).astype(np.float32) * 0.3,
                'rotations': rng.normal(size=(B, P, 4)).astype(np.float32) * 0.3,
                'translations': rng.normal(size=(B, P, 3)).astype(np.float32) * 0.3,
                'num_edges': np.full((B, P), 4, np.int32),
            },
        })
    return batches


def _models(tmp_path):
    torch.manual_seed(0)  # deterministic init: the parity margins are tested
    replica = TorchGarmentSegmentPattern3D(
        max_pattern_len=P, max_panel_len=L, element_size=4,
        panel_encoding_size=16, panel_hidden_size=16, panel_n_layers=2,
        econv_hidden=12, econv_hidden_depth=2, econv_feature=10,
        k_neighbors=4, conv_depth=2, skip_connections=True)
    pth = tmp_path / 'init.pth'
    torch.save({'model_state_dict': replica.state_dict()}, pth)
    variables = import_shape_model(pth)['variables']
    model = build_model('GarmentSegmentPattern3D', DATA_CONFIG, NN_CONFIG,
                        LOSS_CONFIG, use_pallas=False)
    return replica, model, variables


def test_training_trajectory_matches_torch(tmp_path):
    rng = np.random.default_rng(5)
    batches = _random_batches(rng, 2)
    epoch_batches = [batches] * 4                      # 8 steps total
    total_steps = sum(len(e) for e in epoch_batches)
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 4), peak_value=2e-3,
        pct_start=0.3, div_factor=25.0, final_div_factor=1e4)

    replica, model, variables = _models(tmp_path)
    pad_vector = np.zeros(4, np.float32)

    torch_losses = train_reference_torch(
        replica, epoch_batches, schedule, pad_vector)

    tx = optax.adam(schedule)
    params, stats = variables['params'], variables['batch_stats']
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, batch):
        def loss_fn(p):
            preds, mutated = model.module.apply(
                {'params': p, 'batch_stats': stats}, batch['features'],
                train=True, mutable=['batch_stats'])
            loss, _, _ = model.loss(preds, batch['ground_truth'], epoch=0)
            return loss, mutated['batch_stats']

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    jax_losses = []
    for batches_e in epoch_batches:
        for batch in batches_e:
            placed = jax.tree_util.tree_map(jnp.asarray, batch)
            params, stats, opt_state, loss = step(params, stats, opt_state, placed)
            jax_losses.append(float(loss))

    # step 0: identical forward+loss on identical weights — tight (only
    # f32 reduction-order noise separates the frameworks)
    np.testing.assert_allclose(jax_losses[0], torch_losses[0], rtol=1e-4)
    # full trajectory: drift only from reduction order / kNN tie noise
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=5e-3)

    # converged-state check: same eval forward through the SAME metric stack
    replica.eval()
    batch = batches[0]
    with torch.no_grad():
        t_preds = replica(torch.from_numpy(batch['features']))
    t_preds = {k: jnp.asarray(v.numpy()) for k, v in t_preds.items()}
    j_preds = model.module.apply({'params': params, 'batch_stats': stats},
                                 jnp.asarray(batch['features']), train=False)
    gt = jax.tree_util.tree_map(jnp.asarray, batch['ground_truth'])
    t_loss, _, _ = model.loss(t_preds, gt, epoch=0)
    j_loss, _, _ = model.loss(j_preds, gt, epoch=0)
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=5e-3)


def test_torch_composed_loss_matches_jax_terms(tmp_path):
    """Term-for-term loss equality on identical predictions (no training):
    isolates the loss replica from optimizer/BN effects."""
    rng = np.random.default_rng(7)
    batch = _random_batches(rng, 1)[0]
    gt = batch['ground_truth']
    preds_np = {
        'outlines': rng.normal(size=(B, P, L, 4)).astype(np.float32),
        'rotations': rng.normal(size=(B, P, 4)).astype(np.float32),
        'translations': rng.normal(size=(B, P, 3)).astype(np.float32),
    }
    _, model, _ = _models(tmp_path)
    j_loss, j_terms, _ = model.loss(
        {k: jnp.asarray(v) for k, v in preds_np.items()},
        jax.tree_util.tree_map(jnp.asarray, gt), epoch=0)

    t_loss, t_terms = torch_composed_loss(
        {k: torch.from_numpy(v) for k, v in preds_np.items()},
        _torch_gt(gt), torch.zeros(4))
    np.testing.assert_allclose(float(t_loss), float(j_loss), rtol=1e-6)
    for key in ('pattern_loss', 'loop_loss', 'rotation_loss',
                'translation_loss'):
        np.testing.assert_allclose(float(t_terms[key]), float(j_terms[key]),
                                   rtol=1e-5, err_msg=key)
