"""One-command reference-parity check (BASELINE.json north star: panel L2
and stitch F1 within 1% of the torch reference).

The real ~22k-garment dataset and the reference's shape checkpoints are not
distributable with this repo (reference models/.MISSING_LARGE_BLOBS), so
this harness is gated on the assets: the moment they exist, parity is::

    python -m garment_pattern_estimation_tpu.cli.parity_check \
        --dataset_root /data/garment_datasets \
        --shape_pth  .../neural_tailor_panels.pth \
        --stitch_pth .../neural_tailor_stitch_model.pth \
        [--expected published_metrics.json] [--torch_cross_check]

Three comparison modes, composable:
  * absolute metrics table — panel L2, #panels/#edges accuracy, placement
    L2, stitch precision/recall/F1 on the shipped test split;
  * ``--expected`` — compare against a {metric: value} JSON of published
    reference numbers, PASS/FAIL at ``--tolerance`` (default 1%);
  * ``--torch_cross_check`` — replay the same checkpoint through the pure
    -torch replica (experiment/torch_reference.py) on the same test batches
    and diff the two forwards' metrics: model-level parity isolated from
    data-pipeline differences.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from .common import load_yaml
from ..data import DATASET_REGISTRY, DatasetWrapper, GarmentStitchPairsDataset
from ..models import build_model
from ..train import eval_metrics, make_predict_fn
from ..experiment.torch_import import load_checkpoint_any

SHAPE_METRICS = ('panel_shape_l2', 'num_panels_accuracy', 'num_edges_accuracy',
                 'rotation_l2', 'translation_l2')
STITCH_METRICS = ('stitch_precision', 'stitch_recall', 'stitch_f1',
                  'edge_pair_class_acc')


def get_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--dataset_root', required=True)
    parser.add_argument('--shape_config', default='./configs/att.yaml')
    parser.add_argument('--shape_pth', default='',
                        help='reference shape checkpoint (.pth) or native '
                             'msgpack; optional with --torch_train_cross_check')
    parser.add_argument('--stitch_config', default='./configs/stitch_model.yaml')
    parser.add_argument('--stitch_pth', default='',
                        help='reference stitch checkpoint; omit to skip stage 2')
    parser.add_argument('--expected', default='',
                        help='JSON of published metric values to compare against')
    parser.add_argument('--tolerance', type=float, default=0.01)
    parser.add_argument('--torch_cross_check', action='store_true')
    parser.add_argument('--torch_train_cross_check', action='store_true',
                        help='TRAIN both stacks (torch reference recipe vs '
                             'this framework) from the same init on the same '
                             'batches and compare converged test metrics')
    parser.add_argument('--stitch_train_cross_check', action='store_true',
                        help='TRAIN the torch stitch pair classifier '
                             '(reference recipe) AND our stitch stack from '
                             'the same init on the same pair batches; '
                             'compare converged stitch P/R/F1 + pair '
                             'accuracy (stage-2 counterpart of '
                             '--torch_train_cross_check)')
    parser.add_argument('--train_epochs', type=int, default=40,
                        help='epochs for --torch_train_cross_check / '
                             '--stitch_train_cross_check')
    parser.add_argument('--train_seed', type=int, default=0)
    parser.add_argument('--noise_floor', action='store_true',
                        help='with --torch_train_cross_check: train extra '
                             'torch seeds (train_seed+1..+noise_seeds, same '
                             'batches) and use the torch-vs-torch metric '
                             'spread as the statistical envelope — a cross-'
                             'framework delta within what torch seeds produce '
                             'among themselves is parity')
    parser.add_argument('--noise_seeds', type=int, default=1,
                        help='number of EXTRA torch seeds for --noise_floor; '
                             'more seeds ground the envelope better (each '
                             'costs one full torch training run)')
    parser.add_argument('--jax_seeds', type=int, default=0,
                        help='with --torch_train_cross_check: ALSO train N '
                             'extra JAX stacks from the torch.manual_seed('
                             'train_seed+1..+N) inits — the same inits the '
                             '--noise_floor torch seeds use — and report '
                             'matched-init paired cross-framework deltas '
                             '(the mean paired delta cancels per-seed '
                             'training chaos and exposes a real systematic '
                             'bias)')
    parser.add_argument('--resume', action='store_true',
                        help='if --output already exists, reload it and skip '
                             'every training arm it already contains; each '
                             'completed arm is flushed to --output '
                             'immediately, so a killed campaign (VM restart, '
                             'preemption) resumes at the next arm instead of '
                             'from scratch. Valid only for the SAME '
                             'config/dataset/split/seed arguments (the '
                             'materialized batches are seed-pinned).')
    parser.add_argument('--stop_after_jax', action='store_true',
                        help='with --torch_train_cross_check: exit after the '
                             'accelerator-side arms (our base + --jax_seeds) '
                             'are trained and flushed — releases the TPU '
                             'client before the hours-long host-side torch '
                             'phase; rerun the same command with --resume '
                             '(optionally under JAX_PLATFORM_NAME=cpu) to '
                             'add the torch arms')
    parser.add_argument('--torch_from_report', default='',
                        help='reuse the torch columns (trained metrics + '
                             'noise-seed metrics) of a previous '
                             '--torch_train_cross_check report instead of '
                             're-paying the host-side torch trainings; '
                             'valid only for the SAME config/dataset/split '
                             '(the materialized batches are seed-pinned)')
    parser.add_argument('--max_datapoints', type=int, default=None,
                        help='cap per-type datapoints (quick smoke runs)')
    parser.add_argument('--output', default='./parity_report.json')
    return parser.parse_args(argv)


def _build_shape_stack(args, load_checkpoint=True):
    config = load_yaml(args.shape_config)
    data_config = dict(config['dataset'])
    if args.max_datapoints:
        data_config['max_datapoints_per_type'] = args.max_datapoints
    dataset = DATASET_REGISTRY[data_config.get(
        'class', 'Garment3DPatternFullDataset')](
        Path(args.dataset_root), data_config, gt_caching=True, feature_caching=True)
    wrapper = DatasetWrapper(dataset)
    wrapper.load_split(config.get('data_split', {}))
    wrapper.new_loaders(config['trainer']['batch_size'])
    wrapper.standardize_data()

    # zero LSTM init states on BOTH sides of every comparison: the
    # reference's random-state noise (batch-shape-dependent) would otherwise
    # blur the 1% check
    nn_config = dict(config['NN'], lstm_init='')
    model = build_model(nn_config.get('model', 'GarmentSegmentPattern3D'),
                        dataset.config, nn_config, nn_config.get('loss', {}))
    variables = load_checkpoint_any(
        args.shape_pth, model_name=config['NN'].get('model'))['variables'] \
        if load_checkpoint else None
    return config, dataset, wrapper, model, variables


def _replica_from_config(config, dataset):
    from ..experiment.torch_reference import (
        TorchGarmentFullPattern3D, TorchGarmentSegmentPattern3D)

    nn_cfg = config['NN']
    if nn_cfg.get('model', 'GarmentSegmentPattern3D') == 'GarmentFullPattern3D':
        return TorchGarmentFullPattern3D(
            max_pattern_len=dataset.config['max_pattern_len'],
            max_panel_len=dataset.config['max_panel_len'],
            element_size=dataset.config['element_size'],
            panel_encoding_size=nn_cfg.get('panel_encoding_size', 250),
            panel_hidden_size=nn_cfg.get('panel_hidden_size', 250),
            panel_n_layers=nn_cfg.get('panel_n_layers', 3),
            pattern_encoding_size=nn_cfg.get('pattern_encoding_size', 250),
            pattern_hidden_size=nn_cfg.get('pattern_hidden_size', 250),
            pattern_n_layers=nn_cfg.get('pattern_n_layers', 2),
            econv_hidden=nn_cfg.get('EConv_hidden', 200),
            econv_hidden_depth=nn_cfg.get('EConv_hidden_depth', 2),
            econv_feature=nn_cfg.get('EConv_feature', 150),
            k_neighbors=nn_cfg.get('k_neighbors', 5),
            conv_depth=nn_cfg.get('conv_depth', 2),
            skip_connections=nn_cfg.get('skip_connections', True))
    return TorchGarmentSegmentPattern3D(
        max_pattern_len=dataset.config['max_pattern_len'],
        max_panel_len=dataset.config['max_panel_len'],
        element_size=dataset.config['element_size'],
        panel_encoding_size=nn_cfg.get('panel_encoding_size', 250),
        panel_hidden_size=nn_cfg.get('panel_hidden_size', 250),
        panel_n_layers=nn_cfg.get('panel_n_layers', 3),
        econv_hidden=nn_cfg.get('EConv_hidden', 200),
        econv_hidden_depth=nn_cfg.get('EConv_hidden_depth', 2),
        econv_feature=nn_cfg.get('EConv_feature', 150),
        k_neighbors=nn_cfg.get('k_neighbors', 5),
        conv_depth=nn_cfg.get('conv_depth', 2),
        skip_connections=nn_cfg.get('skip_connections', True))


def _torch_eval_metrics(replica, wrapper, model, section='test'):
    """Evaluate a torch replica instance on `section` batches through OUR
    loss/metric stack — the same aggregation as train/eval_utils
    .eval_metrics (unweighted batch mean, nan metrics skipped).

    The metric math runs pinned to the CPU backend: these evals happen
    after long host-side torch training phases, during which a shared
    /tunneled TPU may preempt this process's idle accelerator client —
    the tiny f32 metric reductions don't need the chip anyway."""
    import torch
    import jax
    import jax.numpy as jnp

    replica.eval()
    metrics = {}
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        _accumulate_torch_metrics(replica, wrapper, model, section,
                                  metrics, torch, jnp)
    return {k: sum(v) / len(v) for k, v in metrics.items() if v}


def _accumulate_torch_metrics(replica, wrapper, model, section, metrics,
                              torch, jnp):
    for batch in wrapper.get_loader(section):
        with torch.no_grad():
            preds = replica(torch.from_numpy(np.asarray(
                batch['features'], dtype=np.float32)))
        preds = {k: jnp.asarray(v.numpy()) for k, v in preds.items()}
        gt = {k: jnp.asarray(v) for k, v in batch['ground_truth'].items()}
        _, loss_dict, _ = model.loss(preds, gt)
        for key, value in loss_dict.items():
            value = np.asarray(value)
            if value.ndim == 0 and np.isfinite(float(value)):
                metrics.setdefault(key, []).append(float(value))


def _train_cross_check(args, config, dataset, wrapper, model, report):
    """Train the torch replica (reference recipe: Adam + OneCycle + composed
    loss, nn/trainer.py:162-185) AND this framework's stack from the same
    init on the same batch sequence; compare converged test metrics.

    Both stacks: zero recurrent init states, one optax schedule driving the
    per-step lr, identical standardized host batches."""
    import tempfile

    import torch
    import jax
    import jax.numpy as jnp
    import optax

    from ..experiment.torch_import import import_shape_model
    from ..experiment.torch_reference import train_reference_torch

    # --resume: reload a previous (partial) report and skip completed arms.
    # Training arms stash their full metric dicts under `_resume_*` keys and
    # flush the report to --output after EVERY arm, so a killed campaign
    # loses at most the arm in flight.
    if args.resume and Path(args.output).exists():
        prior_state = json.loads(Path(args.output).read_text())
        report.update(prior_state)
        done = [k for k in ('_resume_jax_base_metrics',
                            '_resume_torch_base_metrics') if k in prior_state]
        done += [f'{k}[{len(prior_state[k])}]'
                 for k in ('_resume_jax_seed_metrics',
                           '_resume_torch_noise_metrics') if prior_state.get(k)]
        print(f'parity_check::resuming from {args.output}; completed arms: '
              f'{done or "none"}', flush=True)

    def _scalars(metrics):
        return {k: float(v) for k, v in metrics.items()
                if np.ndim(v) == 0 and np.isfinite(float(v))}

    def flush():
        Path(args.output).write_text(json.dumps(report, indent=1))

    loss_cfg = model.loss.config
    unsupported = [c for c in loss_cfg['loss_components']
                   if c not in ('shape', 'loop', 'rotation', 'translation',
                                'stitch', 'free_class')]
    if unsupported or loss_cfg.get('panel_order_inariant_loss') \
            or loss_cfg.get('panel_origin_invariant_loss'):
        raise NotImplementedError(
            'parity_check::--torch_train_cross_check replicates the reference '
            'recipes without order/origin GT matching (components among '
            'shape/loop/rotation/translation/stitch/free_class); config asks '
            f'for {loss_cfg["loss_components"]}')
    has_stitch_terms = any(c in loss_cfg['loss_components']
                           for c in ('stitch', 'free_class'))
    # the mid-training loss-structure change (stitch terms join at this
    # epoch — reference nn/metrics/composed_loss.py:259-265)
    epoch_with_stitches = loss_cfg.get('epoch_with_stitches', 40) \
        if has_stitch_terms else None

    # one materialized batch sequence consumed by BOTH stacks
    train_loader = wrapper.loaders.train
    epoch_batches = []
    for _ in range(args.train_epochs):
        epoch_batches.append([
            {'features': np.asarray(b['features'], np.float32),
             'ground_truth': {k: np.asarray(v)
                              for k, v in b['ground_truth'].items()}}
            for b in train_loader])
    total_steps = sum(len(e) for e in epoch_batches)
    lr = config['trainer'].get('learning_rate', 2e-3)
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 4), peak_value=lr,
        pct_start=0.3, div_factor=25.0, final_div_factor=1e4)

    torch.manual_seed(args.train_seed)
    replica = _replica_from_config(config, dataset)
    with tempfile.TemporaryDirectory() as tmp:
        init_pth = Path(tmp) / 'init.pth'
        torch.save({'model_state_dict': replica.state_dict()}, init_pth)
        variables = import_shape_model(
            init_pth, model_name=config['NN'].get('model'))['variables']

    pad_vector = np.asarray(model.loss.pad_vector, np.float32)
    loop_w = loss_cfg.get('loop_loss_weight', 1.0)

    # best-validation model selection for BOTH stacks — the reference
    # recipe's 'best' checkpoint (nn/trainer.py:214-219); point-estimating
    # noisy metrics at whatever params the LAST step left would blur the
    # comparison with late-training jitter
    valid_batches = [
        {'features': np.asarray(b['features'], np.float32),
         'ground_truth': {k: np.asarray(v)
                          for k, v in b['ground_truth'].items()}}
        for b in wrapper.loaders.validation]

    def progress(step, loss):
        if step % 60 == 0:
            print(f'parity_check::torch step {step}/{total_steps} '
                  f'loss={loss:.5f}', flush=True)

    # JAX first: on a shared/tunneled TPU an idle client can be preempted by
    # another process's client — run our accelerator phase immediately after
    # backend init instead of after ~an hour of host-side torch training
    print('parity_check::training this framework on the materialized batches')
    tx = optax.adam(schedule)

    from functools import partial

    # `epoch` is static (the loss STRUCTURE changes with it); feed only the
    # two phase representatives so jit compiles at most twice
    @partial(jax.jit, static_argnums=(4,))
    def step(params, stats, opt_state, batch, epoch):
        def loss_fn(p):
            preds, mutated = model.module.apply(
                {'params': p, 'batch_stats': stats}, batch['features'],
                train=True, mutable=['batch_stats'])
            loss, _, _ = model.loss(preds, batch['ground_truth'], epoch=epoch)
            return loss, mutated['batch_stats']

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    @partial(jax.jit, static_argnums=(3,))
    def val_loss(params, stats, batch, epoch):
        preds = model.module.apply({'params': params, 'batch_stats': stats},
                                   batch['features'], train=False)
        loss, _, _ = model.loss(preds, batch['ground_truth'], epoch=epoch)
        return loss

    placed_valid = [jax.tree_util.tree_map(jnp.asarray, b)
                    for b in valid_batches]

    def run_jax_training(init_variables):
        params, stats = init_variables['params'], init_variables['batch_stats']
        opt_state = tx.init(params)
        hist = []
        best = (float('inf'), None)
        for epoch, batches in enumerate(epoch_batches):
            phase = 0 if (epoch_with_stitches is None
                          or epoch < epoch_with_stitches) \
                else epoch_with_stitches
            if epoch == epoch_with_stitches:
                best = (float('inf'), None)  # loss structure changed: reset
            pending = []
            for batch in batches:
                placed = jax.tree_util.tree_map(jnp.asarray, batch)
                p, s, opt_state, loss = step(params, stats, opt_state,
                                             placed, phase)
                params, stats = p, s
                pending.append(loss)
            hist += [float(v) for v in jax.device_get(pending)]
            val = float(np.mean([float(val_loss(params, stats, b, phase))
                                 for b in placed_valid]))
            if val < best[0]:
                best = (val, jax.tree_util.tree_map(np.asarray,
                                                    (params, stats)))
        params, stats = best[1] if best[1] is not None else (params, stats)
        return {'params': params, 'batch_stats': stats}, hist

    if '_resume_jax_base_metrics' in report:
        print('parity_check::our base arm reloaded from the resume report')
        ours = dict(report['_resume_jax_base_metrics'])
    else:
        trained_vars, jax_hist = run_jax_training(variables)
        print('parity_check::evaluating our trained model on the test split')
        ours = eval_metrics(model, trained_vars, wrapper, 'test')
        report['_resume_jax_base_metrics'] = _scalars(ours)
        report['_jax_loss_first_step'] = float(jax_hist[0])
        report['_jax_loss_last_epoch_mean'] = float(
            np.mean(jax_hist[-len(epoch_batches[-1]):]))
        flush()

    # extra JAX seeds (the paired-delta instrument): for init seed s, torch
    # and JAX both start from the torch.manual_seed(s) weights, so
    # (jax_s, torch_s) are matched pairs — run these BEFORE the hour-long
    # torch phase while this process still owns the accelerator
    jax_seed_metrics = [dict(m) for m in
                        report.get('_resume_jax_seed_metrics', [])]
    for extra in range(len(jax_seed_metrics) + 1, (args.jax_seeds or 0) + 1):
        seed = args.train_seed + extra
        print(f'parity_check::training JAX seed {seed} '
              f'({extra}/{args.jax_seeds})')
        torch.manual_seed(seed)
        replica_s = _replica_from_config(config, dataset)
        with tempfile.TemporaryDirectory() as tmp:
            init_pth = Path(tmp) / 'init.pth'
            torch.save({'model_state_dict': replica_s.state_dict()}, init_pth)
            vars_s = import_shape_model(
                init_pth, model_name=config['NN'].get('model'))['variables']
        tv, _ = run_jax_training(vars_s)
        jax_seed_metrics.append(eval_metrics(model, tv, wrapper, 'test'))
        report['_resume_jax_seed_metrics'] = [
            _scalars(m) for m in jax_seed_metrics]
        flush()

    if args.stop_after_jax:
        flush()
        print('parity_check::--stop_after_jax — accelerator arms complete '
              f'({1 + len(jax_seed_metrics)} trained); rerun with --resume '
              'to add the torch arms')
        report['stopped_after_jax'] = True
        return ours, []
    report.pop('stopped_after_jax', None)

    prior = json.loads(Path(args.torch_from_report).read_text()) \
        if args.torch_from_report else None
    if '_resume_torch_base_metrics' in report:
        print('parity_check::torch base arm reloaded from the resume report')
        torch_metrics = dict(report['_resume_torch_base_metrics'])
    elif prior is not None:
        # reuse the torch columns of a previous report (identical config,
        # dataset, split, and materialized batches by construction — the
        # loaders are seed-pinned) instead of re-paying hours of host-side
        # torch training
        print(f'parity_check::torch columns from {args.torch_from_report}')
        torch_metrics = dict(prior['torch_trained_metrics'])
        report['train_loss_first_step'] = prior.get('train_loss_first_step')
        report['train_loss_last_epoch'] = prior.get('train_loss_last_epoch')
        report['torch_columns_reused_from'] = str(args.torch_from_report)
    else:
        print(f'parity_check::training the torch reference recipe '
              f'({args.train_epochs} epochs x {len(epoch_batches[0])} batches)')
        torch_hist = train_reference_torch(
            replica, epoch_batches, schedule, pad_vector, loop_weight=loop_w,
            on_step=progress, valid_batches=valid_batches,
            epoch_with_stitches=epoch_with_stitches,
            stitch_margin=loss_cfg.get('stitch_tags_margin', 0.3),
            use_hardnet=loss_cfg.get('stitch_hardnet_version', False))
        report['train_loss_first_step'] = {
            'torch': torch_hist[0], 'ours': report['_jax_loss_first_step']}
        report['train_loss_last_epoch'] = {
            'torch': float(np.mean(torch_hist[-len(epoch_batches[-1]):])),
            'ours': report['_jax_loss_last_epoch_mean']}
        print(f"parity_check::first-step loss torch={torch_hist[0]:.5f} "
              f"ours={report['_jax_loss_first_step']:.5f}; last-epoch mean "
              f"torch={report['train_loss_last_epoch']['torch']:.5f} "
              f"ours={report['train_loss_last_epoch']['ours']:.5f}")

        print('parity_check::evaluating the torch model on the test split '
              '(same metric stack)')
        torch_metrics = _torch_eval_metrics(replica, wrapper, model)
        report['_resume_torch_base_metrics'] = _scalars(torch_metrics)
        flush()
    metric_keys = SHAPE_METRICS + (
        ('stitch_precision', 'stitch_recall', 'free_edge_acc')
        if has_stitch_terms else ())
    if jax_seed_metrics:
        report['jax_seed_metrics'] = [
            {k: m.get(k) for k in metric_keys if k in m}
            for m in jax_seed_metrics]
    report['trained_shape_metrics'] = {
        k: ours.get(k) for k in metric_keys if k in ours}
    report['torch_trained_metrics'] = {
        k: torch_metrics.get(k) for k in metric_keys if k in torch_metrics}

    floors = None
    seed_metrics = list(prior.get('torch_noise_seed_metrics', [])) \
        if prior else []
    if not seed_metrics:
        seed_metrics = [dict(m) for m in
                        report.get('_resume_torch_noise_metrics', [])]
    if args.noise_floor:
        # extra torch runs: same batches/schedule, init seeds +1..+N — the
        # metric spread among torch seeds is the noise the converged-metric
        # comparison inherits; a cross-framework delta inside that envelope
        # is indistinguishable from reference-vs-reference. One seed gives a
        # single pairwise delta (underestimates the envelope); prefer 3+.
        for extra in range(len(seed_metrics) + 1, max(args.noise_seeds, 1) + 1):
            seed = args.train_seed + extra
            print(f'parity_check::noise floor — training torch seed {seed} '
                  f'({extra}/{args.noise_seeds})')
            torch.manual_seed(seed)
            replica_n = _replica_from_config(config, dataset)
            train_reference_torch(
                replica_n, epoch_batches, schedule, pad_vector,
                loop_weight=loop_w, on_step=progress,
                valid_batches=valid_batches,
                epoch_with_stitches=epoch_with_stitches,
                stitch_margin=loss_cfg.get('stitch_tags_margin', 0.3),
                use_hardnet=loss_cfg.get('stitch_hardnet_version', False))
            metrics_n = _torch_eval_metrics(replica_n, wrapper, model)
            seed_metrics.append(metrics_n)
            report['_resume_torch_noise_metrics'] = [
                _scalars(m) for m in seed_metrics]
            flush()
            print('parity_check::seed %d metrics: %s' % (seed, {
                k: round(metrics_n[k], 5)
                for k in metric_keys if k in metrics_n}), flush=True)
    if seed_metrics:
        report['torch_noise_seed_metrics'] = [
            {k: m.get(k) for k in metric_keys if k in m}
            for m in seed_metrics]
        floors = {}
        for key in metric_keys:
            base = torch_metrics.get(key)
            vals = [m.get(key) for m in seed_metrics if m.get(key) is not None]
            if base is not None and vals:
                floors[key] = max(abs(v - base) / max(abs(base), 1e-3)
                                  for v in vals)
        report['torch_noise_floor'] = floors

    if jax_seed_metrics:
        # matched-init paired deltas: pair i uses torch.manual_seed(i)
        # weights on BOTH sides. The mean paired delta is the cleanest
        # systematic-offset estimate — per-seed chaos cancels in the mean,
        # a real cross-framework bias does not
        torch_pool = [torch_metrics] + seed_metrics
        jax_pool = [ours] + jax_seed_metrics
        paired = {}
        for key in metric_keys:
            deltas = []
            for t, j in zip(torch_pool, jax_pool):
                if t.get(key) is not None and j.get(key) is not None:
                    deltas.append(
                        (j[key] - t[key]) / max(abs(t[key]), 1e-3))
            if deltas:
                paired[key] = {
                    'per_seed_signed': deltas,
                    'mean_abs': float(np.mean(np.abs(deltas))),
                    'mean_signed': float(np.mean(deltas)),
                    'max_abs': float(np.max(np.abs(deltas)))}
        report['paired_cross_framework_deltas'] = paired
        print('parity_check::paired cross-framework deltas (mean signed): '
              + json.dumps({k: round(v['mean_signed'], 4)
                            for k, v in paired.items()}))
    return ours, _compare_rows(ours, torch_metrics, metric_keys,
                               'torch_trained', floors=floors)


def _torch_eval_stitch_metrics(replica, wrapper, model, section='test'):
    """Evaluate the torch pair classifier on `section` batches through OUR
    ComposedLoss metric stack (array preds), pinned to the CPU backend —
    same rationale as _torch_eval_metrics."""
    import torch
    import jax
    import jax.numpy as jnp

    replica.eval()
    metrics = {}
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        for batch in wrapper.get_loader(section):
            with torch.no_grad():
                logits = replica(torch.from_numpy(np.asarray(
                    batch['features'], dtype=np.float32)))
            _, loss_dict, _ = model.loss(
                jnp.asarray(logits.numpy()),
                jnp.asarray(np.asarray(batch['ground_truth'])))
            for key, value in loss_dict.items():
                value = np.asarray(value)
                if value.ndim == 0 and np.isfinite(float(value)):
                    metrics.setdefault(key, []).append(float(value))
    return _with_f1({k: sum(v) / len(v) for k, v in metrics.items() if v})


def _with_f1(metrics):
    p, r = metrics.get('stitch_precision'), metrics.get('stitch_recall')
    if p is not None and r is not None:
        metrics['stitch_f1'] = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return metrics


def _stitch_train_cross_check(args, report):
    """Stage-2 trained A/B: the torch stitch pair classifier
    (reference recipe — BCE on pair logits, Adam + OneCycle,
    nn/trainer.py:162-185 + nn/metrics/composed_loss.py:11-126) vs this
    framework's stitch stack, from the same imported init, on the same
    materialized pair batches; converged stitch P/R/F1 + pair accuracy
    compared on the same test pairs through the same metric code."""
    import tempfile
    from functools import partial

    import torch
    import jax
    import jax.numpy as jnp
    import optax

    from ..experiment.torch_reference import (TorchStitchOnEdge3DPairs,
                                              train_reference_stitch_torch)

    cfg = load_yaml(args.stitch_config)
    data_cfg = dict(cfg['dataset'])
    # freeze the sampled pair sets: both stacks (and every eval) must see
    # the identical pairs
    data_cfg.setdefault('pairs_seed', 17)
    if args.max_datapoints:
        data_cfg['max_datapoints_per_type'] = args.max_datapoints
    dataset = GarmentStitchPairsDataset(
        Path(args.dataset_root), data_cfg, gt_caching=True, feature_caching=True)
    wrapper = DatasetWrapper(dataset)
    wrapper.load_split(cfg.get('data_split', {}))
    wrapper.new_loaders(cfg['trainer']['batch_size'])
    wrapper.standardize_data()

    model = build_model('StitchOnEdge3DPairs', dataset.config, cfg['NN'],
                        cfg['NN'].get('loss', {}))

    torch.manual_seed(args.train_seed)
    replica = TorchStitchOnEdge3DPairs(
        pair_feature_len=dataset.config['element_size'],
        hidden=cfg['NN'].get('stitch_hidden_size', 200),
        n_layers=cfg['NN'].get('stitch_mlp_n_layers', 3))
    with tempfile.TemporaryDirectory() as tmp:
        init_pth = Path(tmp) / 'init.pth'
        torch.save({'model_state_dict': replica.state_dict()}, init_pth)
        variables = load_checkpoint_any(init_pth)['variables']

    # one materialized batch sequence consumed by BOTH stacks
    epoch_batches = []
    for _ in range(args.train_epochs):
        epoch_batches.append([
            {'features': np.asarray(b['features'], np.float32),
             'ground_truth': np.asarray(b['ground_truth'], np.float32)}
            for b in wrapper.loaders.train])
    valid_batches = [
        {'features': np.asarray(b['features'], np.float32),
         'ground_truth': np.asarray(b['ground_truth'], np.float32)}
        for b in wrapper.loaders.validation]
    total_steps = sum(len(e) for e in epoch_batches)
    lr = cfg['trainer'].get('learning_rate', 2e-3)
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 4), peak_value=lr,
        pct_start=0.3, div_factor=25.0, final_div_factor=1e4)

    print('parity_check::stitch A/B — training this framework')
    tx = optax.adam(schedule)
    params, stats = variables['params'], variables['batch_stats']
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, feats, labels):
        def loss_fn(p):
            logits, mutated = model.module.apply(
                {'params': p, 'batch_stats': stats}, feats,
                train=True, mutable=['batch_stats'])
            loss, _, _ = model.loss(logits, labels)
            return loss, mutated['batch_stats']

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    @jax.jit
    def val_loss(params, stats, feats, labels):
        logits = model.module.apply({'params': params, 'batch_stats': stats},
                                    feats, train=False)
        loss, _, _ = model.loss(logits, labels)
        return loss

    jax_hist = []
    best = (float('inf'), None)
    for batches in epoch_batches:
        pending = []
        for batch in batches:
            params, stats, opt_state, loss = step(
                params, stats, opt_state, jnp.asarray(batch['features']),
                jnp.asarray(batch['ground_truth']))
            pending.append(loss)
        jax_hist += [float(v) for v in jax.device_get(pending)]
        val = float(np.mean([
            float(val_loss(params, stats, jnp.asarray(b['features']),
                           jnp.asarray(b['ground_truth'])))
            for b in valid_batches]))
        if val < best[0]:
            best = (val, jax.tree_util.tree_map(np.asarray, (params, stats)))
    params, stats = best[1] if best[1] is not None else (params, stats)
    ours = _with_f1(eval_metrics(
        model, {'params': params, 'batch_stats': stats}, wrapper, 'test'))

    def progress(step_i, loss):
        if step_i % 100 == 0:
            print(f'parity_check::torch stitch step {step_i}/{total_steps} '
                  f'loss={loss:.5f}', flush=True)

    print(f'parity_check::stitch A/B — training the torch reference recipe '
          f'({args.train_epochs} epochs x {len(epoch_batches[0])} batches)')
    torch_hist = train_reference_stitch_torch(
        replica, epoch_batches, schedule, on_step=progress,
        valid_batches=valid_batches)
    report['stitch_train_loss_first_step'] = {'torch': torch_hist[0],
                                              'ours': jax_hist[0]}
    torch_metrics = _torch_eval_stitch_metrics(replica, wrapper, model)
    report['stitch_trained_metrics'] = {
        k: ours.get(k) for k in STITCH_METRICS if k in ours}
    report['torch_stitch_trained_metrics'] = {
        k: torch_metrics.get(k) for k in STITCH_METRICS if k in torch_metrics}

    floors = None
    if args.noise_floor:
        seed_metrics = []
        for extra in range(1, max(args.noise_seeds, 1) + 1):
            seed = args.train_seed + extra
            print(f'parity_check::stitch noise floor — torch seed {seed} '
                  f'({extra}/{args.noise_seeds})')
            torch.manual_seed(seed)
            replica_n = TorchStitchOnEdge3DPairs(
                pair_feature_len=dataset.config['element_size'],
                hidden=cfg['NN'].get('stitch_hidden_size', 200),
                n_layers=cfg['NN'].get('stitch_mlp_n_layers', 3))
            train_reference_stitch_torch(replica_n, epoch_batches, schedule,
                                         on_step=progress,
                                         valid_batches=valid_batches)
            metrics_n = _torch_eval_stitch_metrics(replica_n, wrapper, model)
            seed_metrics.append(metrics_n)
            print('parity_check::stitch seed %d metrics: %s' % (seed, {
                k: round(metrics_n[k], 5)
                for k in STITCH_METRICS if k in metrics_n}), flush=True)
        report['torch_stitch_noise_seed_metrics'] = [
            {k: m.get(k) for k in STITCH_METRICS if k in m}
            for m in seed_metrics]
        floors = {}
        for key in STITCH_METRICS:
            base = torch_metrics.get(key)
            vals = [m.get(key) for m in seed_metrics if m.get(key) is not None]
            if base is not None and vals:
                floors[key] = max(abs(v - base) / max(abs(base), 1e-3)
                                  for v in vals)
        report['torch_stitch_noise_floor'] = floors
    return ours, _compare_rows(ours, torch_metrics, STITCH_METRICS,
                               'torch_stitch_trained', floors=floors)


def _torch_replica_metrics(config, dataset, wrapper, model, shape_pth):
    """Replay the checkpoint with the torch replica on the SAME test batches
    and compute the SAME metrics via our loss stack — model-level parity."""
    import torch

    replica = _replica_from_config(config, dataset)
    ckpt = torch.load(shape_pth, map_location='cpu', weights_only=False)
    state = ckpt.get('model_state_dict', ckpt)
    state = {k.removeprefix('module.'): v for k, v in state.items()}
    # strict: a key mismatch means the replica no longer mirrors the
    # reference's module naming — that must fail loudly, not leave random
    # weights that masquerade as an import bug
    replica.load_state_dict(state, strict=True)
    return _torch_eval_metrics(replica, wrapper, model)


def _compare_rows(ours, other, keys, label, floors=None):
    """Rows of (name, ours, reference, delta, extra_tolerance): the PASS
    threshold for a row is max(--tolerance, extra_tolerance) — used by the
    --noise_floor mode to widen the bar to the torch seed-to-seed spread."""
    rows = []
    for key in keys:
        a, b = ours.get(key), other.get(key)
        if a is None or b is None:
            continue
        delta = abs(a - b) / max(abs(b), 1e-3)  # floor: accuracies near 0
        extra = floors.get(key, 0.0) if floors else 0.0
        rows.append((f'{label}:{key}', a, b, delta, extra))
    return rows


def main(argv=None):
    import jax
    args = get_args(argv)
    # parity runs compare against exact-f32 torch forwards: force full-f32
    # matmuls (TPU DEFAULT rounds matmul inputs to bf16 — fine for training
    # throughput, not for a 1%-budget metric comparison)
    with jax.default_matmul_precision('highest'):
        return _main_impl(args)


def _main_impl(args):
    report = {'dataset_root': args.dataset_root, 'shape_pth': args.shape_pth}
    if not args.shape_pth and not args.torch_train_cross_check \
            and not args.stitch_train_cross_check:
        raise SystemExit('parity_check::--shape_pth is required unless '
                         '--torch_train_cross_check / '
                         '--stitch_train_cross_check train from scratch')

    rows = []
    ours = {}
    need_shape_stack = bool(args.shape_pth) or args.torch_train_cross_check
    if need_shape_stack:
        config, dataset, wrapper, model, variables = _build_shape_stack(
            args, load_checkpoint=bool(args.shape_pth))
    else:
        config = dataset = wrapper = model = variables = None

    if args.torch_train_cross_check:
        ours, train_rows = _train_cross_check(
            args, config, dataset, wrapper, model, report)
        rows += train_rows

    if args.stitch_train_cross_check:
        stitch_ours, stitch_rows = _stitch_train_cross_check(args, report)
        ours.update(stitch_ours)
        rows += stitch_rows

    if variables is not None:
        print('parity_check::evaluating shape model on the test split')
        ours = eval_metrics(model, variables, wrapper, 'test')
        report['shape_metrics'] = {
            k: ours.get(k) for k in SHAPE_METRICS if k in ours}
        print(json.dumps(report['shape_metrics'], indent=1))

    if args.torch_cross_check and args.shape_pth:
        print('parity_check::torch replica cross-check (same batches, same metrics)')
        torch_metrics = _torch_replica_metrics(
            config, dataset, wrapper, model, args.shape_pth)
        report['torch_replica_metrics'] = {
            k: torch_metrics.get(k) for k in SHAPE_METRICS if k in torch_metrics}
        rows += _compare_rows(ours, torch_metrics, SHAPE_METRICS, 'torch')

    if args.stitch_pth:
        print('parity_check::stage 2 — stitches on shape predictions')
        predict_fn = make_predict_fn(model, variables)
        pred_path = wrapper.predict(predict_fn, Path('./parity_predictions'),
                                    dir_tag='parity', sections=['test'],
                                    orig_folder_names=True)
        stitch_cfg = load_yaml(args.stitch_config)
        pred_test = Path(pred_path) / 'test'
        stitch_data_cfg = dict(
            stitch_cfg['dataset'], random_pairs_mode=False,
            data_folders=sorted(d.name for d in pred_test.iterdir()
                                if d.is_dir()))
        if 'standardize' not in stitch_data_cfg:
            # the checkpoint was trained on inputs standardized with ITS
            # training-set stats; recomputing stats from today's predictions
            # shifts every first-layer activation and invalidates the
            # comparison (reference: nn/experiment.py data_info path)
            print('parity_check::WARNING::no `standardize` block in the '
                  'stitch config — feature stats will be recomputed from the '
                  'current predictions. For a faithful parity number, copy '
                  'the f_shift/f_scale from the reference run config into '
                  f'{args.stitch_config} (dataset.standardize).')
        stitch_dataset = GarmentStitchPairsDataset(
            pred_test, stitch_data_cfg, gt_caching=True, feature_caching=True)
        stitch_wrapper = DatasetWrapper(stitch_dataset, batch_size=1)
        stitch_wrapper.standardize_data()
        stitch_model = build_model(
            'StitchOnEdge3DPairs', stitch_dataset.config,
            stitch_cfg['NN'], stitch_cfg['NN'].get('loss', {}))
        stitch_vars = load_checkpoint_any(args.stitch_pth)['variables']
        stitch_metrics = eval_metrics(stitch_model, stitch_vars,
                                      stitch_wrapper, 'full')
        p, r = stitch_metrics.get('stitch_precision'), stitch_metrics.get('stitch_recall')
        if p is not None and r is not None:
            stitch_metrics['stitch_f1'] = \
                2 * p * r / (p + r) if (p + r) > 0 else 0.0
        report['stitch_metrics'] = {
            k: stitch_metrics.get(k) for k in STITCH_METRICS if k in stitch_metrics}
        ours.update(report['stitch_metrics'])
        print(json.dumps(report['stitch_metrics'], indent=1))

    if args.expected:
        expected = json.loads(Path(args.expected).read_text())
        report['expected'] = expected
        rows += _compare_rows(ours, expected, list(expected), 'published')

    failed = []
    if rows:
        width = max(len(r[0]) for r in rows)
        print(f'\n{"metric".ljust(width)}  {"ours":>12}  {"reference":>12}  '
              f'delta   bar')
        for name, a, b, delta, extra in rows:
            bar = max(args.tolerance, extra)
            status = 'PASS' if delta <= bar else 'FAIL'
            print(f'{name.ljust(width)}  {a:12.5f}  {b:12.5f}  {delta:6.2%} '
                  f'{bar:6.2%} {status}')
            if delta > bar:
                failed.append(name)
        report['comparisons'] = [
            {'metric': n, 'ours': a, 'reference': b, 'delta': d,
             'bar': max(args.tolerance, e),
             'pass': d <= max(args.tolerance, e)} for n, a, b, d, e in rows]

    Path(args.output).write_text(json.dumps(report, indent=1))
    print(f'parity_check::report -> {args.output}')
    if failed:
        print(f'parity_check::FAIL::{len(failed)} metric(s) beyond '
              f'{args.tolerance:.0%}: {failed}')
        return 1
    print('parity_check::all comparisons within tolerance')
    return 0


if __name__ == '__main__':
    sys.exit(main())
