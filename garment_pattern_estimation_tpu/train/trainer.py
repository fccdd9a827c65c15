"""Training runtime: jitted data-parallel train step + epoch driver.

Counterpart of nn/trainer.py, TPU-first:
  * one jitted train step per *loss phase* — the composed loss's structure
    changes at `epoch_with_stitches` / `epoch_with_order_matching`, which are
    static recompile boundaries (2 recompiles per run) instead of dynamic
    control flow;
  * batches are host numpy until the step boundary, then placed with the
    batch axis sharded over the data mesh (params replicated, gradient psum
    inserted by XLA — the reference's DataParallel equivalent, §2.7 of
    SURVEY.md);
  * optax Adam/SGD + OneCycle schedule stepped per batch, early stopping on
    NaN loss / flat validation window / vanished LR, per-epoch checkpoints
    with a 'best' alias (forced on loss-structure change), resume from the
    latest checkpoint of a stored run.
"""
from __future__ import annotations

import copy
import time
import traceback
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..data import DatasetWrapper
from ..parallel import (make_mesh, make_mesh_2d, shard_batch, replicate,
                        pad_batch_to_multiple, DATA_AXIS)
from ..preprocess.device_sampling import maybe_batch_sampler


class Trainer:
    # class-level defaults: helper methods (_eval_step_fn, _place_batch, …)
    # must work on partially-constructed Trainers too (tests and probes build
    # them via Trainer.__new__ to drive a single step without a dataset)
    _monitor_key = None
    _monitor_max = False
    _monitor_needs_quality = False
    _monitor_warned_absent = False
    device_sampler = None
    mesh = None

    def __init__(self, setup, experiment_tracker, dataset=None, data_split=None,
                 with_norm=True, with_visualization=False, mesh=None):
        self.experiment = experiment_tracker
        self.datawrapper = None
        self.standardize_data = with_norm
        self.log_with_visualization = with_visualization
        self.setup = dict(setup)
        self.mesh = mesh
        self.device_sampler = None  # set in fit() once the config is final
        self._step_cache = {}

        # trainer.best_by: checkpoint-selection monitor. Default (absent):
        # lowest total validation loss, the reference's rule. When set to a
        # validation metric key (e.g. 'num_edges_accuracy'), 'best' tracks
        # that metric — higher-is-better for accuracy/precision/recall
        # names, lower-is-better otherwise — with equal-monitor ties broken
        # by the total validation loss. Motivation: after the epoch-40
        # stitch-loss structure change, total valid loss stops tracking the
        # threshold-style edge-count metric (a best-val checkpoint measured
        # 0.42 edge accuracy while the same run's later checkpoints sit at
        # 1.0 — parity_run/lstm_rerun_ckpt_probe.json).
        self._monitor_key = self.setup.get('best_by') or None
        # direction: explicit trainer.best_by_mode ('max'/'min') wins;
        # otherwise inferred from the name (accuracy/precision/recall names
        # maximize, anything else minimizes) — and announced, so a silently
        # minimized higher-is-better metric is visible at startup
        mode = self.setup.get('best_by_mode')
        if mode is not None and mode not in ('max', 'min'):
            raise ValueError(f"Trainer::best_by_mode must be 'max' or 'min', "
                             f'got {mode!r}')
        if mode is not None:
            self._monitor_max = mode == 'max'
        else:
            self._monitor_max = bool(self._monitor_key) and any(
                t in self._monitor_key for t in ('acc', 'precision', 'recall'))
        if self._monitor_key:
            print(f"Trainer::best checkpoint tracks '{self._monitor_key}' "
                  f"({'maximize' if self._monitor_max else 'minimize'}"
                  f"{', inferred' if mode is None else ''}), "
                  'ties broken by validation loss')
        # quality metrics (accuracies/L2s) only exist in the loss dict when
        # quality eval is on; plain loss components end in '_loss'
        self._monitor_needs_quality = bool(
            self._monitor_key and not self._monitor_key.endswith('loss'))
        self._monitor_warned_absent = False

        if dataset is not None:
            self.use_dataset(dataset, data_split or {})

    # ------------- setup -------------
    def init_randomizer(self, random_seed=None):
        """Fix the global training seed and record it in the config."""
        if random_seed:
            self.setup['random_seed'] = random_seed
        elif not self.setup.get('random_seed'):
            self.setup['random_seed'] = int(time.time())
        self._root_key = jax.random.PRNGKey(self.setup['random_seed'])

    def use_dataset(self, dataset, split_info):
        self.datawrapper = DatasetWrapper(dataset)
        self.datawrapper.load_split(split_info)
        self.datawrapper.new_loaders(self.setup['batch_size'], shuffle_train=True)
        workers = dataset.config.get('cache_fill_workers')
        if workers and workers > 1:
            # parallel cold-cache preprocessing (C++ mesh ops release the
            # GIL) — replaces the reference's DataLoader worker processes
            start = time.time()
            n = dataset.warm_cache(workers=workers)
            if n:
                print(f'Trainer::warmed {n} samples with {workers} workers '
                      f'in {time.time() - start:.1f} s')
        if self.standardize_data:
            self.datawrapper.standardize_data()
            # standardization may add transforms -> stats now in config
        return self.datawrapper

    # ------------- optimizer -------------
    def _make_optimizer(self, steps_per_epoch):
        # float(): PyYAML 1.1 parses '5e-4'-style exponents as strings
        lr = float(self.setup['learning_rate'])
        if 'lr_scheduling' in self.setup and self.setup['lr_scheduling'] is not None:
            # torch OneCycleLR defaults: pct_start=0.3, cos anneal,
            # div_factor=25, final_div_factor=1e4.
            # optax's onecycle emits NaN for every step when a phase rounds
            # to zero length (pct_start * steps < 1), so clamp tiny runs
            total_steps = self.setup['epochs'] * max(steps_per_epoch, 1)
            self.schedule = optax.cosine_onecycle_schedule(
                transition_steps=max(total_steps, 4),
                peak_value=lr, pct_start=0.3, div_factor=25.0,
                final_div_factor=1e4)
        else:
            self.schedule = optax.constant_schedule(lr)
            print('Trainer::Warning::no learning-rate scheduling set')

        weight_decay = float(self.setup.get('weight_decay', 0) or 0)
        if self.setup.get('optimizer', 'SGD') == 'Adam':
            print('Trainer::Using Adam optimizer')
            opt = optax.adam(self.schedule)
        else:
            print('Trainer::Using default SGD optimizer')
            opt = optax.sgd(self.schedule)
        if weight_decay:
            # torch semantics: wd * param added to the gradient
            opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
        return opt

    # ------------- loss-phase bookkeeping -------------
    def _phase_of(self, loss_config, epoch):
        ews = loss_config.get('epoch_with_stitches', 40)
        ewo = loss_config.get('epoch_with_order_matching', 0)
        stitch_phase = epoch >= ews
        order_random = (epoch < ewo) and loss_config.get('panel_order_inariant_loss', False)
        return stitch_phase, order_random

    @staticmethod
    def _canonical_epoch(loss_config, stitch_phase, order_random):
        """A representative epoch reproducing the phase's static decisions —
        keeps the jit cache keyed on the phase, not the raw epoch."""
        ews = loss_config.get('epoch_with_stitches', 40)
        ewo = loss_config.get('epoch_with_order_matching', 0)
        for epoch in range(0, max(ews, ewo) + 2):
            if (epoch >= ews) == stitch_phase and (epoch < ewo) == order_random:
                return epoch
        raise ValueError(f'Trainer::unsatisfiable loss phase: stitch={stitch_phase} '
                         f'order_random={order_random} (ews={ews}, ewo={ewo})')

    # ------------- jitted steps -------------
    # Remainder batches are padded to a mesh multiple (repeating the last
    # sample) so the forward always runs sharded over the FULL mesh — the
    # reference's DataParallel scatters any batch size (nn/train.py:124).
    # The padded rows are sliced off *inside* the jitted step before the
    # loss, so losses/metrics/gradients are exactly those of the real batch
    # (padded rows get zero gradient). Only the in-batch BN statistics see
    # the duplicates — a smaller deviation than DataParallel's own per-GPU BN.

    def _train_step_fn(self, model, tx, phase, real_size):
        key = ('train', phase, real_size,
               getattr(model.module, 'compute_dtype', None))
        if key in self._step_cache:
            return self._step_cache[key]
        stitch_phase, order_random = phase
        epoch_c = self._canonical_epoch(model.loss.config, stitch_phase, order_random)

        sampler = getattr(self, 'device_sampler', None)

        def step(params, batch_stats, opt_state, batch, rng):
            rng_states, rng_drop, rng_loss = jax.random.split(rng, 3)
            features, ground_truth = batch['features'], batch['ground_truth']
            if sampler is not None:
                # fresh surface draw per step (free augmentation the fixed
                # host-sampled clouds can't provide); labels from the fused
                # on-device snap
                features, segm = sampler(jax.random.fold_in(rng, 7), features)
                ground_truth = dict(ground_truth, segmentation=segm)

            def loss_fn(p):
                preds, mutated = model.module.apply(
                    {'params': p, 'batch_stats': batch_stats},
                    features, train=True, mutable=['batch_stats'],
                    rngs={'recurrent_init': rng_states, 'dropout': rng_drop})
                preds = jax.tree_util.tree_map(lambda x: x[:real_size], preds)
                gt = jax.tree_util.tree_map(lambda x: x[:real_size],
                                            ground_truth)
                loss, loss_dict, _ = model.loss(
                    preds, gt, epoch=epoch_c, rng=rng_loss)
                return loss, (loss_dict, mutated['batch_stats'])

            (loss, (loss_dict, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_stats, new_opt_state, loss, loss_dict

        jitted = jax.jit(step, donate_argnums=(0, 1, 2))
        self._step_cache[key] = jitted
        return jitted

    def _eval_step_fn(self, model, phase, real_size):
        key = ('eval', phase, real_size,
               getattr(model.module, 'compute_dtype', None))
        if key in self._step_cache:
            return self._step_cache[key]
        stitch_phase, order_random = phase
        epoch_c = self._canonical_epoch(model.loss.config, stitch_phase, order_random)

        sampler = getattr(self, 'device_sampler', None)

        def step(params, batch_stats, batch, rng):
            features, ground_truth = batch['features'], batch['ground_truth']
            if sampler is not None:
                # deterministic per-epoch key: validation sees the same
                # clouds every time it runs at a given epoch
                features, segm = sampler(jax.random.fold_in(rng, 7), features)
                ground_truth = dict(ground_truth, segmentation=segm)
            preds = model.module.apply(
                {'params': params, 'batch_stats': batch_stats},
                features, train=False,
                rngs={'recurrent_init': rng})
            preds = jax.tree_util.tree_map(lambda x: x[:real_size], preds)
            gt = jax.tree_util.tree_map(lambda x: x[:real_size],
                                        ground_truth)
            # trainer.best_by on a quality metric (e.g. num_edges_accuracy)
            # needs quality eval in the per-epoch validation pass; the flag
            # is read at trace time, so toggle it only around this call —
            # the cached *train* steps keep tracing without quality metrics
            want_quality = (self._monitor_needs_quality
                            and hasattr(model.loss, 'with_quality_eval'))
            prev_quality = getattr(model.loss, 'with_quality_eval', False)
            if want_quality:
                model.loss.with_quality_eval = True
            try:
                loss, loss_dict, _ = model.loss(preds, gt, epoch=epoch_c,
                                                rng=rng)
            finally:
                if want_quality:
                    model.loss.with_quality_eval = prev_quality
            return loss, loss_dict

        jitted = jax.jit(step)
        self._step_cache[key] = jitted
        return jitted

    # ------------- batch placement -------------
    def _place_batch(self, batch):
        """Place a host batch on the mesh. Returns (placed arrays, real batch
        size). Non-divisible batches are padded to a mesh multiple so they
        still shard over every device."""
        arrays = {'features': batch['features'],
                  'ground_truth': batch['ground_truth']}
        feats = arrays['features']
        size = int((feats['verts'] if isinstance(feats, dict) else feats).shape[0])
        if self.mesh is not None and len(self.mesh.devices.flatten()) > 1:
            # pad to the DATA axis size: on a 2-D mesh the points axis
            # shards within each sample, not across the batch
            n = self.mesh.shape[DATA_AXIS]
            arrays, size = pad_batch_to_multiple(arrays, n)
            return shard_batch(self.mesh, arrays), size
        return jax.tree_util.tree_map(jnp.asarray, arrays), size

    # ------------- fit -------------
    def fit(self, model, variables=None):
        """Train `model` (a models.GarmentModel). Returns the final
        (variables, opt_state) training state."""
        if not self.datawrapper:
            raise RuntimeError('Trainer::Error::fit called before use_dataset()')
        if not hasattr(self, '_root_key'):
            self.init_randomizer()
        if self.mesh is None:
            mesh_cfg = self.setup.get('mesh')
            if isinstance(mesh_cfg, dict) and int(mesh_cfg.get('points', 1)) > 1:
                # 2-D data x points mesh (sequence parallelism): features
                # shard their point axis too; XLA's SPMD partitioner
                # propagates the sharding through the whole train step
                d, p = int(mesh_cfg.get('data', 1)), int(mesh_cfg['points'])
                self.mesh = make_mesh_2d(d, p)
                print(f'Trainer::{d}x{p} data x points mesh')
            else:
                # full data-parallel mesh: remainder batches are padded to a
                # mesh multiple and sliced off before the loss, so every
                # batch size shards over every device (DataParallel-any-batch)
                n = int(mesh_cfg['data']) if isinstance(mesh_cfg, dict) \
                    else len(jax.devices())
                self.mesh = make_mesh(n)
                if n > 1:
                    print(f'Trainer::data-parallel mesh over {n} devices')

        start_epoch = self._start_experiment(model)
        # bind loaders and size the OneCycle schedule only AFTER
        # _start_experiment: a resumed run reloads its stored split there,
        # rebuilding the wrapper's loaders — binding earlier would train on
        # the constructor-time split (validation leakage) with a schedule
        # sized from the wrong steps-per-epoch
        train_loader = self.datawrapper.loaders.train
        valid_loader = self.datawrapper.loaders.validation
        if len(train_loader) == 0:
            # the balanced sampler drops partial batches (reference
            # semantics, nn/data/utils.py:43-44) — a training subset smaller
            # than one batch yields zero batches, which the reference would
            # silently "train" on; fail loudly instead
            raise ValueError(
                f'Trainer::training subset ({len(self.datawrapper.training)} '
                f'samples) produces no batches at batch_size='
                f'{self.datawrapper.batch_size} (partial batches are '
                'dropped) — lower trainer.batch_size or provide more data')
        tx = self._make_optimizer(len(train_loader))
        # after _start_experiment: a resumed run's restored config decides
        # whether the on-device sampling stage is part of the step
        self.device_sampler = maybe_batch_sampler(self.datawrapper.dataset.config)

        # --- initialize / restore state ---
        if variables is None:
            sample = next(iter(train_loader))
            init_key = jax.random.fold_in(self._root_key, 0)
            init_features = self._example_points(sample, init_key, count=2)
            variables = model.init_variables(init_key, init_features)
        params, batch_stats = variables['params'], variables.get('batch_stats', {})
        opt_state = tx.init(params)
        step_count = 0

        if start_epoch > 0:
            checkpoint = self.experiment.get_checkpoint_file(
                'latest', template={'epoch': 0, 'step': 0,
                                    'variables': {'params': params,
                                                  'batch_stats': batch_stats},
                                    'opt_state': opt_state})
            params = checkpoint['variables']['params']
            batch_stats = checkpoint['variables']['batch_stats']
            opt_state = checkpoint['opt_state']
            step_count = checkpoint['step']
            # align versions with epochs, but never rewind past what the
            # tracker restored from aliases.json (overwriting an aliased
            # version would corrupt 'best')
            self.experiment.checkpoint_counter = max(
                self.experiment.checkpoint_counter, start_epoch)
            print(f'Trainer::Resumed run from epoch {start_epoch}')

        if len(self.mesh.devices.flatten()) > 1:
            params = replicate(self.mesh, params)
            batch_stats = replicate(self.mesh, batch_stats)
            opt_state = replicate(self.mesh, opt_state)

        if self.log_with_visualization:
            self.folder_for_preds = Path(self.experiment.run_dir()) / 'intermediate_preds'
            self.folder_for_preds.mkdir(exist_ok=True)

        # --- epoch loop ---
        best_valid_loss = self.experiment.last_best_validation_loss()
        best_monitor = self.experiment.summary.get('best_monitor') \
            if self._monitor_key else None
        es_tracking = []
        loss_config = model.loss.config
        log_step = step_count - 1

        # precision tail (trainer.f32_tail_epochs): under bf16 compute, run
        # the LAST K scheduled epochs in f32. The bf16 placement regression
        # is a training-dynamics effect, not forward quantization
        # (parity_run/precision_probe.json: eval-time bf16 moves placement
        # <0.5% while bf16 *training* costs ~1.7x) — so the fix is to take
        # the cheap bf16 steps through the OneCycle ramp and descend the
        # low-LR tail, where placement terms converge, at full precision.
        # Same parameters/optimizer state throughout; only the jitted step
        # is rebuilt (one extra compile at the boundary, like the stitch
        # phase change).
        f32_tail = int(self.setup.get('f32_tail_epochs', 0) or 0)
        tail_start = self.setup['epochs'] - f32_tail if f32_tail else None
        # a run that entered the tail early (early-stop jump below) and is
        # later resumed must stay in the f32 tail — the entry epoch is
        # persisted to the run summary and restored here
        stored_tail = self.experiment.summary.get('f32_tail_entered')
        if tail_start is not None and stored_tail is not None:
            tail_start = min(tail_start, int(stored_tail))
        tail_model = None

        for epoch in range(start_epoch, self.setup['epochs']):
            active_model = model
            if (tail_start is not None and epoch >= tail_start
                    and getattr(model.module, 'compute_dtype', None)):
                if tail_model is None:
                    tail_model = copy.copy(model)
                    tail_model.module = model.module.clone(compute_dtype=None)
                    print(f'Trainer::precision tail: compute_dtype '
                          f'{model.module.compute_dtype} -> float32 for the '
                          f'final {self.setup["epochs"] - epoch} epochs')
                active_model = tail_model
            phase = self._phase_of(loss_config, epoch)
            last_loss = np.nan

            # async stepping: never sync inside the batch loop — a per-step
            # float(loss) would serialize host dispatch with device compute
            # (the reference logs per batch too, but its torch calls block
            # anyway; here pipelining is the point of jax async dispatch)
            pending = []
            for batch_i, batch in enumerate(train_loader):
                step_start = time.perf_counter()
                self._maybe_profile(step_count)
                placed, real_size = self._place_batch(batch)
                train_step = self._train_step_fn(active_model, tx, phase, real_size)
                rng = jax.random.fold_in(self._root_key, step_count + 1)
                params, batch_stats, opt_state, loss, loss_dict = train_step(
                    params, batch_stats, opt_state, placed, rng)
                step_count += 1
                log_step += 1
                # record the PRE-increment schedule index: optax applied
                # schedule(step_count - 1) to this update
                pending.append((log_step, epoch, batch_i, step_count - 1, loss,
                                loss_dict, time.perf_counter() - step_start))

            # one sync per epoch: stack every step's loss + metric scalars
            # into a single device array first — device_get on hundreds of
            # individual device scalars costs one host<->device round trip
            # EACH (ruinous over a tunneled transport), one (steps, 1+M)
            # array costs one
            metric_names = sorted(pending[0][5]) if pending else []
            if pending:
                stacked = jnp.stack([
                    jnp.stack([jnp.asarray(p[4], jnp.float32)]
                              + [jnp.asarray(p[5][k], jnp.float32)
                                 for k in metric_names])
                    for p in pending])
                fetched = np.asarray(jax.device_get(stacked))
            else:
                fetched = np.zeros((0, 1))
            epoch_losses = fetched[:, 0]
            # a NaN in ANY batch (not just the last) must trip early stopping
            last_loss = np.nan if np.any(np.isnan(epoch_losses)) \
                else (float(epoch_losses[-1]) if len(epoch_losses) else np.nan)
            for (lstep, ep, bi, sc, _, _, dispatch_time), row in zip(
                    pending, fetched):
                log_record = {k: float(v) for k, v in
                              zip(metric_names, row[1:])}
                log_record.update(epoch=ep, batch=bi, loss=float(row[0]),
                                  learning_rate=float(self.schedule(sc)),
                                  step_time=dispatch_time)
                self.experiment.log(log_record, step=lstep)

            # --- validation pass (sync once at the end) ---
            valid_losses, valid_monitors = [], []
            for batch in valid_loader:
                placed, real_size = self._place_batch(batch)
                eval_step = self._eval_step_fn(active_model, phase, real_size)
                rng = jax.random.fold_in(self._root_key, 2 ** 20 + epoch)
                vloss, vdict = eval_step(params, batch_stats, placed, rng)
                valid_losses.append(vloss)
                if self._monitor_key:
                    if self._monitor_key not in vdict:
                        # phase-dependent metrics (stitch_precision/recall
                        # only enter the dict once epoch >= epoch_with_
                        # stitches): fall back to the loss rule for this
                        # epoch instead of killing the run — the structure-
                        # change 'best' reset wipes loss-rule epochs anyway
                        if not self._monitor_warned_absent:
                            self._monitor_warned_absent = True
                            print(f'Trainer::Warning::best_by metric '
                                  f'{self._monitor_key!r} not in the '
                                  f'validation loss dict this phase '
                                  f'(available: {sorted(vdict)}); using the '
                                  'validation-loss rule until it appears')
                    else:
                        valid_monitors.append(vdict[self._monitor_key])
            # stack on device first: one transfer, not one per batch
            valid_loss = float(jnp.mean(jnp.stack(valid_losses))) \
                if valid_losses else float('nan')
            valid_monitor = float(jnp.mean(jnp.stack(valid_monitors))) \
                if valid_monitors else None

            # loss structure updated this epoch? -> reset 'best'
            structure_update = (
                epoch == loss_config.get('epoch_with_stitches', 40)
                and any(c in loss_config['loss_components']
                        for c in ('stitch', 'stitch_supervised', 'free_class'))
            ) or (epoch == loss_config.get('epoch_with_order_matching', 0)
                  and loss_config.get('panel_order_inariant_loss', False))

            # a NaN validation loss must never latch into best_valid_loss:
            # 'x < nan' is always False, so one bad epoch would pin the
            # 'best' alias (and disable the flat-window early stop) forever
            improved = self._best_update(valid_loss, valid_monitor,
                                         best_valid_loss, best_monitor,
                                         self._monitor_max)
            if structure_update or improved:
                best_valid_loss = valid_loss if np.isfinite(valid_loss) else None
                if valid_monitor is not None:
                    best_monitor = valid_monitor \
                        if np.isfinite(valid_monitor) else None
                self._save_checkpoint(params, batch_stats, opt_state, epoch,
                                      step_count, best=True)
            else:
                self._save_checkpoint(params, batch_stats, opt_state, epoch, step_count)

            print(f'Epoch: {epoch}, Validation Loss: {valid_loss}')
            epoch_record = {'epoch': epoch, 'valid_loss': valid_loss,
                            'best_valid_loss': best_valid_loss}
            if valid_monitor is not None:
                epoch_record[f'valid_{self._monitor_key}'] = valid_monitor
                epoch_record['best_monitor'] = best_monitor
                self.experiment.add_statistic('best_monitor', best_monitor)
            self.experiment.log(epoch_record, step=log_step)
            self.experiment.add_statistic('best_valid_loss', best_valid_loss)

            if self.log_with_visualization:
                self._log_an_image(model, params, batch_stats, epoch, log_step)

            if self._early_stopping(es_tracking, last_loss, best_valid_loss,
                                    float(self.schedule(step_count))):
                if (tail_start is not None and tail_model is None
                        and not np.isnan(last_loss)
                        and getattr(model.module, 'compute_dtype', None)):
                    # the bf16 phase converged before the scheduled tail
                    # boundary: enter the f32 tail NOW instead of stopping —
                    # the precision switch changes the loss surface the stop
                    # rule was tracking, and skipping the remaining flat
                    # bf16 epochs spends the budget where it matters
                    tail_start = epoch + 1
                    es_tracking.clear()
                    # persist: a resumed run must not flip back to bf16
                    self.experiment.add_statistic('f32_tail_entered', tail_start)
                    print('Trainer::early-stop signal in the bf16 phase -> '
                          'entering the f32 precision tail early')
                    continue
                print('Trainer::Stopped training early')
                break

        print('Trainer::Finished training')
        self.final_variables = {'params': params, 'batch_stats': batch_stats}
        return self.final_variables, opt_state

    # ------------- internals -------------
    def _example_points(self, batch, key, count=2):
        """A (count, N, 3) point-cloud slice of a host batch — running the
        on-device sampling stage first when features are mesh tensors."""
        features = batch['features']
        if self.device_sampler is not None and isinstance(features, dict):
            features = {k: jnp.asarray(np.asarray(v)[:count])
                        for k, v in features.items()}
            points, _ = self.device_sampler(key, features)
            return points
        return jnp.asarray(features[:count])

    def _maybe_profile(self, step_count):
        """Capture a jax.profiler device trace for a short step window when
        `trainer.profile` is configured (SURVEY §5.1: the reference had no
        profiling at all; traces land in <run>/profile for TensorBoard/xprof)."""
        profile_cfg = self.setup.get('profile')
        if not profile_cfg:
            return
        start = profile_cfg.get('start_step', 10) if isinstance(profile_cfg, dict) else 10
        steps = profile_cfg.get('num_steps', 5) if isinstance(profile_cfg, dict) else 5
        if step_count == start:
            trace_dir = Path(self.experiment.run_dir()) / 'profile'
            trace_dir.mkdir(exist_ok=True)
            jax.profiler.start_trace(str(trace_dir))
            self._profiling = True
            print(f'Trainer::profiler trace started -> {trace_dir}')
        elif getattr(self, '_profiling', False) and step_count == start + steps:
            jax.profiler.stop_trace()
            self._profiling = False
            print('Trainer::profiler trace stopped')

    def _start_experiment(self, model):
        self.experiment.init_run({'trainer': self.setup})
        if self.experiment.resumed:
            start_epoch = self.experiment.last_epoch() + 1
            split, batch_size, data_config = self.experiment.data_info()
            self.datawrapper.dataset.update_config(data_config)
            self.datawrapper.load_split(split, batch_size)
        else:
            start_epoch = 0
            self.datawrapper.save_to_wandb(self.experiment)
            self.experiment.add_config('NN', model.config)
        return start_epoch

    def _save_checkpoint(self, params, batch_stats, opt_state, epoch, step, best=False):
        state = {'epoch': epoch, 'step': step,
                 'variables': {'params': params, 'batch_stats': batch_stats},
                 'opt_state': opt_state}
        self.experiment.save_checkpoint(state, aliases=['best'] if best else [])

    @staticmethod
    def _best_update(valid_loss, valid_monitor, best_valid_loss, best_monitor,
                     monitor_max):
        """Should this epoch become the 'best' checkpoint?

        valid_monitor None -> the reference rule: lowest finite total
        validation loss. With a monitor (trainer.best_by): strictly better
        monitor wins; an exactly-equal monitor falls back to the total
        validation loss as tie-break (so e.g. among edge-accuracy-1.0
        epochs the lowest-loss one is kept). NaNs never latch."""
        if valid_monitor is None:
            return np.isfinite(valid_loss) and (
                best_valid_loss is None or not np.isfinite(best_valid_loss)
                or valid_loss < best_valid_loss)
        if not np.isfinite(valid_monitor):
            return False
        if best_monitor is None or not np.isfinite(best_monitor):
            return True
        sign = 1.0 if monitor_max else -1.0
        if sign * valid_monitor > sign * best_monitor:
            return True
        return (valid_monitor == best_monitor
                and np.isfinite(valid_loss)
                and (best_valid_loss is None
                     or not np.isfinite(best_valid_loss)
                     or valid_loss < best_valid_loss))

    def _early_stopping(self, es_tracking, last_loss, best_valid, last_lr):
        if np.isnan(last_loss):
            self.experiment.add_statistic('stopped early', 'Nan in losses',
                                          log='Trainer::EarlyStopping')
            return True
        if best_valid is not None:  # None while no finite validation yet
            es_tracking.append(float(best_valid))
        # float() both: PyYAML 1.1 parses exponent forms without a sign
        # ('1e9', '3e-4') as strings, and they reach here unconverted
        patience = int(self.setup.get('early_stopping', {}).get('patience', 50))
        window = float(self.setup.get('early_stopping', {}).get('window', 1e-4))
        if len(es_tracking) > patience + 1:
            es_tracking.pop(0)
            if abs(max(es_tracking) - min(es_tracking)) < window:
                self.experiment.add_statistic(
                    'stopped early', f'Metric have not changed for {patience} epochs',
                    log='Trainer::EarlyStopping')
                return True
        if last_lr < 1e-6:
            self.experiment.add_statistic('stopped early', 'Learning Rate vanished',
                                          log='Trainer::EarlyStopping')
            return True
        return False

    def _log_an_image(self, model, params, batch_stats, epoch, log_step):
        """Render one predicted pattern per garment type for visual tracking
        (reference: nn/trainer.py:243-273)."""
        loader = self.datawrapper.loaders.valid_single_per_data
        if loader is None:
            print('Trainer::Error::suitable loader is not available. Nothing logged')
            return
        try:
            img_files = []
            for batch in loader:
                features = batch['features']
                if self.device_sampler is not None and isinstance(features, dict):
                    features, _ = self.device_sampler(
                        jax.random.fold_in(self._root_key, 2 ** 21 + epoch),
                        jax.tree_util.tree_map(jnp.asarray, features))
                else:
                    features = jnp.asarray(features)
                preds = model.module.apply(
                    {'params': params, 'batch_stats': batch_stats},
                    features, train=False)
                preds = jax.device_get(preds)  # one async fetch, all heads
                preds = {k: np.asarray(v) for k, v in preds.items()}
                img_files += self.datawrapper.dataset.save_prediction_batch(
                    preds, batch['name'], batch['data_folder'],
                    save_to=self.folder_for_preds)
            for img in img_files:
                self.experiment.log({f'pred_img::{img.name}': str(img),
                                     'epoch': epoch}, step=log_step)
        except BaseException as e:
            print(e)
            traceback.print_exc()
            print('Trainer::Error::on saving pattern prediction for image logging. '
                  'Nothing logged')


def _scalar(value):
    value = np.asarray(value)
    if value.ndim == 0:
        return float(value)
    return value.tolist()
