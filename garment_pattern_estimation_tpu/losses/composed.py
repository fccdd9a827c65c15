"""Composed, config-driven losses for the shape and stitch models.

Behavioral counterpart of nn/metrics/composed_loss.py, jit-first:

  * `epoch` is a static Python int — the loss *structure* genuinely changes
    at `epoch_with_stitches` / `epoch_with_order_matching`, so the train step
    recompiles at those (at most two) boundaries instead of tracing dynamic
    control flow.
  * GT canonicalization (panel-order matching via greedy assignment, panel
    edge-loop origin matching, stitch-id renumbering) is re-expressed as
    vectorized masked gathers running fully on device — replacing the
    reference's Python triple loops (composed_loss.py:555-565, 705-755).
  * Everything returns (full_loss, metrics dict, loss_structure_updated).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import components as C
from .stitches import stitch_precision_recall
from ..ops.sparsemax import sparsemax_loss

_INF = jnp.inf


# ======================================================================
# GT canonicalization primitives
# ======================================================================

def greedy_order_match(pred_features, gt_features):
    """Greedy global-min assignment of GT panels to predicted panel slots.

    Returns permutation (B, P): new GT panel at slot p is old panel perm[p]
    (reference: _panel_order_match, composed_loss.py:530-570)."""
    B, P = pred_features.shape[0], pred_features.shape[1]
    pred = pred_features.reshape(B, P, -1)
    gt = gt_features.reshape(B, P, -1)
    dist = jnp.sqrt(jnp.maximum(
        jnp.sum(pred ** 2, -1)[:, :, None] + jnp.sum(gt ** 2, -1)[:, None, :]
        - 2 * jnp.einsum('bpf,bqf->bpq', pred, gt), 0.0))

    batch_ids = jnp.arange(B)

    def step(_, state):
        dist, perm = state
        flat_min = jnp.argmin(dist.reshape(B, -1), axis=1)
        rows, cols = flat_min // P, flat_min % P
        perm = perm.at[batch_ids, rows].set(cols)
        dist = dist.at[batch_ids, rows, :].set(_INF)
        dist = dist.at[batch_ids, :, cols].set(_INF)
        return dist, perm

    perm0 = jnp.zeros((B, P), dtype=jnp.int32)
    _, perm = jax.lax.fori_loop(0, P, step, (dist, perm0))
    return perm


def permute_panels(features, permutation):
    """Gather panel-axis features by the permutation (any trailing shape)."""
    idx = permutation.reshape(
        permutation.shape + (1,) * (features.ndim - 2))
    idx = jnp.broadcast_to(idx, permutation.shape + features.shape[2:])
    return jnp.take_along_axis(features, idx.astype(jnp.int32), axis=1)


def renumber_stitches_after_permute(stitches, num_stitches, permutation, max_panel_len):
    """Re-map pattern-level edge ids after a panel permutation
    (reference: _stitch_after_permute, composed_loss.py:591-618)."""
    inverse = jnp.argsort(permutation, axis=1)                    # (B, P)
    panel_id = stitches // max_panel_len                          # (B, 2, S)
    in_edge = stitches % max_panel_len
    new_panel = jnp.take_along_axis(
        inverse[:, None, :].repeat(2, axis=1), panel_id, axis=2)
    new_ids = new_panel * max_panel_len + in_edge
    valid = jnp.arange(stitches.shape[-1])[None, None, :] < num_stitches[:, None, None]
    return jnp.where(valid, new_ids, stitches)


def match_panel_origins(pred_outlines, gt_outlines, gt_num_edges):
    """Pick the GT edge-loop rotation minimizing MSE to the prediction.

    Returns (rotated GT outlines, leading edges (B*P,)). Ties resolve to the
    smallest shift (reference: _panel_egde_match, composed_loss.py:686-703)."""
    B, P, L, E = gt_outlines.shape
    pred = pred_outlines.reshape(-1, L, E)
    gt = gt_outlines.reshape(-1, L, E)
    ne = gt_num_edges.reshape(-1)                                  # (BP,)
    ne_safe = jnp.maximum(ne, 1)

    shifts = jnp.arange(L)[None, :, None]                          # (1, S, 1)
    slots = jnp.arange(L)[None, None, :]                           # (1, 1, L)
    src = jnp.where(slots < ne[:, None, None],
                    (slots + shifts) % ne_safe[:, None, None],
                    slots)                                         # (BP, S, L)

    shifted = jnp.take_along_axis(gt[:, None, :, :],
                                  src[..., None], axis=2)          # (BP, S, L, E)
    dists = jnp.sum((pred[:, None] - shifted) ** 2, axis=(2, 3))   # (BP, S)
    shift_valid = jnp.arange(L)[None, :] < ne_safe[:, None]
    dists = jnp.where(shift_valid, dists, _INF)
    leading = jnp.argmin(dists, axis=1)                            # first-min ties

    chosen = jnp.take_along_axis(
        shifted, leading[:, None, None, None].astype(jnp.int32), axis=1)[:, 0]
    return chosen.reshape(B, P, L, E), leading


def shift_panel_features(features, leading_edges, gt_num_edges):
    """Roll per-edge features of each panel so `leading_edge` comes first,
    padding kept in place; panels with <3 edges untouched
    (reference: _per_panel_shift, composed_loss.py:705-724)."""
    B, P, L = features.shape[:3]
    flat = features.reshape(B * P, L, -1)
    ne = gt_num_edges.reshape(-1)
    ne_safe = jnp.maximum(ne, 1)
    lead = leading_edges.reshape(-1)

    slots = jnp.arange(L)[None, :]
    src = jnp.where(slots < ne[:, None],
                    (slots + lead[:, None]) % ne_safe[:, None], slots)
    shifted = jnp.take_along_axis(flat, src[..., None], axis=1)
    shifted = jnp.where((ne >= 3)[:, None, None], shifted, flat)
    return shifted.reshape(features.shape)


def renumber_stitches_after_shift(stitches, num_stitches, leading_edges,
                                  gt_num_edges, max_num_panels, max_panel_len):
    """Re-map stitch edge ids after per-panel loop-origin shifts
    (reference: _gt_stitches_shift, composed_loss.py:726-755)."""
    B, _, S = stitches.shape
    lead = leading_edges.reshape(B, max_num_panels)
    ne = gt_num_edges.reshape(B, max_num_panels)

    panel_id = stitches // max_panel_len                           # (B, 2, S)
    in_edge = stitches % max_panel_len
    panel_lead = jnp.take_along_axis(
        lead[:, None, :].repeat(2, axis=1), panel_id, axis=2)
    panel_ne = jnp.take_along_axis(
        ne[:, None, :].repeat(2, axis=1), panel_id, axis=2)
    new_in_edge = jnp.where(
        in_edge >= panel_lead, in_edge - panel_lead,
        panel_ne - (panel_lead - in_edge))
    new_ids = panel_id * max_panel_len + new_in_edge
    valid = jnp.arange(S)[None, None, :] < num_stitches[:, None, None]
    return jnp.where(valid, new_ids, stitches)


def random_permutations(rng, batch_size, num_panels):
    keys = jax.random.split(rng, batch_size)
    return jax.vmap(lambda k: jax.random.permutation(k, num_panels))(keys)


# ======================================================================
# Shape-model composed loss
# ======================================================================

class ComposedPatternLoss:
    """Config-driven compound loss on pattern predictions.

    Components ('loss_components'): shape, loop, rotation, translation,
    segmentation, stitch, stitch_supervised, free_class.
    Quality ('quality_components'): shape, discrete, rotation, translation,
    stitch, free_class. Stitch pieces activate at `epoch_with_stitches`.
    """

    def __init__(self, data_config, in_config=None):
        self.config = {
            'loss_components': ['shape'],
            'quality_components': [],
            'loop_loss_weight': 1.0,
            'segm_loss_weight': 0.05,
            'stitch_tags_margin': 0.3,
            'epoch_with_stitches': 40,
            'stitch_supervised_weight': 0.1,
            'stitch_hardnet_version': False,
            'panel_origin_invariant_loss': True,
            'panel_order_inariant_loss': True,   # (sic) key kept for config compat
            'order_by': 'placement',
            'epoch_with_order_matching': 0,
        }
        self.config.update(in_config or {})

        self.with_quality_eval = True
        self.training = False
        self.debug_prints = False

        self.l_components = tuple(self.config['loss_components'])
        self.q_components = tuple(self.config['quality_components'])

        self.max_panel_len = data_config['max_panel_len']
        self.max_pattern_size = data_config['max_pattern_len']
        self.explicit_stitch_tags = data_config.get('explicit_stitch_tags', False)

        stats = data_config['standardize']
        self.gt_outline_stats = {
            'shift': jnp.asarray(stats['gt_shift']['outlines'], jnp.float32),
            'scale': jnp.asarray(stats['gt_scale']['outlines'], jnp.float32),
        }
        self.rot_stats = {
            'shift': jnp.asarray(stats['gt_shift']['rotations'], jnp.float32),
            'scale': jnp.asarray(stats['gt_scale']['rotations'], jnp.float32),
        }
        self.transl_stats = {
            'shift': jnp.asarray(stats['gt_shift']['translations'], jnp.float32),
            'scale': jnp.asarray(stats['gt_scale']['translations'], jnp.float32),
        }
        self.tag_stats = {
            'shift': jnp.asarray(stats['gt_shift']['stitch_tags'], jnp.float32),
            'scale': jnp.asarray(stats['gt_scale']['stitch_tags'], jnp.float32),
        } if 'stitch_tags' in stats.get('gt_shift', {}) else None
        self.pad_vector = C.eval_pad_vector(self.gt_outline_stats)

    # ------------- public API -------------
    def __call__(self, preds, ground_truth, names=None, epoch=1000, rng=None):
        """(full_loss, breakdown dict, loss-structure-updated flag).

        `epoch` must be a static int under jit (see module docstring)."""
        stitch_phase = epoch >= self.config['epoch_with_stitches'] and any(
            c in self.l_components for c in ('stitch', 'stitch_supervised', 'free_class'))
        # GT stitch ids / free-edge masks must be renumbered along with any
        # panel permutation/rotation whenever ANYTHING consumes them this
        # epoch — the quality metrics included, not just the loss terms
        # (otherwise stitch precision/recall would compare decoded stitches
        # in permuted slot space against pre-permutation edge ids)
        track_stitches = stitch_phase or (
            self.with_quality_eval
            and epoch >= self.config['epoch_with_stitches']
            and any(c in self.q_components for c in ('stitch', 'free_class')))

        gt = dict(ground_truth)
        if self.config['panel_order_inariant_loss']:
            if 'segmentation' in self.l_components:
                raise NotImplementedError(
                    'Order matching not supported for training with segmentation losses')
            gt = self._gt_order_match(preds, gt, epoch, track_stitches, rng)

        gt_num_edges = gt['num_edges'].astype(jnp.int32).reshape(-1)

        if self.config['panel_origin_invariant_loss']:
            gt = self._rotate_gt(preds, gt, gt_num_edges, track_stitches)

        loss_dict = {}
        full_loss, main_dict = self._main_losses(preds, gt, gt_num_edges)
        loss_dict.update(main_dict)

        if stitch_phase:
            stitch_losses, stitch_dict = self._stitch_losses(preds, gt)
            full_loss = full_loss + stitch_losses
            loss_dict.update(stitch_dict)

        if self.with_quality_eval:
            preds_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, preds)
            quality, corr_mask = self._main_quality_metrics(preds_sg, gt, gt_num_edges)
            loss_dict.update(quality)
            if epoch >= self.config['epoch_with_stitches']:
                loss_dict.update(
                    self._stitch_quality_metrics(preds_sg, gt, corr_mask))

        loss_update_ind = (
            (epoch == self.config['epoch_with_stitches'] and any(
                c in self.l_components
                for c in ('stitch', 'stitch_supervised', 'free_class')))
            or (epoch == self.config['epoch_with_order_matching']
                and self.config['panel_order_inariant_loss']))

        return full_loss, loss_dict, loss_update_ind

    def eval(self):
        self.training = False

    def train(self, mode=True):
        self.training = mode

    # ------------- GT order matching -------------
    def _order_features(self, preds, gt, epoch, track_stitches):
        order_by = self.config['order_by']
        if order_by == 'placement':
            return (jnp.concatenate([preds['translations'], preds['rotations']], -1),
                    jnp.concatenate([gt['translations'], gt['rotations']], -1))
        if order_by == 'translation':
            return preds['translations'], gt['translations']
        if order_by == 'shape_translation':
            B, P = preds['outlines'].shape[:2]
            pred_flat = preds['outlines'].reshape(B, P, -1)
            gt_flat = gt['outlines'].reshape(B, P, -1)
            return (jnp.concatenate([preds['translations'], pred_flat], -1),
                    jnp.concatenate([gt['translations'], gt_flat], -1))
        if order_by == 'stitches':
            pred_f = jnp.concatenate([preds['translations'], preds['rotations']], -1)
            gt_f = jnp.concatenate([gt['translations'], gt['rotations']], -1)
            if epoch >= self.config['epoch_with_stitches']:
                B, P = preds['free_edges_mask'].shape[:2]
                pred_mask = jnp.round(jax.nn.sigmoid(
                    preds['free_edges_mask'])).reshape(B, P, -1)
                gt_mask = gt['free_edges_mask'].reshape(B, P, -1).astype(jnp.float32)
                pred_f = jnp.concatenate([pred_f, pred_mask], -1)
                gt_f = jnp.concatenate([gt_f, gt_mask], -1)
            return pred_f, gt_f
        raise NotImplementedError(
            f'ComposedPatternLoss::ordering by <{order_by}> is not implemented')

    def _gt_order_match(self, preds, gt, epoch, track_stitches, rng):
        pred_f, gt_f = self._order_features(preds, gt, epoch, track_stitches)
        pred_f = jax.lax.stop_gradient(pred_f)

        if epoch < self.config['epoch_with_order_matching']:
            if rng is None:
                raise ValueError('ComposedPatternLoss::random-order warmup phase '
                                 'requires an rng')
            perm = random_permutations(rng, pred_f.shape[0], pred_f.shape[1])
        else:
            perm = greedy_order_match(pred_f, gt_f)

        updated = dict(gt)
        updated['outlines'] = permute_panels(gt['outlines'], perm)
        updated['num_edges'] = permute_panels(gt['num_edges'], perm)
        updated['empty_panels_mask'] = permute_panels(gt['empty_panels_mask'], perm)
        if 'rotation' in self.l_components:
            updated['rotations'] = permute_panels(gt['rotations'], perm)
        if 'translation' in self.l_components:
            updated['translations'] = permute_panels(gt['translations'], perm)
        if track_stitches:
            updated['stitches'] = renumber_stitches_after_permute(
                gt['stitches'], gt['num_stitches'], perm, self.max_panel_len)
            updated['free_edges_mask'] = permute_panels(gt['free_edges_mask'], perm)
            if 'stitch_supervised' in self.l_components:
                updated['stitch_tags'] = permute_panels(gt['stitch_tags'], perm)
        return updated

    # ------------- GT loop-origin matching -------------
    def _rotate_gt(self, preds, gt, gt_num_edges, track_stitches):
        updated = dict(gt)
        updated['outlines'], leading = match_panel_origins(
            jax.lax.stop_gradient(preds['outlines']), gt['outlines'], gt_num_edges)
        if track_stitches:
            updated['stitches'] = renumber_stitches_after_shift(
                gt['stitches'], gt['num_stitches'], leading, gt_num_edges,
                self.max_pattern_size, self.max_panel_len)
            updated['free_edges_mask'] = shift_panel_features(
                gt['free_edges_mask'][..., None], leading, gt_num_edges)[..., 0]
            if 'stitch_supervised' in self.l_components:
                updated['stitch_tags'] = shift_panel_features(
                    gt['stitch_tags'], leading, gt_num_edges)
        return updated

    # ------------- loss terms -------------
    def _main_losses(self, preds, gt, gt_num_edges):
        full_loss = 0.0
        loss_dict = {}
        if 'shape' in self.l_components:
            pattern_loss = jnp.mean((preds['outlines'] - gt['outlines']) ** 2)
            full_loss += pattern_loss
            loss_dict['pattern_loss'] = pattern_loss
        if 'loop' in self.l_components:
            loop = C.panel_loop_loss(preds['outlines'], gt_num_edges, self.pad_vector)
            full_loss += self.config['loop_loss_weight'] * loop
            loss_dict['loop_loss'] = loop
        if 'rotation' in self.l_components:
            rot = jnp.mean((preds['rotations'] - gt['rotations']) ** 2)
            full_loss += rot
            loss_dict['rotation_loss'] = rot
        if 'translation' in self.l_components:
            transl = jnp.mean((preds['translations'] - gt['translations']) ** 2)
            full_loss += transl
            loss_dict['translation_loss'] = transl
        if 'segmentation' in self.l_components:
            att = preds['att_weights'].reshape(-1, preds['att_weights'].shape[-1])
            labels = jnp.clip(gt['segmentation'].reshape(-1), 0, att.shape[-1] - 1)
            segm = jnp.mean(sparsemax_loss(att, labels))
            full_loss += self.config['segm_loss_weight'] * segm
            loss_dict['segm_loss'] = segm
        return full_loss, loss_dict

    def _stitch_losses(self, preds, gt):
        full_loss = 0.0
        loss_dict = {}
        if 'stitch' in self.l_components:
            stitch_loss, breakdown = C.pattern_stitch_loss(
                preds['stitch_tags'], gt['stitches'], gt['num_stitches'],
                margin=self.config['stitch_tags_margin'],
                use_hardnet=self.config['stitch_hardnet_version'])
            full_loss += stitch_loss
            loss_dict.update(breakdown)
        if 'stitch_supervised' in self.l_components:
            sup = jnp.mean((preds['stitch_tags'] - gt['stitch_tags']) ** 2)
            full_loss += self.config['stitch_supervised_weight'] * sup
            loss_dict['stitch_supervised_loss'] = sup
        if 'free_class' in self.l_components:
            free = C.bce_with_logits(preds['free_edges_mask'], gt['free_edges_mask'])
            full_loss += free
            loss_dict['free_edges_loss'] = free
        return full_loss, loss_dict

    # ------------- quality metrics -------------
    def _main_quality_metrics(self, preds, gt, gt_num_edges):
        loss_dict = {}
        correct_mask = None
        if 'discrete' in self.q_components:
            panel_acc, edge_acc, correct_mask, corr_edge_acc = \
                C.numbers_in_panels_accuracies(
                    preds['outlines'], gt_num_edges, gt['num_panels'],
                    self.pad_vector, self.gt_outline_stats['scale'])
            loss_dict.update(num_panels_accuracy=panel_acc,
                             num_edges_accuracy=edge_acc,
                             corr_num_edges_accuracy=corr_edge_acc)
        if 'shape' in self.q_components:
            shape_l2, corr_shape_l2 = C.panel_verts_l2(
                preds['outlines'], gt['outlines'], gt_num_edges,
                self.gt_outline_stats['shift'], self.gt_outline_stats['scale'],
                correct_mask)
            loss_dict.update(panel_shape_l2=shape_l2, corr_panel_shape_l2=corr_shape_l2)
        if 'rotation' in self.q_components:
            rot_l2, corr_rot_l2 = C.universal_l2(
                preds['rotations'], gt['rotations'],
                self.rot_stats['shift'], self.rot_stats['scale'], correct_mask)
            loss_dict.update(rotation_l2=rot_l2, corr_rotation_l2=corr_rot_l2)
        if 'translation' in self.q_components:
            transl_l2, corr_transl_l2 = C.universal_l2(
                preds['translations'], gt['translations'],
                self.transl_stats['shift'], self.transl_stats['scale'], correct_mask)
            loss_dict.update(translation_l2=transl_l2, corr_translation_l2=corr_transl_l2)
        return loss_dict, correct_mask

    def _stitch_quality_metrics(self, preds, gt, correct_mask):
        loss_dict = {}
        if 'stitch' in self.q_components:
            tags = preds['stitch_tags']
            if self.explicit_stitch_tags and self.tag_stats is not None:
                tags = tags * self.tag_stats['scale'] + self.tag_stats['shift']
            # uncapped decode capacity (E//2 = every edge paired), matching
            # the reference's unbounded greedy loop (nn/data/datasets.py:
            # 916-968) even for degenerate all-stitched predictions
            n_edges = tags.shape[1] * tags.shape[2]
            prec, rec, corr_prec, corr_rec = stitch_precision_recall(
                tags, preds['free_edges_mask'], gt['stitches'].astype(jnp.int32),
                gt['num_stitches'], max_stitches=max(n_edges // 2, 2),
                correct_mask=correct_mask)
            loss_dict.update(stitch_precision=prec, stitch_recall=rec,
                             corr_stitch_precision=corr_prec,
                             corr_stitch_recall=corr_rec)
        if 'free_class' in self.q_components:
            free_class = jnp.round(jax.nn.sigmoid(preds['free_edges_mask']))
            gt_mask = gt['free_edges_mask'].astype(free_class.dtype)
            loss_dict['free_edge_acc'] = jnp.mean(
                (free_class == gt_mask).astype(jnp.float32))
        return loss_dict


# ======================================================================
# Stitch-model composed loss
# ======================================================================

class ComposedLoss:
    """Compound loss for the stitch pair classifier: BCE on pair logits +
    accuracy / precision / recall quality metrics
    (reference: nn/metrics/composed_loss.py:11-126)."""

    def __init__(self, data_config, in_config=None):
        self.config = {'loss_components': [], 'quality_components': []}
        self.config.update(in_config or {})
        self.with_quality_eval = True
        self.training = False
        self.debug_prints = False
        self.l_components = tuple(self.config['loss_components'])
        self.q_components = tuple(self.config['quality_components'])

    def __call__(self, preds, ground_truth, names=None, epoch=1000, rng=None,
                 mask=None):
        """`mask` (same leading shape as preds, optional): marks the REAL
        pairs when a variable-length exhaustive-pairs batch was padded to a
        shape bucket (eval-time jit friendliness, SURVEY §7 hard-part 5) —
        padded entries contribute to no mean and no count."""
        loss_dict = {}
        full_loss = 0.0
        valid = None if mask is None else mask.reshape(-1)
        if 'edge_pair_class' in self.l_components:
            pair_loss = C.bce_with_logits(
                preds.reshape(-1), ground_truth.reshape(-1), mask=valid)
            loss_dict['edge_pair_class_loss'] = pair_loss
            full_loss += pair_loss

        if self.with_quality_eval:
            preds_sg = jax.lax.stop_gradient(preds)
            if ('edge_pair_class' in self.q_components
                    or 'edge_pair_stitch_recall' in self.q_components):
                pred_class = jnp.round(jax.nn.sigmoid(preds_sg)).reshape(-1)
                gt_mask = ground_truth.reshape(-1).astype(pred_class.dtype)
                if valid is not None:
                    # padded slots: predicted 0 vs gt 0 (no tp/fp/fn), and
                    # excluded from the accuracy mean
                    pred_class = jnp.where(valid, pred_class, 0.0)
                    gt_mask = jnp.where(valid, gt_mask, 0.0)
            if 'edge_pair_class' in self.q_components:
                correct = (pred_class == gt_mask).astype(jnp.float32)
                if valid is None:
                    loss_dict['edge_pair_class_acc'] = jnp.mean(correct)
                else:
                    loss_dict['edge_pair_class_acc'] = (
                        jnp.sum(jnp.where(valid, correct, 0.0))
                        / jnp.maximum(jnp.sum(valid), 1))
            if 'edge_pair_stitch_recall' in self.q_components:
                true_pos = jnp.sum((pred_class == 1) & (gt_mask == 1))
                pred_pos = jnp.sum(pred_class == 1)
                actual_pos = jnp.sum(gt_mask == 1)
                loss_dict['stitch_precision'] = jnp.where(
                    pred_pos > 0, true_pos / jnp.maximum(pred_pos, 1), 0.0)
                loss_dict['stitch_recall'] = jnp.where(
                    actual_pos > 0, true_pos / jnp.maximum(actual_pos, 1), 0.0)

        return full_loss, loss_dict, False

    def eval(self):
        self.training = False

    def train(self, mode=True):
        self.training = mode
