"""Loss components and quality metrics, jit-compatible (fixed shapes, masks).

Behavioral counterparts of nn/metrics/losses.py and nn/metrics/metrics.py,
re-expressed as vectorized masked tensor ops: the reference's Python loops
over batch/panels/stitches become batched reductions that run fully on
device.

Shape conventions (padded maxima):
  outlines (B, P, L, 4); rotations (B, P, 4); translations (B, P, 3)
  stitch_tags (B, P, L, 3); free_edges (B, P, L)
  stitches (B, 2, S) int pattern-level edge ids; num_stitches (B,)
  num_edges (B*P,) int; num_panels (B,)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.inf


def eval_pad_vector(data_stats):
    """Padding vector in standardized space: -shift/scale
    (reference: nn/metrics/eval_utils.py:80-87)."""
    shift = jnp.asarray(data_stats['shift'], dtype=jnp.float32)
    scale = jnp.asarray(data_stats['scale'], dtype=jnp.float32)
    return -shift / scale


# ----------------------------------------------------------------------
# Loop-closure prior
# ----------------------------------------------------------------------

def panel_loop_loss(predicted_outlines, gt_num_edges, pad_vector):
    """Squared norm of the sum of each panel's (un-padded) edge vectors:
    closed loops sum to zero. Panels with <3 edges contribute nothing but
    stay in the denominator (reference: nn/metrics/losses.py:19-51)."""
    panels = predicted_outlines.reshape(-1, *predicted_outlines.shape[-2:])  # (BP, L, 4)
    BP, L, _ = panels.shape
    num_edges = gt_num_edges.reshape(-1)

    edge_slots = jnp.arange(L)[None, :]
    in_loop = edge_slots < num_edges[:, None]                      # (BP, L)
    coords = panels[..., :2] - pad_vector[:2]
    loop_sum = jnp.sum(jnp.where(in_loop[..., None], coords, 0.0), axis=1)  # (BP, 2)
    loop_sum = jnp.where((num_edges >= 3)[:, None], loop_sum, 0.0)
    return jnp.sum(loop_sum ** 2) / (BP * 2)


# ----------------------------------------------------------------------
# Stitch-tag contrastive loss
# ----------------------------------------------------------------------

def pattern_stitch_loss(stitch_tags, gt_stitches, gt_stitches_nums,
                        margin=0.3, use_hardnet=False):
    """Pull the tags of the two sides of every GT stitch together; push tags
    of different stitches at least `margin` apart (extended-triplet or
    HardNet closest-negative form). Reference: nn/metrics/losses.py:54-181."""
    B = stitch_tags.shape[0]
    S = gt_stitches.shape[-1]
    flat_tags = stitch_tags.reshape(B, -1, stitch_tags.shape[-1])   # (B, P*L, 3)

    left = jnp.take_along_axis(flat_tags, gt_stitches[:, 0, :, None], axis=1)   # (B, S, 3)
    right = jnp.take_along_axis(flat_tags, gt_stitches[:, 1, :, None], axis=1)

    stitch_valid = jnp.arange(S)[None, :] < gt_stitches_nums[:, None]           # (B, S)

    # -- similarity: per-pattern mean over its stitches, then batch mean --
    sim = jnp.sum((left - right) ** 2, axis=-1)                                  # (B, S)
    per_pattern = jnp.sum(jnp.where(stitch_valid, sim, 0.0), axis=1) \
        / jnp.maximum(gt_stitches_nums, 1)
    similarity_loss = jnp.mean(per_pattern)

    # -- negative (push) term over the 2S tag slots --
    total_tags = jnp.concatenate([left, right], axis=1)                          # (B, 2S, 3)
    tag_valid = jnp.concatenate([stitch_valid, stitch_valid], axis=1)            # (B, 2S)
    dists = jnp.sum(
        (total_tags[:, :, None, :] - total_tags[:, None, :, :]) ** 2, axis=-1)   # (B, 2S, 2S)

    idx = jnp.arange(2 * S)
    self_mask = idx[:, None] == idx[None, :]
    brother = jnp.where(idx < S, idx + S, idx - S)
    brother_mask = brother[:, None] == idx[None, :]
    pair_excluded = self_mask | brother_mask                                     # (2S, 2S)
    pair_valid = tag_valid[:, :, None] & tag_valid[:, None, :]

    num_valid_tags = jnp.sum(tag_valid, axis=1)                                  # (B,) = 2*ns
    total_tag_count = jnp.maximum(jnp.sum(num_valid_tags), 1)

    if use_hardnet:
        masked = jnp.where(pair_valid & ~pair_excluded[None], dists, _INF)
        min_dist = jnp.min(masked, axis=-1)                                      # (B, 2S)
        per_tag = jnp.maximum(margin - min_dist, 0.0)
        per_tag = jnp.where(tag_valid & jnp.isfinite(min_dist), per_tag, 0.0)
        neg_loss = jnp.sum(per_tag) / total_tag_count
    else:
        # extended triplet: hinge against every other tag, averaged over the
        # 2*ns slots per tag (self/brother contribute zeros to the mean)
        hinge = jnp.maximum(margin - dists, 0.0)
        hinge = jnp.where(pair_valid & ~pair_excluded[None], hinge, 0.0)
        per_tag = jnp.sum(hinge, axis=-1) / jnp.maximum(num_valid_tags, 1)[:, None]
        per_tag = jnp.where(tag_valid, per_tag, 0.0)
        neg_loss = jnp.sum(per_tag) / total_tag_count

    total = similarity_loss + neg_loss
    return total, {'stitch_similarity_loss': similarity_loss,
                   'stitch_neg_loss': neg_loss}


def bce_with_logits(logits, targets, mask=None):
    """Mean binary cross-entropy on logits (torch BCEWithLogitsLoss).
    `mask` restricts the mean to the marked elements (padded-bucket eval)."""
    targets = targets.astype(logits.dtype)
    per_elem = (jnp.maximum(logits, 0) - logits * targets
                + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    if mask is None:
        return jnp.mean(per_elem)
    return jnp.sum(jnp.where(mask, per_elem, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


# ----------------------------------------------------------------------
# Discrete structure accuracy
# ----------------------------------------------------------------------

def _torch_isclose(a, b, atol, rtol=1e-5):
    return jnp.abs(a - b) <= atol + rtol * jnp.abs(b)


def numbers_in_panels_accuracies(predicted_outlines, gt_num_edges, gt_panel_nums,
                                 pad_vector, outline_scale):
    """#panels / #edges detection accuracy from raw outline tensors
    (reference: nn/metrics/metrics.py:95-182).

    Returns (panel-count acc, edge-count acc, per-pattern correctness mask,
    edge acc within correct patterns — nan if no pattern is correct)."""
    B, P, L, E = predicted_outlines.shape
    empty_template = jnp.broadcast_to(pad_vector, (L, E))
    loop_threshold = jnp.asarray([3.0, 3.0]) / jnp.asarray(outline_scale)[:2]

    close = _torch_isclose(predicted_outlines, empty_template, atol=0.07)   # (B,P,L,E)
    pred_num_edges = jnp.sum(~jnp.all(close, axis=-1), axis=-1)             # (B,P)

    loop_distance = jnp.sum(predicted_outlines[..., :2], axis=2)            # (B,P,2)
    loop_open = jnp.any(jnp.abs(loop_distance) > loop_threshold, axis=-1)   # (B,P)
    pred_num_edges = pred_num_edges + loop_open.astype(pred_num_edges.dtype)

    panel_exists = pred_num_edges >= 3                                       # (B,P)
    pred_num_panels = jnp.sum(panel_exists, axis=1)                          # (B,)

    gt_edges = gt_num_edges.reshape(B, P)
    panel_correct = panel_exists & (pred_num_edges == gt_edges)              # (B,P)
    correct_edges_frac = jnp.sum(panel_correct, axis=1) / jnp.maximum(gt_panel_nums, 1)

    correct_pattern = pred_num_panels == gt_panel_nums                       # (B,)
    num_panel_acc = jnp.mean(correct_pattern.astype(jnp.float32))
    num_edge_acc = jnp.mean(correct_edges_frac)
    corr_edge_acc = jnp.sum(jnp.where(correct_pattern, correct_edges_frac, 0.0)) \
        / jnp.sum(correct_pattern)  # nan when no correct patterns (parity: 0/0)
    return num_panel_acc, num_edge_acc, correct_pattern, corr_edge_acc


# ----------------------------------------------------------------------
# Panel shape quality (the headline metric)
# ----------------------------------------------------------------------

def _panels_to_verts(panels):
    """(BP, L, 4) edge vectors -> (BP, 2L+1, 2) vertices incl. interleaved
    curvature control points (reference: nn/metrics/metrics.py:259-281)."""
    BP, L, _ = panels.shape
    edge_vecs = panels[..., :2]
    ends = jnp.cumsum(edge_vecs, axis=1)                         # vertex after edge e
    starts = jnp.concatenate([jnp.zeros((BP, 1, 2)), ends[:, :-1]], axis=1)
    perp = jnp.stack([-edge_vecs[..., 1], edge_vecs[..., 0]], axis=-1)
    curls = starts + panels[..., 2:3] * edge_vecs + panels[..., 3:4] * perp

    interleaved = jnp.stack([curls, ends], axis=2).reshape(BP, 2 * L, 2)
    origin = jnp.zeros((BP, 1, 2))
    return jnp.concatenate([origin, interleaved], axis=1)        # (BP, 2L+1, 2)


def panel_verts_l2(predicted_outlines, gt_outlines, gt_num_edges,
                   outline_shift, outline_scale, correct_mask=None):
    """Mean per-vertex L2 between un-standardized decoded panels
    (reference: nn/metrics/metrics.py:185-281). Returns (mean, mean over
    correct-count patterns or nan)."""
    B, P, L, E = predicted_outlines.shape
    shift = jnp.asarray(outline_shift)
    scale = jnp.asarray(outline_scale)

    pred = (predicted_outlines * scale + shift).reshape(-1, L, E)
    gt = (gt_outlines * scale + shift).reshape(-1, L, E)
    num_edges = gt_num_edges.reshape(-1)

    # zero the padded edges so cumsums stop growing past the loop
    edge_valid = jnp.arange(L)[None, :] < num_edges[:, None]
    pred = jnp.where(edge_valid[..., None], pred, 0.0)
    gt = jnp.where(edge_valid[..., None], gt, 0.0)

    pred_verts = _panels_to_verts(pred)
    gt_verts = _panels_to_verts(gt)

    # row validity: origin + 2 rows per valid edge
    row_ids = jnp.arange(2 * L + 1)[None, :]
    rows_valid = row_ids < (2 * num_edges + 1)[:, None]          # (BP, 2L+1)
    n_rows = jnp.maximum(jnp.sum(rows_valid, axis=1), 1)

    def center(v):
        mean = jnp.sum(jnp.where(rows_valid[..., None], v, 0.0), axis=1) \
            / n_rows[:, None]
        return v - mean[:, None, :]

    err = jnp.sqrt(jnp.sum((center(gt_verts) - center(pred_verts)) ** 2, axis=-1))
    per_panel = jnp.sum(jnp.where(rows_valid, err, 0.0), axis=1) / n_rows   # (BP,)

    panel_nonempty = num_edges >= 3
    mean_err = jnp.sum(jnp.where(panel_nonempty, per_panel, 0.0)) \
        / jnp.maximum(jnp.sum(panel_nonempty), 1)

    if correct_mask is None:
        return mean_err, jnp.nan
    panel_corr = jnp.repeat(correct_mask, P) & panel_nonempty
    corr_err = jnp.sum(jnp.where(panel_corr, per_panel, 0.0)) / jnp.sum(panel_corr)
    return mean_err, corr_err  # corr is nan when no correct patterns


def universal_l2(predicted, gt, shift, scale, correct_mask=None):
    """Mean L2 on un-standardized placement vectors; averages over *all*
    B*P rows incl. empty panels (parity with nn/metrics/metrics.py:284-325)."""
    P = predicted.shape[1]
    shift = jnp.asarray(shift)
    scale = jnp.asarray(scale)
    pred = predicted.reshape(-1, predicted.shape[-1]) * scale + shift
    gt_flat = gt.reshape(-1, gt.shape[-1]) * scale + shift
    norms = jnp.sqrt(jnp.sum((gt_flat - pred) ** 2, axis=-1))
    mean_norm = jnp.mean(norms)
    if correct_mask is None:
        return mean_norm, jnp.nan
    mask = jnp.repeat(correct_mask, P)
    corr = jnp.sum(jnp.where(mask, norms, 0.0)) / jnp.maximum(jnp.sum(mask), 1)
    corr = jnp.where(jnp.sum(mask) > 0, corr, jnp.nan)
    return mean_norm, corr
