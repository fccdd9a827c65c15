"""Stitch decoding from predicted tags + precision/recall metric.

`tags_to_stitches_np` is the host-side greedy decoder used on the prediction
-> pattern-JSON path (behavioral counterpart of
Garment3DPatternFullDataset.tags_to_stitches, nn/data/datasets.py:916-968).
`tags_to_stitches_jit` is the same algorithm as fixed-shape masked ops for
in-training quality metrics (`stitch` in quality_components).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_INF = np.inf


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def tags_to_stitches_np(stitch_tags, free_edges_score):
    """Greedy min-distance pairing of non-free edge tags.

    stitch_tags (P, L, 3) or (E, 3); free_edges_score (P, L) or (E,) logits.
    Returns (2, n_stitches) int array of pattern-level edge ids (may be empty).
    """
    flat_tags = np.asarray(stitch_tags).reshape(-1, np.asarray(stitch_tags).shape[-1])
    flat_scores = np.asarray(free_edges_score).reshape(-1)
    free_mask = np.round(_sigmoid(flat_scores)).astype(bool)

    non_free_mask = ~free_mask
    non_free_edges = np.flatnonzero(non_free_mask)
    if non_free_mask.sum() == 0 or len(non_free_edges) < 2:
        print('tags_to_stitches::Warning::no non-zero stitch tags detected')
        return np.zeros((2, 0), dtype=np.int64)

    if len(non_free_edges) % 2:  # odd count: drop the most-free-looking edge
        to_remove = flat_scores[non_free_mask].argmax()
        non_free_mask[non_free_edges[to_remove]] = False
        non_free_edges = np.flatnonzero(non_free_mask)

    num = len(non_free_edges)
    tags = flat_tags[non_free_mask]
    dist = np.sqrt(((tags[:, None, :] - tags[None, :, :]) ** 2).sum(-1))
    tril = np.tril_indices(num)
    dist[tril] = _INF

    stitches = []
    for _ in range(num // 2):
        flat_min = dist.argmin()
        row, col = flat_min // num, flat_min % num
        stitches.append([int(non_free_edges[row]), int(non_free_edges[col])])
        dist[row, :] = dist[:, row] = dist[:, col] = dist[col, :] = _INF

    return np.array(stitches, dtype=np.int64).T if stitches else np.zeros((2, 0), dtype=np.int64)


def tags_to_stitches_jit(stitch_tags, free_edges_score, max_stitches):
    """Fixed-shape variant: returns (pairs (max_stitches, 2), valid mask).

    `max_stitches` bounds the decode; anything past it is dropped (in
    practice predictions have far fewer non-free edges than E/2)."""
    E = stitch_tags.reshape(-1, stitch_tags.shape[-1]).shape[0]
    flat_tags = stitch_tags.reshape(E, -1)
    flat_scores = free_edges_score.reshape(E)

    free = jnp.round(jax.nn.sigmoid(flat_scores)) > 0.5
    non_free = ~free
    count = jnp.sum(non_free)

    # odd count: flip the non-free edge with the highest free-score
    scores_masked = jnp.where(non_free, flat_scores, -jnp.inf)
    drop_idx = jnp.argmax(scores_masked)
    non_free = jnp.where(count % 2 == 1,
                         non_free & ~(jnp.arange(E) == drop_idx), non_free)

    valid_pair = non_free[:, None] & non_free[None, :]
    upper = jnp.triu(jnp.ones((E, E), bool), k=1)
    dist = jnp.sqrt(jnp.sum((flat_tags[:, None] - flat_tags[None, :]) ** 2, axis=-1))
    dist = jnp.where(valid_pair & upper, dist, jnp.inf)

    def body(_, state):
        dist, pairs, valid, n = state
        flat_min = jnp.argmin(dist.reshape(-1))
        row, col = flat_min // E, flat_min % E
        is_valid = jnp.isfinite(dist.reshape(-1)[flat_min])
        pairs = pairs.at[n].set(jnp.where(is_valid,
                                          jnp.stack([row, col]), pairs[n]))
        valid = valid.at[n].set(is_valid)
        kill = (jnp.arange(E) == row) | (jnp.arange(E) == col)
        dist = jnp.where(is_valid & (kill[:, None] | kill[None, :]), jnp.inf, dist)
        return dist, pairs, valid, n + is_valid.astype(jnp.int32)

    pairs0 = jnp.zeros((max_stitches, 2), jnp.int32)
    valid0 = jnp.zeros(max_stitches, bool)
    _, pairs, valid, _ = jax.lax.fori_loop(
        0, max_stitches, body, (dist, pairs0, valid0, jnp.int32(0)))
    return pairs, valid


def stitch_precision_recall(stitch_tags, free_edges_score, gt_stitches,
                            gt_stitches_nums, max_stitches, correct_mask=None):
    """Batch-mean precision/recall of tags->stitches decoding vs GT pairs,
    order-invariant per stitch (reference: nn/metrics/metrics.py:13-79).

    Returns (precision, recall, corr_precision, corr_recall) — the corr_*
    values are nan when no pattern qualifies (reference returns None)."""
    B = stitch_tags.shape[0]

    def per_pattern(tags, scores, gt, ns):
        pairs, valid = tags_to_stitches_jit(tags, scores, max_stitches)
        n_detected = jnp.sum(valid)

        S = gt.shape[-1]
        gt_valid = jnp.arange(S) < ns
        d0, d1 = pairs[:, 0][:, None], pairs[:, 1][:, None]
        g0, g1 = gt[0][None, :], gt[1][None, :]
        match = ((d0 == g0) & (d1 == g1)) | ((d0 == g1) & (d1 == g0))
        match = match & gt_valid[None, :] & valid[:, None]
        n_correct = jnp.sum(jnp.any(match, axis=1))

        precision = jnp.where(n_detected > 0, n_correct / jnp.maximum(n_detected, 1), 0.0)
        recall = jnp.where(ns > 0, n_correct / jnp.maximum(ns, 1), 0.0)
        return precision, recall, n_detected > 0

    precision, recall, has_detection = jax.vmap(per_pattern)(
        stitch_tags, free_edges_score, gt_stitches, gt_stitches_nums)

    tot_precision = jnp.sum(precision) / B
    tot_recall = jnp.sum(recall) / B

    if correct_mask is None:
        return tot_precision, tot_recall, jnp.nan, jnp.nan
    qualify = correct_mask & has_detection
    n_q = jnp.sum(qualify)
    corr_p = jnp.where(n_q > 0, jnp.sum(jnp.where(qualify, precision, 0.0)) / jnp.maximum(n_q, 1), jnp.nan)
    corr_r = jnp.where(n_q > 0, jnp.sum(jnp.where(qualify, recall, 0.0)) / jnp.maximum(n_q, 1), jnp.nan)
    return tot_precision, tot_recall, corr_p, corr_r
