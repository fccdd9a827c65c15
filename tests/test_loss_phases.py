"""Less-traveled composed-loss branches: random-order warmup, order_by
variants, HardNet negative loss, segmentation loss, loss-structure flag."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from garment_pattern_estimation_tpu.losses import ComposedPatternLoss
from garment_pattern_estimation_tpu.losses.composed import (
    greedy_order_match, permute_panels, renumber_stitches_after_permute,
)

from test_models import DATA_CONFIG, _fake_gt, B, N  # reuse fixtures/shapes


def _fake_preds(seed=17):
    rng = np.random.default_rng(seed)
    P, L = 5, 6
    return {
        'outlines': jnp.asarray(rng.normal(size=(B, P, L, 4)).astype(np.float32)),
        'rotations': jnp.asarray(rng.normal(size=(B, P, 4)).astype(np.float32)),
        'translations': jnp.asarray(rng.normal(size=(B, P, 3)).astype(np.float32)),
        'stitch_tags': jnp.asarray(rng.normal(size=(B, P, L, 3)).astype(np.float32)),
        'free_edges_mask': jnp.asarray(rng.normal(size=(B, P, L)).astype(np.float32)),
        'att_weights': jax.nn.softmax(
            jnp.asarray(rng.normal(size=(B, N, 5)).astype(np.float32))),
    }


def test_random_order_warmup_needs_and_uses_rng():
    loss = ComposedPatternLoss(DATA_CONFIG, {
        'loss_components': ['shape'], 'quality_components': [],
        'panel_order_inariant_loss': True, 'panel_origin_invariant_loss': False,
        'order_by': 'shape_translation', 'epoch_with_order_matching': 5})
    loss.with_quality_eval = False
    preds, gt = _fake_preds(), _fake_gt(np.random.default_rng(1))

    with pytest.raises(ValueError):
        loss(preds, gt, epoch=0)  # warmup phase requires an rng

    l1, _, _ = loss(preds, gt, epoch=0, rng=jax.random.PRNGKey(0))
    l2, _, _ = loss(preds, gt, epoch=0, rng=jax.random.PRNGKey(1))
    assert float(l1) != float(l2)  # different random permutations

    # structure-change flag fires exactly at the matching epoch
    _, _, flag4 = loss(preds, gt, epoch=4, rng=jax.random.PRNGKey(0))
    _, _, flag5 = loss(preds, gt, epoch=5)
    assert not flag4 and flag5


@pytest.mark.parametrize('order_by', ['placement', 'translation', 'stitches'])
def test_order_by_variants_run(order_by):
    loss = ComposedPatternLoss(DATA_CONFIG, {
        'loss_components': ['shape', 'rotation', 'translation', 'free_class'],
        'quality_components': [],
        'panel_order_inariant_loss': True, 'panel_origin_invariant_loss': False,
        'order_by': order_by, 'epoch_with_stitches': 2})
    loss.with_quality_eval = False
    preds, gt = _fake_preds(), _fake_gt(np.random.default_rng(2))
    value, breakdown, _ = loss(preds, gt, epoch=10)
    assert np.isfinite(float(value))
    assert 'free_edges_loss' in breakdown


def test_hardnet_variant_and_supervised_tags():
    loss = ComposedPatternLoss(DATA_CONFIG, {
        'loss_components': ['shape', 'stitch', 'stitch_supervised'],
        'quality_components': [],
        'panel_order_inariant_loss': False, 'panel_origin_invariant_loss': False,
        'stitch_hardnet_version': True, 'epoch_with_stitches': 0})
    loss.with_quality_eval = False
    preds, gt = _fake_preds(), _fake_gt(np.random.default_rng(3))
    value, breakdown, _ = loss(preds, gt, epoch=1)
    assert np.isfinite(float(value))
    assert 'stitch_neg_loss' in breakdown and 'stitch_supervised_loss' in breakdown


def test_segmentation_loss_branch():
    loss = ComposedPatternLoss(DATA_CONFIG, {
        'loss_components': ['shape', 'segmentation'],
        'quality_components': [],
        'panel_order_inariant_loss': False, 'panel_origin_invariant_loss': False,
        'segm_loss_weight': 0.05})
    loss.with_quality_eval = False
    preds, gt = _fake_preds(), _fake_gt(np.random.default_rng(4))
    value, breakdown, _ = loss(preds, gt, epoch=0)
    assert 'segm_loss' in breakdown
    assert float(breakdown['segm_loss']) >= 0

    # order matching + segmentation is rejected like the reference
    bad = ComposedPatternLoss(DATA_CONFIG, {
        'loss_components': ['segmentation'], 'quality_components': [],
        'panel_order_inariant_loss': True})
    bad.with_quality_eval = False
    with pytest.raises(NotImplementedError):
        bad(preds, gt, epoch=10)


def test_greedy_assignment_recovers_known_permutation():
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(2, 5, 7)).astype(np.float32) * 10
    perm_true = np.array([[3, 0, 4, 1, 2], [1, 2, 0, 4, 3]])
    gt_feats = np.stack([feats[b][perm_true[b]] for b in range(2)])
    # prediction at slot p equals gt panel perm_true[p] -> matching must
    # recover exactly that permutation
    perm = np.asarray(greedy_order_match(jnp.asarray(feats), jnp.asarray(gt_feats)))
    # new_gt[p] = gt[perm[p]] must equal pred[p] = feats[p]; since
    # gt[q] = feats[perm_true[q]], perm[p] solves perm_true[perm[p]] == p
    np.testing.assert_array_equal(perm, np.argsort(perm_true, axis=1))
    # applying it aligns gt to predictions
    aligned = np.asarray(permute_panels(jnp.asarray(gt_feats), jnp.asarray(perm)))
    np.testing.assert_allclose(aligned, feats, atol=1e-6)


def test_stitch_renumbering_consistency():
    """After permutation + renumbering, stitch ids point at the same panels."""
    L = 6
    stitches = jnp.asarray([[[0 * L + 1, 2 * L + 3], [1 * L + 0, 4 * L + 2]]])
    num = jnp.asarray([2])
    perm = jnp.asarray([[2, 0, 1, 4, 3]])  # new slot p holds old panel perm[p]
    renumbered = np.asarray(renumber_stitches_after_permute(stitches, num, perm, L))
    # old panel 0 now sits at slot 1, old 2 -> slot 0, old 1 -> slot 2, old 4 -> slot 3
    assert renumbered[0, 0, 0] == 1 * L + 1
    assert renumbered[0, 0, 1] == 0 * L + 3
    assert renumbered[0, 1, 0] == 2 * L + 0
    assert renumbered[0, 1, 1] == 3 * L + 2
