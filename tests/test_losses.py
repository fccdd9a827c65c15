"""Loss-component unit tests against hand-computed oracles."""
import numpy as np
import jax.numpy as jnp

from garment_pattern_estimation_tpu.losses import components as C
from garment_pattern_estimation_tpu.losses.stitches import (
    tags_to_stitches_np, tags_to_stitches_jit,
)

STATS = {'shift': np.array([0.0, 0.0, 0.1, 0.05]),
         'scale': np.array([25.0, 31.0, 0.27, 0.24])}


def test_loop_loss_zero_for_closed_loops():
    # a closed square panel: edges sum to zero
    pad = C.eval_pad_vector(STATS)
    panel = np.zeros((1, 1, 6, 4), dtype=np.float32)
    square = np.array([[1, 0], [0, 1], [-1, 0], [0, -1]], dtype=np.float32)
    panel[0, 0, :4, :2] = square + np.asarray(pad)[:2]
    num_edges = jnp.asarray([4])
    loss = float(C.panel_loop_loss(jnp.asarray(panel), num_edges, pad))
    np.testing.assert_allclose(loss, 0.0, atol=1e-10)

    # open loop: nonzero
    panel[0, 0, 0, 0] += 1.0
    loss = float(C.panel_loop_loss(jnp.asarray(panel), num_edges, pad))
    assert loss > 0.4  # (1)^2 / (1 * 2)


def test_panel_verts_l2_zero_for_identical():
    rng = np.random.default_rng(0)
    outlines = rng.normal(size=(2, 3, 5, 4)).astype(np.float32)
    num_edges = jnp.asarray([4, 3, 0] * 2)
    err, _ = C.panel_verts_l2(jnp.asarray(outlines), jnp.asarray(outlines),
                              num_edges, STATS['shift'], STATS['scale'])
    np.testing.assert_allclose(float(err), 0.0, atol=1e-5)


def test_panel_verts_l2_known_value():
    """Pure-translation error in edge vectors -> known vertex displacement."""
    gt = np.zeros((1, 1, 4, 4), dtype=np.float32)
    gt[0, 0, :3, :2] = np.array([[1, 0], [0, 1], [-1, -1]]) / STATS['scale'][:2]
    gt[0, 0, :, 2:] = -STATS['shift'][2:] / STATS['scale'][2:]  # zero curvature after un-std
    pred = gt.copy()
    # stretch the first edge by 0.5 in un-standardized space
    pred[0, 0, 0, 0] += 0.5 / STATS['scale'][0]
    err, _ = C.panel_verts_l2(jnp.asarray(pred), jnp.asarray(gt),
                              jnp.asarray([3]), STATS['shift'], STATS['scale'])
    # moving one edge vector changes downstream verts; mean-centering spreads it
    assert 0.05 < float(err) < 0.5


def test_universal_l2():
    pred = jnp.asarray(np.ones((2, 3, 3), dtype=np.float32))
    gt = jnp.asarray(np.zeros((2, 3, 3), dtype=np.float32))
    mean, corr = C.universal_l2(pred, gt, np.zeros(3), np.ones(3),
                                correct_mask=jnp.asarray([True, False]))
    np.testing.assert_allclose(float(mean), np.sqrt(3), rtol=1e-6)
    np.testing.assert_allclose(float(corr), np.sqrt(3), rtol=1e-6)


def test_numbers_in_panels():
    pad = C.eval_pad_vector(STATS)
    B, P, L = 1, 3, 6
    outlines = np.tile(np.asarray(pad), (B, P, L, 1)).astype(np.float32)
    # panel 0: a closed square (4 edges)
    square = np.array([[1, 0], [0, 1], [-1, 0], [0, -1]], dtype=np.float32) * 20
    outlines[0, 0, :4, :2] = square / STATS['scale'][:2] + np.asarray(pad)[:2]
    # panel 1: open 3-edge loop -> counts 3 + 1 closing edge = 4
    tri = np.array([[30, 0], [0, 30], [-10, -10]], dtype=np.float32)
    outlines[0, 1, :3, :2] = tri / STATS['scale'][:2] + np.asarray(pad)[:2]
    # panel 2: stays empty

    gt_num_edges = jnp.asarray([4, 4, 0])
    gt_panel_nums = jnp.asarray([2])
    panel_acc, edge_acc, correct, corr_edge_acc = C.numbers_in_panels_accuracies(
        jnp.asarray(outlines), gt_num_edges, gt_panel_nums, pad, STATS['scale'])
    assert float(panel_acc) == 1.0          # 2 panels detected, 2 expected
    np.testing.assert_allclose(float(edge_acc), 1.0)  # both panels: 4 edges each
    assert bool(np.asarray(correct)[0])


def test_tags_to_stitches_roundtrip():
    """Known tag layout decodes to the expected pairs, np and jit agree."""
    P, L = 2, 3
    tags = np.zeros((P, L, 3), dtype=np.float32)
    scores = np.full((P, L), 5.0, dtype=np.float32)  # all free by default
    # stitch A: edges (0,1) and (1,2) share tag [1,3,0]
    tags[0, 1] = [1.2, 3.0, 0]
    tags[1, 2] = [1.2, 3.0, 0]
    scores[0, 1] = scores[1, 2] = -5.0
    # stitch B: edges (0,2) and (1,0) share tag [-2,0,1]
    tags[0, 2] = [-2.0, 0.0, 1.0]
    tags[1, 0] = [-2.0, 0.1, 1.0]
    scores[0, 2] = scores[1, 0] = -5.0

    stitches = tags_to_stitches_np(tags, scores)
    got = {frozenset(pair) for pair in stitches.T.tolist()}
    assert got == {frozenset({1, 5}), frozenset({2, 3})}

    pairs, valid = tags_to_stitches_jit(jnp.asarray(tags), jnp.asarray(scores), 3)
    got_jit = {frozenset(p.tolist()) for p, v in zip(np.asarray(pairs), np.asarray(valid)) if v}
    assert got_jit == got


def test_tags_to_stitches_odd_count():
    """Odd non-free count: the most-free-looking edge is dropped."""
    tags = np.zeros((1, 4, 3), dtype=np.float32)
    scores = np.array([[-5.0, -5.0, -1.0, 5.0]], dtype=np.float32)
    tags[0, 0] = [1, 1, 1]
    tags[0, 1] = [1, 1, 1.05]
    tags[0, 2] = [9, 9, 9]
    stitches = tags_to_stitches_np(tags, scores)
    assert stitches.shape == (2, 1)
    assert set(stitches[:, 0].tolist()) == {0, 1}

    pairs, valid = tags_to_stitches_jit(jnp.asarray(tags), jnp.asarray(scores), 2)
    kept = [set(p.tolist()) for p, v in zip(np.asarray(pairs), np.asarray(valid)) if v]
    assert kept == [{0, 1}]


def test_pattern_stitch_loss_pulls_and_pushes():
    B, P, L, S = 1, 2, 3, 2
    tags = np.zeros((B, P, L, 3), dtype=np.float32)
    stitches = np.zeros((B, 2, S), dtype=np.int64)
    stitches[0, :, 0] = [0, 4]   # edge 0 of panel 0 <-> edge 1 of panel 1
    num = jnp.asarray([1])

    # equal tags on the stitch, far-away others: similarity 0, neg 0 when
    # there is only one stitch (no other tags to push from)
    tags[0, 0, 0] = [1, 2, 3]
    tags[0, 1, 1] = [1, 2, 3]
    loss, bd = C.pattern_stitch_loss(jnp.asarray(tags), jnp.asarray(stitches), num)
    np.testing.assert_allclose(float(bd['stitch_similarity_loss']), 0.0, atol=1e-6)

    # differing tags -> similarity = squared distance
    tags[0, 1, 1] = [1, 2, 4]
    loss, bd = C.pattern_stitch_loss(jnp.asarray(tags), jnp.asarray(stitches), num)
    np.testing.assert_allclose(float(bd['stitch_similarity_loss']), 1.0, atol=1e-6)


def test_bce_matches_manual():
    logits = jnp.asarray([0.5, -1.0, 2.0])
    targets = jnp.asarray([1.0, 0.0, 1.0])
    manual = -np.mean(
        np.log([1 / (1 + np.exp(-0.5)), 1 - 1 / (1 + np.exp(1.0)), 1 / (1 + np.exp(-2.0))]))
    np.testing.assert_allclose(float(C.bce_with_logits(logits, targets)), manual, rtol=1e-4)


def test_stitch_loss_masked_bucket_parity():
    """Padding exhaustive-pairs batches to a shape bucket with a mask must
    not change the loss or any quality metric (SURVEY §7 hard-part 5)."""
    import numpy as np
    import jax.numpy as jnp
    from garment_pattern_estimation_tpu.losses.composed import ComposedLoss

    loss = ComposedLoss({'element_size': 16}, {
        'loss_components': ['edge_pair_class'],
        'quality_components': ['edge_pair_class', 'edge_pair_stitch_recall'],
    })
    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.normal(size=(1, 37)).astype(np.float32))
    gt = jnp.asarray(rng.integers(0, 2, size=(1, 37)).astype(bool))

    plain, plain_dict, _ = loss(logits, gt)

    pad = 64 - 37
    logits_p = jnp.concatenate(
        [logits, jnp.full((1, pad), 9.0)], axis=1)  # poison the padding
    gt_p = jnp.concatenate([gt, jnp.ones((1, pad), bool)], axis=1)
    mask = jnp.concatenate([jnp.ones((1, 37), bool),
                            jnp.zeros((1, pad), bool)], axis=1)
    padded, padded_dict, _ = loss(logits_p, gt_p, mask=mask)

    np.testing.assert_allclose(float(padded), float(plain), rtol=1e-6)
    for key in plain_dict:
        np.testing.assert_allclose(float(padded_dict[key]),
                                   float(plain_dict[key]), rtol=1e-6,
                                   err_msg=f'metric <{key}> diverged')
