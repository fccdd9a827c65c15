"""Model forward shapes + differentiability of the full loss pipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from garment_pattern_estimation_tpu.models import build_model

DATA_CONFIG = {
    'element_size': 4,
    'rotation_size': 4,
    'translation_size': 3,
    'max_panel_len': 6,
    'max_pattern_len': 5,
    'max_num_stitches': 6,
    'explicit_stitch_tags': False,
    'standardize': {
        'gt_shift': {
            'outlines': [0, 0, 0.1, 0.05],
            'rotations': [-0.7, -0.9, -1, 0],
            'translations': [-55, -20, -17],
            'stitch_tags': [-60, -78, -53],
        },
        'gt_scale': {
            'outlines': [25, 31, 0.27, 0.24],
            'rotations': [1.7, 1.9, 1.7, 1],
            'translations': [109, 98, 37],
            'stitch_tags': [120, 156, 106],
        },
    },
}

NN_CONFIG = {
    'panel_encoding_size': 32, 'panel_hidden_size': 32, 'panel_n_layers': 2,
    'pattern_encoding_size': 32, 'pattern_hidden_size': 32, 'pattern_n_layers': 2,
    'EConv_hidden': 16, 'EConv_feature': 12, 'k_neighbors': 4,
    'conv_depth': 2, 'skip_connections': True, 'global_pool': 'mean',
    'local_attention': True,
}

B, N = 2, 50


def _fake_gt(rng, batch=B):
    P, L, S = 5, 6, 6
    num_edges = np.zeros((batch, P), dtype=np.int32)
    num_edges[:, :3] = rng.integers(3, L + 1, size=(batch, 3))
    stitches = np.zeros((batch, 2, S), dtype=np.int32)
    num_stitches = np.full(batch, 2, dtype=np.int32)
    for b in range(batch):
        stitches[b, :, 0] = [0 * L + 0, 1 * L + 1]
        stitches[b, :, 1] = [1 * L + 0, 2 * L + 1]
    free_mask = np.ones((batch, P, L), dtype=bool)
    for b in range(batch):
        for side in range(2):
            for s in range(num_stitches[b]):
                e = stitches[b, side, s]
                free_mask[b, e // L, e % L] = False
    outlines = rng.normal(size=(batch, P, L, 4)).astype(np.float32)
    edge_mask = np.arange(L)[None, None, :] < num_edges[..., None]
    outlines *= edge_mask[..., None]
    return {
        'outlines': jnp.asarray(outlines),
        'num_edges': jnp.asarray(num_edges),
        'num_panels': jnp.asarray((num_edges > 0).sum(1)),
        'empty_panels_mask': jnp.asarray(num_edges == 0),
        'rotations': jnp.asarray(rng.normal(size=(batch, P, 4)).astype(np.float32)),
        'translations': jnp.asarray(rng.normal(size=(batch, P, 3)).astype(np.float32)),
        'stitches': jnp.asarray(stitches),
        'num_stitches': jnp.asarray(num_stitches),
        'free_edges_mask': jnp.asarray(free_mask),
        'stitch_tags': jnp.asarray(rng.normal(size=(batch, P, L, 3)).astype(np.float32)),
        'segmentation': jnp.asarray(rng.integers(0, 5, size=(batch, N))),
    }


@pytest.fixture(scope='module')
def features():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))


@pytest.mark.parametrize('model_name', ['GarmentFullPattern3D', 'GarmentSegmentPattern3D'])
def test_shape_model_forward(model_name, features):
    model = build_model(model_name, DATA_CONFIG, NN_CONFIG,
                        {'loss_components': ['shape', 'loop', 'rotation', 'translation'],
                         'quality_components': ['shape', 'discrete', 'rotation', 'translation'],
                         'panel_order_inariant_loss': False,
                         'panel_origin_invariant_loss': False},
                        use_pallas=False)
    variables = model.init_variables(jax.random.PRNGKey(0), features)
    preds = model.apply(variables, features, train=False)
    assert preds['outlines'].shape == (B, 5, 6, 4)
    assert preds['rotations'].shape == (B, 5, 4)
    assert preds['translations'].shape == (B, 5, 3)
    assert preds['stitch_tags'].shape == (B, 5, 6, 3)
    assert preds['free_edges_mask'].shape == (B, 5, 6)
    if model_name == 'GarmentSegmentPattern3D':
        att = np.asarray(preds['att_weights'])
        assert att.shape == (B, N, 5)
        np.testing.assert_allclose(att.sum(-1), 1.0, atol=1e-5)
        assert (att >= 0).all()  # valid simplex weights (sparsity only after training)

    for key, val in preds.items():
        assert np.isfinite(np.asarray(val)).all(), key


def test_stitch_model_forward():
    rng = np.random.default_rng(1)
    pairs = jnp.asarray(rng.normal(size=(3, 40, 16)).astype(np.float32))
    model = build_model('StitchOnEdge3DPairs', {'element_size': 16}, {})
    variables = model.init_variables(jax.random.PRNGKey(0), pairs)
    logits = model.apply(variables, pairs, train=False)
    assert logits.shape == (3, 40)

    loss, ld, changed = model.loss(logits, jnp.asarray(rng.integers(0, 2, (3, 40))))
    assert np.isfinite(float(loss))
    assert 'edge_pair_class_acc' in ld and 'stitch_precision' in ld
    assert not changed


def test_train_step_grads_and_batchnorm(features):
    """One full training step: loss with canonicalization, grads flow, batch
    stats update."""
    model = build_model(
        'GarmentSegmentPattern3D', DATA_CONFIG, NN_CONFIG,
        {'loss_components': ['shape', 'loop', 'rotation', 'translation',
                             'stitch', 'free_class'],
         'quality_components': ['shape', 'discrete', 'rotation', 'translation',
                                'stitch', 'free_class'],
         'panel_order_inariant_loss': True,
         'panel_origin_invariant_loss': True,
         'order_by': 'shape_translation',
         'epoch_with_stitches': 2},
        use_pallas=False)
    variables = model.init_variables(jax.random.PRNGKey(0), features)
    gt = _fake_gt(np.random.default_rng(2))

    def loss_fn(params, batch_stats):
        preds, mutated = model.module.apply(
            {'params': params, 'batch_stats': batch_stats},
            features, train=True, mutable=['batch_stats'],
            rngs={'recurrent_init': jax.random.PRNGKey(3)})
        loss, ld, _ = model.loss(preds, gt, epoch=10)  # past stitch epoch
        return loss, (ld, mutated)

    (loss, (ld, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables['params'], variables['batch_stats'])

    assert np.isfinite(float(loss))
    # every expected term present
    for key in ['pattern_loss', 'loop_loss', 'rotation_loss', 'translation_loss',
                'stitch_similarity_loss', 'stitch_neg_loss', 'free_edges_loss',
                'panel_shape_l2', 'num_panels_accuracy', 'stitch_precision',
                'free_edge_acc']:
        assert key in ld, key
    # gradients are finite and non-zero somewhere
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
    # batch stats changed
    bs_old = jax.tree_util.tree_leaves(variables['batch_stats'])
    bs_new = jax.tree_util.tree_leaves(mutated['batch_stats'])
    assert any(not np.allclose(a, b) for a, b in zip(bs_old, bs_new))


@pytest.fixture(scope='module')
def fake_preds():
    """Random-but-plausible predictions: loss invariance tests don't need a
    real forward pass (saves minutes of jit compile on 1 CPU core)."""
    rng = np.random.default_rng(17)
    P, L = 5, 6
    return {
        'outlines': jnp.asarray(rng.normal(size=(B, P, L, 4)).astype(np.float32)),
        'rotations': jnp.asarray(rng.normal(size=(B, P, 4)).astype(np.float32)),
        'translations': jnp.asarray(rng.normal(size=(B, P, 3)).astype(np.float32)),
        'stitch_tags': jnp.asarray(rng.normal(size=(B, P, L, 3)).astype(np.float32)),
        'free_edges_mask': jnp.asarray(rng.normal(size=(B, P, L)).astype(np.float32)),
    }


def test_loss_panel_order_invariance(fake_preds):
    """With order matching on, shuffling GT panels must not change the loss."""
    from garment_pattern_estimation_tpu.losses import ComposedPatternLoss
    loss_obj = ComposedPatternLoss(
        DATA_CONFIG,
        {'loss_components': ['shape', 'loop', 'rotation', 'translation'],
         'quality_components': [],
         'panel_order_inariant_loss': True,
         'panel_origin_invariant_loss': False,
         'order_by': 'shape_translation'})
    loss_obj.with_quality_eval = False
    preds = fake_preds
    gt = _fake_gt(np.random.default_rng(4))

    loss1, _, _ = loss_obj(preds, gt, epoch=10)

    perm = np.array([2, 0, 1, 4, 3])
    gt_shuffled = dict(gt)
    for key in ['outlines', 'num_edges', 'empty_panels_mask', 'rotations',
                'translations', 'free_edges_mask', 'stitch_tags']:
        gt_shuffled[key] = gt[key][:, perm]
    loss2, _, _ = loss_obj(preds, gt_shuffled, epoch=10)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)


def test_loss_origin_invariance(fake_preds):
    """With origin matching on, rotating GT edge loops must not change the loss."""
    from garment_pattern_estimation_tpu.losses import ComposedPatternLoss
    loss_obj = ComposedPatternLoss(
        DATA_CONFIG,
        {'loss_components': ['shape', 'loop'],
         'quality_components': [],
         'panel_order_inariant_loss': False,
         'panel_origin_invariant_loss': True})
    loss_obj.with_quality_eval = False
    preds = fake_preds
    gt = _fake_gt(np.random.default_rng(5))

    loss1, _, _ = loss_obj(preds, gt, epoch=10)

    # rotate every non-empty panel's loop by 1
    outlines = np.asarray(gt['outlines']).copy()
    num_edges = np.asarray(gt['num_edges'])
    for b in range(B):
        for p in range(5):
            ne = num_edges[b, p]
            if ne >= 3:
                outlines[b, p, :ne] = np.roll(outlines[b, p, :ne], -1, axis=0)
    gt_rolled = dict(gt)
    gt_rolled['outlines'] = jnp.asarray(outlines)
    loss2, _, _ = loss_obj(preds, gt_rolled, epoch=10)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)


@pytest.mark.parametrize('extractor', ['PointNetPlusPlus',
                                       'EdgeConvPoolingFeatures'])
def test_alternative_encoders_build_and_run(extractor, features):
    """Every ENCODER_REGISTRY entry must be constructible through the model
    builder (EdgeConvPoolingFeatures used to receive kwargs its dataclass
    does not declare) and produce a full prediction dict."""
    nn_config = dict(NN_CONFIG, feature_extractor=extractor)
    model = build_model('GarmentFullPattern3D', DATA_CONFIG, nn_config,
                        {'loss_components': ['shape'],
                         'quality_components': [],
                         'panel_order_inariant_loss': False,
                         'panel_origin_invariant_loss': False},
                        use_pallas=False)
    variables = model.init_variables(jax.random.PRNGKey(0), features)
    preds = model.apply(variables, features, train=False)
    assert preds['outlines'].shape == (B, 5, 6, 4)
    assert np.isfinite(np.asarray(preds['outlines'])).all()


class _PlainStack(__import__('flax').linen.Module):
    """Literal flax Dense->ReLU->BN stack: the oracle for MLP's folded
    evaluation (runtime BN folding + factored/edge modes must be pure
    reformulations of this)."""
    features: tuple

    @__import__('flax').linen.compact
    def __call__(self, x, train=False):
        nn = __import__('flax').linen
        for size in self.features:
            x = nn.Dense(size)(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5)(x)
        return x


@pytest.mark.parametrize('train', [True, False])
def test_mlp_bn_folding_matches_plain_stack(train):
    """MLP folds non-final BNs into the next layer's weights at runtime;
    outputs and running-statistics updates must match the literal stacked
    module (identical variable trees) to f32 reassociation noise."""
    from garment_pattern_estimation_tpu.models.blocks import MLP

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(6, 40, 24)).astype(np.float32))
    plain = _PlainStack((32, 32, 16))
    folded = MLP([32, 32, 16])
    variables = plain.init(jax.random.PRNGKey(0), x, train=True)
    assert (jax.tree_util.tree_structure(variables) ==
            jax.tree_util.tree_structure(
                folded.init(jax.random.PRNGKey(0), x, train=True)))

    kwargs = dict(mutable=['batch_stats']) if train else {}
    out_p = plain.apply(variables, x, train=train, **kwargs)
    out_f = folded.apply(variables, x, train=train, **kwargs)
    if train:
        out_p, mut_p = out_p
        out_f, mut_f = out_f
        for a, b in zip(jax.tree_util.tree_leaves(mut_f),
                        jax.tree_util.tree_leaves(mut_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('train', [True, False])
def test_f32_conv_layers_precision_island(train):
    """`f32_conv_layers` exempts conv layers from bf16 compute: with every
    conv exempted the encoder's per-point features are bit-identical to the
    all-f32 module (same params), and exempting only conv0 changes the
    output vs full bf16 (the knob actually gates the layer)."""
    from garment_pattern_estimation_tpu.models.blocks import EdgeConvFeatures

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 48, 3)).astype(np.float32))
    kw = dict(out_size=16, conv_depth=2, k_neighbors=4, econv_hidden=16,
              econv_feature=12, skip_connections=True, use_pallas=False)

    f32 = EdgeConvFeatures(**kw)
    all_exempt = EdgeConvFeatures(compute_dtype='bfloat16',
                                  f32_conv_layers=(0, 1), **kw)
    conv0_only = EdgeConvFeatures(compute_dtype='bfloat16',
                                  f32_conv_layers=(0,), **kw)
    full_bf16 = EdgeConvFeatures(compute_dtype='bfloat16', **kw)

    variables = f32.init(jax.random.PRNGKey(0), x, train=True)
    kwargs = dict(mutable=['batch_stats']) if train else {}

    def points(module):
        out = module.apply(variables, x, pool_global=False, train=train,
                           **kwargs)
        (_, pts, _) = out[0] if train else out
        return np.asarray(pts)

    np.testing.assert_array_equal(points(all_exempt), points(f32))
    assert points(conv0_only).dtype == np.float32
    assert np.abs(points(conv0_only) - points(full_bf16)).max() > 0


def test_f32_attention_mlp_island():
    """`f32_attention_mlp` exempts the attention head from bf16 compute:
    with both convs also exempted the full forward is bit-identical to the
    all-f32 model (same params); without it, bf16 in the attention MLP
    changes the outputs. Checked through build_model so the NN-config key
    round-trips the registry."""
    from garment_pattern_estimation_tpu.models import build_model

    nn = dict(NN_CONFIG, model='GarmentSegmentPattern3D')

    def forward(extra):
        model = build_model('GarmentSegmentPattern3D', DATA_CONFIG,
                            {**nn, **extra}, {}, use_pallas=False)
        variables = model.init_variables(jax.random.PRNGKey(0),
                                         jnp.zeros((2, 32, 3)), train=False)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, 32, 3)).astype(np.float32))
        return model.apply(variables, x, train=False)

    f32 = forward({})
    islands = forward({'compute_dtype': 'bfloat16',
                       'f32_conv_layers': [0, 1], 'f32_attention_mlp': True})
    bf16_att = forward({'compute_dtype': 'bfloat16',
                        'f32_conv_layers': [0, 1]})
    np.testing.assert_array_equal(np.asarray(islands['translations']),
                                  np.asarray(f32['translations']))
    assert np.abs(np.asarray(bf16_att['att_weights'])
                  - np.asarray(f32['att_weights'])).max() > 0
