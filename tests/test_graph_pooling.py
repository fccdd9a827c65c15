"""Graph pooling blocks: DynamicGraphPool + EdgeConvPoolingFeatures +
EdgeConvFeatures(graph_pooling=True) + PointNet++ encoder forward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from garment_pattern_estimation_tpu.models.blocks import (
    DynamicGraphPool, EdgeConvPoolingFeatures, EdgeConvFeatures, PointNetPlusPlus,
    farthest_point_sampling,
)


@pytest.fixture(scope='module')
def cloud():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(2, 40, 3)).astype(np.float32))


def test_dynamic_graph_pool_shapes(cloud):
    pool = DynamicGraphPool(feature_size=3, k=4, pool_ratio=0.25, use_pallas=False)
    variables = pool.init(jax.random.PRNGKey(0), cloud)
    out, idx = pool.apply(variables, cloud)
    assert out.shape == (2, 10, 3)
    assert idx.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()
    # selected indices are unique per batch element
    for b in range(2):
        assert len(set(np.asarray(idx)[b].tolist())) == 10


def test_edgeconv_pooling_features(cloud):
    enc = EdgeConvPoolingFeatures(out_size=16, n_features1=8, n_features2=12,
                                  n_features3=16, k=4, pool_ratio=0.5,
                                  use_pallas=False)
    variables = enc.init(jax.random.PRNGKey(0), cloud)
    encoding, per_point, _ = enc.apply(variables, cloud)
    assert encoding.shape == (2, 16)
    assert per_point.shape[0] == 2 and per_point.shape[1] == 10  # 40 -> 20 -> 10


def test_edgeconv_features_with_graph_pooling(cloud):
    enc = EdgeConvFeatures(out_size=16, conv_depth=2, k_neighbors=4,
                           econv_hidden=8, econv_feature=8,
                           graph_pooling=True, pool_ratio=0.5,
                           skip_connections=False, use_pallas=False)
    variables = enc.init(jax.random.PRNGKey(0), cloud)
    encoding, per_point, _ = enc.apply(variables, cloud)
    assert encoding.shape == (2, 16)
    assert per_point.shape[1] == 10  # two 0.5-ratio pools

    with pytest.raises(ValueError):
        bad = EdgeConvFeatures(out_size=16, graph_pooling=True,
                               skip_connections=True, use_pallas=False)
        bad.init(jax.random.PRNGKey(0), cloud)


def test_pointnet_plus_plus(cloud):
    enc = PointNetPlusPlus(out_size=16, econv_hidden=8, econv_feature=8)
    variables = enc.init(jax.random.PRNGKey(0), cloud)
    encoding, per_point, _ = enc.apply(variables, cloud)
    assert encoding.shape == (2, 16)
    assert np.isfinite(np.asarray(encoding)).all()


def test_farthest_point_sampling_spreads():
    # FPS on a line picks the extremes first
    pts = np.zeros((1, 10, 3), dtype=np.float32)
    pts[0, :, 0] = np.arange(10)
    idx = np.asarray(farthest_point_sampling(jnp.asarray(pts), 3))[0]
    assert idx[0] == 0
    assert idx[1] == 9  # farthest from point 0
    assert len(set(idx.tolist())) == 3
