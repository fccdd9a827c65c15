"""Ring kNN / points-sharded EdgeConv over a virtual multi-device mesh:
global-parity vs single-device oracles (reference scope: the N=2000 bound
of nn/net_blocks.py:127-135 — this is the TPU-native long-context analog,
SURVEY §5.7)."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from garment_pattern_estimation_tpu.parallel.ring import (
    POINTS_AXIS, make_points_mesh, ring_knn_gather, sharded_encoder_step)
from garment_pattern_estimation_tpu.ops.knn_gather import knn_gather_reference
from garment_pattern_estimation_tpu.models.blocks import EdgeConv


def _mesh_or_skip(n):
    if len(jax.devices()) < n:
        pytest.skip(f'needs {n} devices (conftest forces an 8-device CPU mesh)')
    return make_points_mesh(n)


@pytest.mark.parametrize('b,n,c,k', [(2, 64, 3, 5), (1, 128, 7, 4)])
def test_ring_knn_gather_matches_global_oracle(rng, b, n, c, k):
    """8-way points-sharded ring kNN+gather == the single-device quantized
    oracle on the full cloud (same 21-bit ranking class, slot-0 self)."""
    mesh = _mesh_or_skip(8)
    n_shards = mesh.shape[POINTS_AXIS]
    x = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))

    nbr_ref, idx_ref = knn_gather_reference(x, k)   # (B, k, N, C), (B, N, k)
    nbr_ref = jnp.moveaxis(nbr_ref, 1, 2)           # (B, N, k, C)

    run = jax.jit(jax.shard_map(
        functools.partial(ring_knn_gather, k=k, axis_size=n_shards),
        mesh=mesh, in_specs=P(None, POINTS_AXIS, None),
        out_specs=(P(None, POINTS_AXIS, None, None), P(None, POINTS_AXIS, None))))
    nbr, idx = run(x)

    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(nbr), np.asarray(nbr_ref),
                               rtol=1e-6, atol=1e-6)


def test_ring_knn_self_slot(rng):
    mesh = _mesh_or_skip(8)
    x = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
    run = jax.jit(jax.shard_map(
        functools.partial(ring_knn_gather, k=3, axis_size=8),
        mesh=mesh, in_specs=P(None, POINTS_AXIS, None),
        out_specs=(P(None, POINTS_AXIS, None, None), P(None, POINTS_AXIS, None))))
    nbr, idx = run(x)
    np.testing.assert_array_equal(np.asarray(idx[0, :, 0]), np.arange(64))
    np.testing.assert_allclose(np.asarray(nbr[0, :, 0]), np.asarray(x[0]),
                               rtol=0, atol=0)


def test_sharded_encoder_matches_unsharded_edgeconv(rng):
    """A 2-layer points-sharded dynamic EdgeConv stack (ring kNN per layer,
    psum-reduced global mean pool) == the unsharded EdgeConv modules run on
    the full cloud. 4 shards: the 2-layer x P-step ring unrolls at trace
    time and dominates this test's (CPU) compile cost."""
    if len(jax.devices()) < 4:
        pytest.skip('needs 4 devices')
    mesh = make_points_mesh(4)
    x = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    k = 4

    layer0 = EdgeConv([16, 12], k=k, use_pallas=False)
    v0 = layer0.init({'params': jax.random.PRNGKey(0)}, x, train=False)
    h0 = layer0.apply(v0, x, train=False)
    layer1 = EdgeConv([16, 8], k=k, use_pallas=False)
    v1 = layer1.init({'params': jax.random.PRNGKey(1)}, h0, train=False)
    h1 = layer1.apply(v1, h0, train=False)
    pooled_ref = jnp.mean(h1, axis=1)

    # bind just the inner MLPs of the two EdgeConv modules
    from garment_pattern_estimation_tpu.models.blocks import MLP
    mlp0 = MLP([16, 12], name=None)
    mlp1 = MLP([16, 8], name=None)

    def apply0(edge):
        return mlp0.apply(
            {'params': v0['params']['MLP_0'],
             'batch_stats': v0['batch_stats']['MLP_0']}, edge, train=False)

    def apply1(edge):
        return mlp1.apply(
            {'params': v1['params']['MLP_0'],
             'batch_stats': v1['batch_stats']['MLP_0']}, edge, train=False)

    h_sharded, pooled = sharded_encoder_step(mesh, [apply0, apply1], x, k)
    np.testing.assert_allclose(np.asarray(h_sharded), np.asarray(h1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled_ref),
                               rtol=2e-4, atol=2e-4)


def test_ring_on_2d_data_points_mesh(rng):
    """DP x SP composition: a (data=2, points=2) mesh shards both the batch
    and the point axis; each data slice runs its own ring. Output equals
    the unsharded computation. (Small mesh on purpose: the ring unrolls at
    trace time and CPU compile dominates; the 8-shard case is covered by
    test_ring_knn_gather_matches_global_oracle.)"""
    if len(jax.devices()) < 4:
        pytest.skip('needs 4 devices')
    from jax.sharding import Mesh
    devices = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devices, ('data', POINTS_AXIS))
    x = jnp.asarray(rng.normal(size=(4, 32, 3)).astype(np.float32))
    k = 3

    layer = EdgeConv([12, 8], k=k, use_pallas=False)
    v = layer.init({'params': jax.random.PRNGKey(0)}, x, train=False)
    h_ref = layer.apply(v, x, train=False)
    pooled_ref = jnp.mean(h_ref, axis=1)

    from garment_pattern_estimation_tpu.models.blocks import MLP
    mlp = MLP([12, 8])

    def apply0(edge):
        return mlp.apply(
            {'params': v['params']['MLP_0'],
             'batch_stats': v['batch_stats']['MLP_0']}, edge, train=False)

    h, pooled = sharded_encoder_step(mesh, [apply0], x, k, data_axis='data')
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled_ref),
                               rtol=2e-4, atol=2e-4)
