"""Kernel-level parity: Pallas kNN vs XLA oracle vs numpy; sparsemax; pools."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from garment_pattern_estimation_tpu.ops import (
    knn_xla, knn_pallas, pairwise_sq_dists, sparsemax, sparsemax_loss,
    masked_max_pool, masked_mean_pool, masked_add_pool, gather_neighbors,
)


def _knn_numpy(points, k):
    """Brute-force oracle (ties -> lower index, self included)."""
    B, N, _ = points.shape
    out = np.empty((B, N, k), dtype=np.int32)
    for b in range(B):
        d = ((points[b][:, None, :] - points[b][None, :, :]) ** 2).sum(-1)
        out[b] = np.argsort(d, axis=1, kind='stable')[:, :k]
    return out


def test_pairwise_dists():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 17, 3)).astype(np.float32)
    d = np.asarray(pairwise_sq_dists(jnp.asarray(x), jnp.asarray(x)))
    ref = ((x[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize('shape', [(2, 100, 3), (1, 300, 8)])
def test_knn_xla_matches_numpy(shape):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=shape).astype(np.float32)
    idx = np.asarray(knn_xla(jnp.asarray(pts), 5, query_chunk=64))
    ref = _knn_numpy(pts, 5)
    # compare by distance (ties can reorder equal-distance neighbors)
    for b in range(shape[0]):
        d = ((pts[b][:, None, :] - pts[b][None, :, :]) ** 2).sum(-1)
        got = np.sort(np.take_along_axis(d, idx[b], axis=1), axis=1)
        want = np.sort(np.take_along_axis(d, ref[b], axis=1), axis=1)
        np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-2)
    # self is always among the neighbors
    assert (idx == np.arange(shape[1])[None, :, None]).any(axis=-1).all()


@pytest.mark.parametrize('shape', [
    (1, 64, 3),    # small-D direct path, single column tile
    (1, 200, 3),   # small-D direct path, multi-tile merge
    (1, 200, 20),  # matmul path (D > direct threshold), multi-tile merge
])
def test_knn_pallas_interpret_matches_xla(shape):
    rng = np.random.default_rng(2)
    pts = rng.normal(size=shape).astype(np.float32)  # tiny: interpret mode is slow on CPU
    idx_ref = np.asarray(knn_xla(jnp.asarray(pts), 5))
    idx_pl = np.asarray(knn_pallas(jnp.asarray(pts), 5, tile_m=16, tile_n=64,
                                   interpret=True))
    for b in range(1):
        d = ((pts[b][:, None, :] - pts[b][None, :, :]) ** 2).sum(-1)
        got = np.sort(np.take_along_axis(d, idx_pl[b], axis=1), axis=1)
        want = np.sort(np.take_along_axis(d, idx_ref[b], axis=1), axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sparsemax_simplex_and_sparsity():
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=(40, 23)).astype(np.float32) * 3)
    p = np.asarray(sparsemax(z))
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
    assert (p >= 0).all()
    assert (p == 0).any()  # produces exact zeros
    # matches softmax-free projection oracle
    for row, zrow in zip(p, np.asarray(z)):
        zs = np.sort(zrow)[::-1]
        cssv = np.cumsum(zs) - 1
        ks = np.arange(1, len(zs) + 1)
        cond = zs - cssv / ks > 0
        tau = cssv[cond][-1] / ks[cond][-1]
        np.testing.assert_allclose(row, np.maximum(zrow - tau, 0), atol=1e-5)


def test_sparsemax_grad_matches_loss_identity():
    """d sparsemax_loss / d z == sparsemax(z) - onehot(y)."""
    rng = np.random.default_rng(4)
    z = jnp.asarray(rng.normal(size=(8, 10)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=(8,)))
    grad = jax.grad(lambda logits: sparsemax_loss(logits, y).sum())(z)
    expected = sparsemax(z) - jax.nn.one_hot(y, 10)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(expected), atol=1e-5)
    assert (np.asarray(sparsemax_loss(z, y)) >= -1e-6).all()


def test_sparsemax_vjp_support_rule():
    z = jnp.array([[2.0, 1.9, -3.0, -5.0]])
    p, vjp = jax.vjp(sparsemax, z)
    g = jnp.array([[1.0, 0.0, 7.0, 7.0]])  # grads off-support must not leak
    (dz,) = vjp(g)
    # support = first two entries; dz = g - mean(g_support) on support
    np.testing.assert_allclose(np.asarray(dz), [[0.5, -0.5, 0.0, 0.0]], atol=1e-6)


def test_pools_and_gather():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 6, 4)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], dtype=bool)
    np.testing.assert_allclose(
        np.asarray(masked_max_pool(x, mask))[0], np.asarray(x)[0, :3].max(0), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(masked_mean_pool(x, mask))[0], np.asarray(x)[0, :3].mean(0), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(masked_add_pool(x, mask))[1], np.asarray(x)[1].sum(0), atol=1e-5)

    idx = jnp.asarray(rng.integers(0, 6, size=(2, 6, 3)))
    gathered = np.asarray(gather_neighbors(x, idx))
    for b in range(2):
        for n in range(6):
            for j in range(3):
                np.testing.assert_array_equal(
                    gathered[b, n, j], np.asarray(x)[b, np.asarray(idx)[b, n, j]])


def test_split_dots_pin_default_precision():
    """An ambient `default_matmul_precision('highest')` (parity_check wraps
    its whole run in one) must not retarget the split-product dots: their
    operands are bf16-representable by construction, and Mosaic rejects an
    fp32-precision contraction on bf16 operands outright. Inspect the jaxprs
    and assert every dot stays pinned at DEFAULT."""
    from garment_pattern_estimation_tpu.ops.knn import (
        split_bf16, cross_from_splits, gather_from_splits,
        batched_cross_from_splits)

    def dots(fn, *xs):
        jaxpr = jax.make_jaxpr(fn)(*xs)
        return [e.params['precision'] for e in jaxpr.jaxpr.eqns
                if e.primitive.name == 'dot_general']

    q = jnp.ones((8, 4), jnp.float32)
    hit = jnp.ones((8, 8), jnp.bfloat16)
    batched = jnp.ones((2, 8, 4), jnp.float32)
    with jax.default_matmul_precision('highest'):
        seen = (
            dots(lambda a: cross_from_splits(split_bf16(a), split_bf16(a)), q)
            + dots(lambda h, a: gather_from_splits(h, split_bf16(a)), hit, q)
            + dots(batched_cross_from_splits, [batched, batched]))
    assert seen, 'expected dot_general equations in the split helpers'
    default = (jax.lax.Precision.DEFAULT, jax.lax.Precision.DEFAULT)
    assert all(p == default for p in seen), seen
