"""Fused kNN+gather custom-VJP op: interpret-mode parity vs the jnp oracle
(forward and gradients) and the EdgeConv training path it powers
(reference semantics: nn/net_blocks.py:124-135)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from garment_pattern_estimation_tpu.ops.knn_gather import (
    knn_gather, knn_gather_reference)
from garment_pattern_estimation_tpu.models.blocks import EdgeConv


@pytest.mark.parametrize('n_points,c', [
    (100, 3), (200, 12), (130, 7),   # small-C direct path (exact VPU)
    (120, 24),                       # wide-C truncation-split MXU path
])
def test_forward_matches_oracle(rng, n_points, c):
    x = jnp.asarray(rng.normal(size=(2, n_points, c)).astype(np.float32))
    nbr_ref, idx_ref = knn_gather_reference(x, 5)
    nbr, idx = knn_gather(x, 5, True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(nbr), np.asarray(nbr_ref),
                               rtol=1e-6, atol=1e-6)


def test_single_chunk_mode_matches_oracle(rng):
    """value_chunks=1 (bf16 compute paths): forward values are the top
    truncation chunk, gradients scatter that chunk of the cotangent —
    both within bf16 rounding of the exact oracle, selection identical."""
    x = jnp.asarray(rng.normal(size=(2, 120, 24)).astype(np.float32))
    nbr_ref, idx_ref = knn_gather_reference(x, 5, value_chunks=1)
    nbr, idx = knn_gather(x, 5, True, 1)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(nbr), np.asarray(nbr_ref),
                               rtol=1e-6, atol=1e-6)

    w = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))

    def loss(fn, chunks):
        def f(v):
            nbr, _ = (fn(v, 4, True, chunks) if fn is knn_gather
                      else fn(v, 4, value_chunks=chunks))
            return jnp.sum(jnp.tanh(nbr @ w) ** 2)
        return f

    g = jax.grad(loss(knn_gather, 1))(x)
    g_ref = jax.grad(loss(knn_gather_reference, 1))(x)
    # single-chunk scatter rounds cotangents to bf16: ~2^-8 relative
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-2, atol=2e-2)


def test_self_is_first_neighbor(rng):
    x = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
    _, idx = knn_gather(x, 3, True)
    np.testing.assert_array_equal(np.asarray(idx[0, :, 0]), np.arange(64))


@pytest.mark.parametrize('c', [5, 24])
def test_gradient_matches_oracle_autodiff(rng, c):
    """The Pallas scatter-add backward vs XLA autodiff of the oracle gather.
    Nonlinear readout so the cotangent varies per edge; duplicated-neighbor
    accumulation is exercised (every point is its many neighbors' slot)."""
    x = jnp.asarray(rng.normal(size=(2, 96, c)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))

    def loss_fused(v):
        nbr, _ = knn_gather(v, 4, True)
        return jnp.sum(jnp.tanh(nbr @ w) ** 2)

    def loss_oracle(v):
        nbr, _ = knn_gather_reference(v, 4)
        return jnp.sum(jnp.tanh(nbr @ w) ** 2)

    g_fused = jax.grad(loss_fused)(x)
    g_oracle = jax.grad(loss_oracle)(x)
    # the scatter decomposes cotangents into two bf16-representable chunks
    # (ops/knn.py::split_bf16): residual ~2^-14 of |g| is by design
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_oracle),
                               rtol=1e-4, atol=3e-4)


def test_graph_is_gradient_constant(rng):
    """Gradients flow through gathered values only — matching the unfused
    path's stop_gradient on the kNN graph."""
    x = jnp.asarray(rng.normal(size=(1, 40, 3)).astype(np.float32))

    def loss(v):
        nbr, _ = knn_gather(v, 3, True)
        return jnp.sum(nbr ** 2)

    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    # every point is its own first neighbor: grad includes at least 2*x
    assert float(jnp.sum(g * x)) != 0.0


def _grid_points(shape, seed):
    """Unique integer-grid clouds: squared distances are small integers,
    exactly representable in the packed 21-bit encoding — neighbor selection
    is provably identical between the quantized kernel and exact top-k (ties
    break to the lower index in both). Points are unique per cloud: the
    kernels route an exact duplicate's slot-0 gradient to the query row
    (self-inclusive kNN shortcut) while the unfused scatter routes it to
    the duplicate."""
    b, n, c = shape
    r = np.random.default_rng(seed)
    side = 41
    assert side ** c >= n
    flat = np.stack([r.choice(side ** c, size=n, replace=False)
                     for _ in range(b)])               # unique lattice sites
    coords = []
    for _ in range(c):
        coords.append(flat % side - side // 2)
        flat //= side
    return jnp.asarray(np.stack(coords, axis=-1).astype(np.float32))


def test_edgeconv_train_path_matches_unfused():
    """Module-level training equivalence: forward, updated batch statistics,
    and parameter/input gradients of the fused kNN+gather path equal the
    unfused gather path."""
    x = _grid_points((2, 150, 3), seed=3)
    fused = EdgeConv([24, 24, 16], k=5, use_pallas=True)
    plain = EdgeConv([24, 24, 16], k=5, use_pallas=False)
    variables = plain.init({'params': jax.random.PRNGKey(0)}, x, train=True)

    def run(module, p, xx):
        out, mut = module.apply(
            {'params': p, 'batch_stats': variables['batch_stats']},
            xx, train=True, mutable=['batch_stats'])
        return out, mut['batch_stats']

    out_p, stats_p = run(plain, variables['params'], x)
    out_f, stats_f = run(fused, variables['params'], x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-4, atol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        stats_f, stats_p)

    def loss(module, p, xx):
        out, _ = module.apply(
            {'params': p, 'batch_stats': variables['batch_stats']},
            xx, train=True, mutable=['batch_stats'])
        return jnp.sum(out ** 2)

    gp_p, gx_p = jax.grad(lambda p, xx: loss(plain, p, xx),
                          argnums=(0, 1))(variables['params'], x)
    gp_f, gx_f = jax.grad(lambda p, xx: loss(fused, p, xx),
                          argnums=(0, 1))(variables['params'], x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4),
        gp_f, gp_p)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_p),
                               rtol=5e-4, atol=5e-4)


def test_mean_aggregation_uses_fused_path():
    """aggr='mean' has no fused-inference kernel; the kNN+gather path still
    applies and must match the unfused module."""
    x = _grid_points((2, 100, 3), seed=5)
    fused = EdgeConv([16, 8], k=4, aggr='mean', use_pallas=True)
    plain = EdgeConv([16, 8], k=4, aggr='mean', use_pallas=False)
    variables = plain.init({'params': jax.random.PRNGKey(0)}, x, train=True)
    out_f, _ = fused.apply(variables, x, train=True, mutable=['batch_stats'])
    out_p, _ = plain.apply(variables, x, train=True, mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-4, atol=2e-5)

def test_bf16_input_gradient_dtype(rng):
    """compute_dtype paths feed bf16 activations into knn_gather: the VJP
    must hand back a bf16 cotangent (the scatter-add itself accumulates in
    f32). Regression for the f32/bf16 cotangent-mismatch crash."""
    x = jnp.asarray(rng.normal(size=(1, 48, 8)).astype(np.float32))

    def loss(v):
        nbr, _ = knn_gather(v.astype(jnp.bfloat16), 3, True)
        return jnp.sum(nbr.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(x)
    assert g.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(g)))
    g_ref = jax.grad(
        lambda v: jnp.sum(knn_gather_reference(
            v.astype(jnp.bfloat16), 3)[0].astype(jnp.float32) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-2, atol=2e-2)


def test_edgeconv_bf16_grads_track_f32():
    """Mixed-precision training mode (compute_dtype='bfloat16'): parameter
    gradients must stay finite, f32 (params are f32), and directionally
    aligned with the full-precision gradients."""
    x = _grid_points((2, 120, 3), seed=7)
    kw = dict(k=5, use_pallas=True)
    f32 = EdgeConv([24, 24, 16], **kw)
    b16 = EdgeConv([24, 24, 16], compute_dtype='bfloat16', **kw)
    variables = f32.init({'params': jax.random.PRNGKey(0)}, x, train=True)

    def loss(module, p):
        out, _ = module.apply(
            {'params': p, 'batch_stats': variables['batch_stats']},
            x, train=True, mutable=['batch_stats'])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g32 = jax.grad(lambda p: loss(f32, p))(variables['params'])
    g16 = jax.grad(lambda p: loss(b16, p))(variables['params'])
    flat32 = jnp.concatenate([v.ravel() for v in jax.tree_util.tree_leaves(g32)])
    flat16 = jnp.concatenate([v.ravel() for v in jax.tree_util.tree_leaves(g16)])
    assert flat16.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(flat16)))
    cos = float(jnp.vdot(flat32, flat16)
                / (jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16)))
    assert cos > 0.99, cos
