"""Fused EdgeConv kernel: interpret-mode parity vs the jnp oracle and vs the
unfused module path (reference semantics: nn/net_blocks.py:124-135)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from garment_pattern_estimation_tpu.ops.edgeconv import (
    fold_mlp_bn, fused_edgeconv, fused_edgeconv_reference)
from garment_pattern_estimation_tpu.models.blocks import EdgeConv


def _tiefree_points(rng, shape):
    """Integer-lattice clouds whose squared distances are integers below
    2^14: exactly representable not just in f32 but in the packed top-k's
    21-bit (sign+exp+13-mantissa-bit) distance encoding, so the fused
    kernel, the jnp oracle, and exact top-k select identical neighbors
    deterministically (distinct distances never alias to one quantization
    bucket; genuine ties break to the lower index in every path). Exact
    duplicate points are fine: their gathered values are identical."""
    return jnp.asarray(rng.integers(-30, 31, size=shape).astype(np.float32))


def _synthetic_mlp(rng, sizes):
    """Flax-layout MLP params/stats (Dense_i / BatchNorm_i) with non-trivial
    BN statistics so the folding is actually exercised."""
    params, stats = {}, {}
    for i, (si, so) in enumerate(sizes):
        params[f'Dense_{i}'] = {
            'kernel': jnp.asarray(rng.normal(size=(si, so)).astype(np.float32) * 0.3),
            'bias': jnp.asarray(rng.normal(size=(so,)).astype(np.float32) * 0.1)}
        params[f'BatchNorm_{i}'] = {
            'scale': jnp.asarray(rng.uniform(0.5, 1.5, so).astype(np.float32)),
            'bias': jnp.asarray(rng.normal(size=(so,)).astype(np.float32) * 0.1)}
        stats[f'BatchNorm_{i}'] = {
            'mean': jnp.asarray(rng.normal(size=(so,)).astype(np.float32) * 0.1),
            'var': jnp.asarray(rng.uniform(0.5, 2.0, so).astype(np.float32))}
    return params, stats


def test_fold_mlp_bn_matches_plain_stack(rng):
    sizes = [(12, 24), (24, 24), (24, 16)]
    params, stats = _synthetic_mlp(rng, sizes)
    layers, (a, d) = fold_mlp_bn(params, stats)

    h = jnp.asarray(rng.normal(size=(7, 12)).astype(np.float32))
    folded = h
    for w, b in layers:
        folded = jnp.maximum(folded @ w + b, 0)
    folded = folded * a + d

    plain = h
    for i in range(3):
        z = plain @ params[f'Dense_{i}']['kernel'] + params[f'Dense_{i}']['bias']
        r = jnp.maximum(z, 0)
        bn, st = params[f'BatchNorm_{i}'], stats[f'BatchNorm_{i}']
        plain = (r - st['mean']) / jnp.sqrt(st['var'] + 1e-5) * bn['scale'] + bn['bias']

    np.testing.assert_allclose(np.asarray(folded), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('n_points,C', [
    (100, 6),    # small-C direct path (exact VPU distances + gathers)
    (200, 6),
    (100, 24),   # wide-C path (bf16 truncation-split MXU distances/gathers)
])
def test_fused_kernel_matches_oracle_interpret(rng, n_points, C):
    """Kernel vs jnp oracle: both run the same packed selection on bitwise
    -equal split-product distances, so full-mantissa random clouds are safe
    here (and fully exercise the hi/lo value chunks)."""
    params, stats = _synthetic_mlp(rng, [(2 * C, 24), (24, 24), (24, 16)])
    folded = fold_mlp_bn(params, stats)
    x = jnp.asarray(rng.normal(size=(2, n_points, C)).astype(np.float32))

    ref = fused_edgeconv_reference(x, folded, k=5)
    out = fused_edgeconv(x, folded, k=5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_module_path_matches_unfused(rng):
    """Module-level: eval forward through the fused kernel (interpret mode on
    CPU) vs the unfused gather+MLP path; bf16 gather/MLP tolerance."""
    x = _tiefree_points(rng, (2, 150, 3))
    fused = EdgeConv([24, 24, 16], k=5, use_pallas=True)
    plain = EdgeConv([24, 24, 16], k=5, use_pallas=False)
    variables = plain.init({'params': jax.random.PRNGKey(0)}, x, train=False)

    out_plain = plain.apply(variables, x, train=False)
    out_fused = fused.apply(variables, x, train=False)
    assert out_fused.shape == out_plain.shape
    scale = float(jnp.max(jnp.abs(out_plain)))
    assert float(jnp.max(jnp.abs(out_plain - out_fused))) < 0.02 * scale

    # training path must stay on the unfused (BN-stat-updating) route
    out_train, mutated = plain.apply(variables, x, train=True,
                                     mutable=['batch_stats'])
    assert 'batch_stats' in mutated



@pytest.mark.parametrize('n_points,C,tile_n', [
    (200, 6, 64),    # small-C column-tiled kernel: multi-tile merge + gathers
    (200, 24, 64),   # wide-C tiled kernel: value-carrying quantized merges
])
def test_fused_tiled_kernels_match_oracle(rng, n_points, C, tile_n):
    """The column-tiled kernels (stress-config path, N past the single-tile
    bound) forced onto small clouds via a tiny tile width: selection is
    globally equivalent to the oracle's lexicographic (quantized distance,
    index) top-(k-1), and gathered values ride through the merges."""
    params, stats = _synthetic_mlp(rng, [(2 * C, 24), (24, 24), (24, 16)])
    folded = fold_mlp_bn(params, stats)
    x = jnp.asarray(rng.normal(size=(2, n_points, C)).astype(np.float32))

    ref = fused_edgeconv_reference(x, folded, k=5)
    out_tiled = fused_edgeconv(x, folded, k=5, interpret=True, tile_n=tile_n)
    np.testing.assert_allclose(np.asarray(out_tiled), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and against the single-tile kernel on the same data
    out_single = fused_edgeconv(x, folded, k=5, interpret=True)
    np.testing.assert_allclose(np.asarray(out_tiled), np.asarray(out_single),
                               rtol=1e-5, atol=1e-5)
