"""Sparsemax and its Fenchel-Young loss, pure JAX (jit/vjp-compatible).

Replaces the third-party `sparsemax.Sparsemax` attention normalization
(reference: nn/nets.py:223-226) and `entmax.SparsemaxLoss` segmentation loss
(nn/metrics/composed_loss.py:196, 323-332) with closed-form implementations
(Martins & Astudillo 2016): the euclidean projection onto the simplex via a
sort, and its convex loss whose gradient is `sparsemax(z) - onehot(y)`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


_SORT_FREE_MAX_CLASSES = 64


def _sparsemax_threshold(z):
    """tau and support size for sparsemax along the last axis.

    For small class counts (the attention head scores <=24 panel slots) the
    sort is replaced by an O(P^2) comparison matrix — elementwise VPU work
    instead of an XLA sort: element i is in the support iff
    k_i * z_i > sum_i - 1 with k_i = |{j: z_j >= z_i}|, sum_i the sum of
    those elements (the sorted-form support test evaluated at i's last tie
    rank; the test is constant within a tie group)."""
    if z.shape[-1] <= _SORT_FREE_MAX_CLASSES:
        ge = (z[..., None, :] >= z[..., :, None]).astype(z.dtype)  # (..., P, P)
        k_i = jnp.sum(ge, axis=-1)
        sum_i = jnp.einsum('...ij,...j->...i', ge, z)
        support = k_i * z > sum_i - 1.0
        k_support = jnp.sum(support.astype(jnp.int32), axis=-1)
        sum_support = jnp.sum(jnp.where(support, z, 0.0), axis=-1, keepdims=True)
        tau = (sum_support - 1.0) / k_support[..., None].astype(z.dtype)
        return tau, k_support

    z_sorted = jnp.sort(z, axis=-1)[..., ::-1]
    k = jnp.arange(1, z.shape[-1] + 1, dtype=z.dtype)
    z_cumsum = jnp.cumsum(z_sorted, axis=-1)
    support = k * z_sorted > (z_cumsum - 1.0)
    k_support = jnp.sum(support.astype(jnp.int32), axis=-1)
    cumsum_at_k = jnp.take_along_axis(z_cumsum, (k_support - 1)[..., None], axis=-1)
    tau = (cumsum_at_k - 1.0) / k_support[..., None].astype(z.dtype)
    return tau, k_support


@jax.custom_vjp
def sparsemax(z):
    """Projection of `z` onto the probability simplex (last axis). Produces
    exact zeros outside the support — unlike softmax."""
    tau, _ = _sparsemax_threshold(z)
    return jnp.maximum(z - tau, 0.0)


def _sparsemax_fwd(z):
    p = sparsemax(z)
    return p, p


def _sparsemax_bwd(p, g):
    # Jacobian: on the support S, dz = g - mean_S(g); zero elsewhere.
    support = (p > 0).astype(g.dtype)
    support_size = jnp.maximum(jnp.sum(support, axis=-1, keepdims=True), 1.0)
    g_mean = jnp.sum(g * support, axis=-1, keepdims=True) / support_size
    return (support * (g - g_mean),)


sparsemax.defvjp(_sparsemax_fwd, _sparsemax_bwd)


def sparsemax_loss(logits, labels):
    """Fenchel-Young sparsemax loss, elementwise over leading axes.

    L(z, y) = 0.5 * sum_{j in S} (z_j^2 - tau^2) + 0.5 - z_y
    with gradient dL/dz = sparsemax(z) - onehot(y). Matches
    `entmax.SparsemaxLoss` up to its reduction.
    """
    tau, _ = _sparsemax_threshold(logits)
    p = jnp.maximum(logits - tau, 0.0)
    support = p > 0
    # sum over support of (z^2 - tau^2)
    reg = 0.5 * jnp.sum(jnp.where(support, logits ** 2 - tau ** 2, 0.0), axis=-1)
    z_y = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return reg + 0.5 - z_y
