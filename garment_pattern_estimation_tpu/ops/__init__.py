"""TPU compute kernels: kNN, pooling, sparsemax, EdgeConv primitives."""

from .knn import knn, knn_xla, knn_pallas, pairwise_sq_dists
from .pooling import (
    masked_max_pool, masked_mean_pool, masked_add_pool, GLOBAL_POOLS,
    gather_neighbors,
)
from .sparsemax import sparsemax, sparsemax_loss

__all__ = [
    'knn', 'knn_xla', 'knn_pallas', 'pairwise_sq_dists',
    'masked_max_pool', 'masked_mean_pool', 'masked_add_pool', 'GLOBAL_POOLS',
    'gather_neighbors', 'sparsemax', 'sparsemax_loss',
]
