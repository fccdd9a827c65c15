"""Composed losses + quality metrics (jit-compatible)."""

from .composed import ComposedPatternLoss, ComposedLoss
from .stitches import tags_to_stitches_np, tags_to_stitches_jit, stitch_precision_recall
from . import components

__all__ = [
    'ComposedPatternLoss', 'ComposedLoss',
    'tags_to_stitches_np', 'tags_to_stitches_jit', 'stitch_precision_recall',
    'components',
]
