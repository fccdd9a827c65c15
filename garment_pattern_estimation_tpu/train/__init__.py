"""Training runtime: trainer, evaluation utilities."""

from .trainer import Trainer
from .eval_utils import eval_metrics, make_predict_fn

__all__ = ['Trainer', 'eval_metrics', 'make_predict_fn']
