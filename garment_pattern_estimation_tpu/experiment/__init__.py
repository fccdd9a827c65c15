"""Experiment tracking, checkpointing, reference-checkpoint import."""

from .tracker import ExperimentWrappper, ExperimentWrapper
from .checkpoint import save_checkpoint_file, load_checkpoint_file
from .torch_import import (
    import_stitch_model, import_shape_model, load_checkpoint_any,
)

__all__ = [
    'ExperimentWrappper', 'ExperimentWrapper',
    'save_checkpoint_file', 'load_checkpoint_file',
    'import_stitch_model', 'import_shape_model', 'load_checkpoint_any',
]
