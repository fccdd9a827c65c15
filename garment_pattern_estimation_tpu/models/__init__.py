"""Model families + building blocks + registry."""

from .registry import build_model, GarmentModel
from .nets import (
    GarmentFullPattern3DModule,
    GarmentSegmentPattern3DModule,
    StitchOnEdge3DPairsModule,
)
from . import blocks

__all__ = [
    'build_model', 'GarmentModel', 'blocks',
    'GarmentFullPattern3DModule', 'GarmentSegmentPattern3DModule',
    'StitchOnEdge3DPairsModule',
]
