"""rayproj — Ray-Data-native geospatial reprojection & spatial-join engine.

A from-scratch re-derivation of PROJ's transform capabilities
(reference surveyed in SURVEY.md) as vectorized NumPy kernels designed
to run inside ray.data.Dataset.map_batches over zero-copy Arrow batches.
"""

from .core.altops import AltOperation, RoutedOperation
from .core.factory import create_operation
from .core.op import FWD, INV, Coords, Operation

__all__ = [
    "create_operation", "Coords", "Operation", "FWD", "INV",
    "AltOperation", "RoutedOperation",
]
__version__ = "0.1.0"
