"""Geographic "projections" — identity markers for angular I/O.

Semantics per /root/reference/src/projections/latlong.cpp:85-110:
is_latlong=1, kernels are identity, both io sides are radians.
"""

from __future__ import annotations

from ..core.op import IO_RADIANS, Coords, Operation
from . import register


class _LatLongBase(Operation):
    need_ellps = False

    def __init__(self, params, ell):
        super().__init__(params, ell)
        self.is_latlong = True
        self.left = IO_RADIANS
        self.right = IO_RADIANS

    def _fwd(self, coo: Coords) -> None:
        pass

    def _inv(self, coo: Coords) -> None:
        pass


@register
class LatLong(_LatLongBase):
    name = "latlong"


@register
class LongLat(_LatLongBase):
    name = "longlat"


@register
class LatLon(_LatLongBase):
    name = "latlon"


@register
class LonLat(_LatLongBase):
    name = "lonlat"
