"""Geographic offset (affine.cpp:227-249): constant per-axis offsets
in arc-seconds (lon/lat) and meters (h)."""

from __future__ import annotations

from ..core.constants import DEG_TO_RAD
from ..core.op import IO_RADIANS, Coords, Operation
from . import register

ARCSEC_TO_RAD = DEG_TO_RAD / 3600.0


@register
class GeogOffset(Operation):
    name = "geogoffset"
    need_ellps = False

    def setup(self) -> None:
        self.left = IO_RADIANS
        self.right = IO_RADIANS
        self.dlon = self.params.float_("dlon", 0.0) * ARCSEC_TO_RAD
        self.dlat = self.params.float_("dlat", 0.0) * ARCSEC_TO_RAD
        self.dh = self.params.float_("dh", 0.0)

    def _fwd(self, coo: Coords) -> None:
        coo.x = coo.x + self.dlon
        coo.y = coo.y + self.dlat
        coo.z = coo.z + self.dh

    def _inv(self, coo: Coords) -> None:
        coo.x = coo.x - self.dlon
        coo.y = coo.y - self.dlat
        coo.z = coo.z - self.dh
