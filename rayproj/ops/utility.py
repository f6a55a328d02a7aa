"""Utility operations: noop, set, geoc latitude conversion.

Per /root/reference/src/conversions/{noop,set,geoc}.cpp.
"""

from __future__ import annotations

import numpy as np

from ..core.constants import M_HALFPI
from ..core.op import FWD, INV, IO_RADIANS, IO_WHATEVER, Coords, Operation
from . import register


@register
class Noop(Operation):
    name = "noop"
    need_ellps = False

    def setup(self) -> None:
        self.left = IO_WHATEVER
        self.right = IO_WHATEVER

    def _fwd(self, coo: Coords) -> None:
        pass

    def _inv(self, coo: Coords) -> None:
        pass


@register
class SetOp(Operation):
    """Force-set coordinate components (+v_1=… +v_4=…)."""

    name = "set"
    need_ellps = False

    def setup(self) -> None:
        self.vals = []
        for i in (1, 2, 3, 4):
            key = f"v_{i}"
            self.vals.append(self.params.float_(key) if self.params.has(key) else None)
        self.left = IO_WHATEVER
        self.right = IO_WHATEVER

    def _apply(self, coo: Coords) -> None:
        lanes = [coo.x, coo.y, coo.z, coo.t]
        for i, v in enumerate(self.vals):
            if v is not None:
                lanes[i] = np.full_like(lanes[i], v)
        coo.x, coo.y, coo.z, coo.t = lanes

    def _fwd(self, coo: Coords) -> None:
        self._apply(coo)

    def _inv(self, coo: Coords) -> None:
        self._apply(coo)


@register
class Geoc(Operation):
    """Geographic ↔ geocentric latitude (geoc.cpp; formula per
    pj_geocentric_latitude, 4D_api.cpp:558-583)."""

    name = "geoc"
    need_ellps = True

    def setup(self) -> None:
        self.left = IO_RADIANS
        self.right = IO_RADIANS

    def _convert(self, coo: Coords, direction: int) -> None:
        if self.ell.es == 0:
            return
        limit = M_HALFPI - 1e-9
        inside = (coo.y <= limit) & (coo.y >= -limit)
        factor = self.ell.one_es if direction == FWD else self.ell.rone_es
        coo.y = np.where(inside, np.arctan(factor * np.tan(coo.y)), coo.y)

    def _fwd(self, coo: Coords) -> None:
        self._convert(coo, FWD)

    def _inv(self, coo: Coords) -> None:
        self._convert(coo, INV)
