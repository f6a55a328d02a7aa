"""Affine transformation + geographic offset.

Semantics per /root/reference/src/transformations/affine.cpp: 3×3
matrix + offsets on xyz, t scale/offset; inverse via explicit 3×3
matrix inversion; geogoffset applies arc-second lon/lat offsets.
"""

from __future__ import annotations

import numpy as np

from ..core.constants import DEG_TO_RAD
from ..core.op import IO_RADIANS, IO_WHATEVER, Coords, Operation
from . import register

ARCSEC_TO_RAD = DEG_TO_RAD / 3600.0


@register
class Affine(Operation):
    name = "affine"
    need_ellps = False

    def setup(self) -> None:
        p = self.params
        self.left = IO_WHATEVER
        self.right = IO_WHATEVER
        self.xoff = p.float_("xoff", 0.0)
        self.yoff = p.float_("yoff", 0.0)
        self.zoff = p.float_("zoff", 0.0)
        self.toff = p.float_("toff", 0.0)
        S = np.eye(3)
        for (i, j) in [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3)]:
            key = f"s{i}{j}"
            if p.has(key):
                S[i - 1, j - 1] = p.float_(key)
        self.S = S
        self.tscale = p.float_("tscale", 1.0) if p.has("tscale") else 1.0
        det = np.linalg.det(S)
        self.invertible = det != 0.0 and self.tscale != 0.0
        if self.invertible:
            self.Sinv = np.linalg.inv(S)
            self.rtscale = 1.0 / self.tscale

    @property
    def has_inverse(self) -> bool:
        return self.invertible

    def _fwd(self, coo: Coords) -> None:
        x, y, z = coo.x, coo.y, coo.z
        S = self.S
        coo.x = self.xoff + S[0, 0] * x + S[0, 1] * y + S[0, 2] * z
        coo.y = self.yoff + S[1, 0] * x + S[1, 1] * y + S[1, 2] * z
        coo.z = self.zoff + S[2, 0] * x + S[2, 1] * y + S[2, 2] * z
        coo.t = self.toff + self.tscale * coo.t

    def _inv(self, coo: Coords) -> None:
        if not self.invertible:
            # the reference nullifies the inverse pointers at setup
            # (affine.cpp:155-161) so inverse transforms error per
            # point rather than failing construction
            import numpy as _np

            from ..core.errors import ERR_INVALID_SCALE

            coo.set_err(_np.ones(len(coo), dtype=bool), ERR_INVALID_SCALE)
            return
        x = coo.x - self.xoff
        y = coo.y - self.yoff
        z = coo.z - self.zoff
        S = self.Sinv
        coo.x = S[0, 0] * x + S[0, 1] * y + S[0, 2] * z
        coo.y = S[1, 0] * x + S[1, 1] * y + S[1, 2] * z
        coo.z = S[2, 0] * x + S[2, 1] * y + S[2, 2] * z
        coo.t = self.rtscale * (coo.t - self.toff)
