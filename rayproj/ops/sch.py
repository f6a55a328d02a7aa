"""SCH (Spherical Cross-track Height) — JPL radar-mapping sensor
coordinate system.

Semantics per /root/reference/src/projections/sch.cpp:41-223 (Hensley
2000; Buckley 2000): an ellipsoid→geocentric conversion, a translation
to a peg-point-centred frame, a heading-aligned rotation, then
geodetic coordinates on a local sphere whose radius is the curvature
of the ellipsoid along the peg heading; s/c outputs are arc lengths on
that sphere (returned /a so the classic ``finalize`` ×a restores
metres), h is height above the local sphere.
"""

from __future__ import annotations

import numpy as np

from ..core.ellps import Ellipsoid
from ..core.errors import ERR_FAILED_TO_FIND_PROJ, ProjError
from ..core.op import Coords, Operation
from . import register
from .cart import Cart


class _EllProxy:
    """Minimal stand-in so Cart kernels (which read only self.ell) can
    run against the peg-local sphere."""

    __slots__ = ("ell",)

    def __init__(self, ell):
        self.ell = ell


@register
class Sch(Operation):
    name = "sch"
    need_ellps = True

    def setup(self) -> None:
        p = self.params
        for key in ("plat_0", "plon_0", "phdg_0"):
            if not p.has(key):
                raise ProjError(ERR_FAILED_TO_FIND_PROJ, f"sch: +{key}= required")
        self.plat = p.rad("plat_0")
        self.plon = p.rad("plon_0")
        self.phdg = p.rad("phdg_0")
        self.h0 = p.float_("h_0", 0.0)

        a, es = self.ell.a, self.ell.es
        clt, slt = np.cos(self.plat), np.sin(self.plat)
        clo, slo = np.cos(self.plon), np.sin(self.plon)
        chdg, shdg = np.cos(self.phdg), np.sin(self.phdg)
        # radius of curvature along the peg heading (sch.cpp:144-152)
        temp = np.sqrt(1.0 - es * slt * slt)
        reast = a / temp
        rnorth = a * (1.0 - es) / temp ** 3
        self.rcurv = self.h0 + (reast * rnorth) / (
            reast * chdg * chdg + rnorth * shdg * shdg
        )
        self._sph = _EllProxy(Ellipsoid(a=float(self.rcurv), es=0.0).derive())
        self._cart = _EllProxy(self.ell)
        # ECEF→peg rotation, row-major (sch.cpp:160-169)
        self.M = np.array(
            [
                [clt * clo, -shdg * slo - slt * clo * chdg, slo * chdg - slt * clo * shdg],
                [clt * slo, clo * shdg - slt * slo * chdg, -clo * chdg - slt * slo * shdg],
                [slt, clt * chdg, clt * shdg],
            ]
        )
        # peg-point offset (sch.cpp:171-178)
        peg = Coords(np.array([self.plon]), np.array([self.plat]), np.array([self.h0]))
        Cart._fwd(self._cart, peg)
        self.xyzoff = np.array(
            [
                peg.x[0] - self.rcurv * clt * clo,
                peg.y[0] - self.rcurv * clt * slo,
                peg.z[0] - self.rcurv * slt,
            ]
        )

    def _fwd(self, coo: Coords) -> None:
        # geodetic → ECEF → peg frame → local sphere geodetic (sch.cpp:82-109)
        Cart._fwd(self._cart, coo)
        x = coo.x - self.xyzoff[0]
        y = coo.y - self.xyzoff[1]
        z = coo.z - self.xyzoff[2]
        M = self.M
        coo.x = M[0, 0] * x + M[1, 0] * y + M[2, 0] * z
        coo.y = M[0, 1] * x + M[1, 1] * y + M[2, 1] * z
        coo.z = M[0, 2] * x + M[1, 2] * y + M[2, 2] * z
        Cart._inv(self._sph, coo)
        scale = self.rcurv / self.ell.a
        coo.x = coo.x * scale
        coo.y = coo.y * scale

    def _inv(self, coo: Coords) -> None:
        # local sphere geodetic → peg frame → ECEF → geodetic (sch.cpp:57-80)
        scale = self.ell.a / self.rcurv
        coo.x = coo.x * scale
        coo.y = coo.y * scale
        Cart._fwd(self._sph, coo)
        x, y, z = coo.x, coo.y, coo.z
        M = self.M
        coo.x = M[0, 0] * x + M[0, 1] * y + M[0, 2] * z + self.xyzoff[0]
        coo.y = M[1, 0] * x + M[1, 1] * y + M[1, 2] * z + self.xyzoff[1]
        coo.z = M[2, 0] * x + M[2, 1] * y + M[2, 2] * z + self.xyzoff[2]
        Cart._inv(self._cart, coo)
