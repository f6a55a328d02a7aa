"""Cylindrical projections: cea, eqc, mill.

Math re-derived from /root/reference/src/projections/{cea,eqc,mill}.cpp.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import M_FORTPI, M_HALFPI
from ..core.errors import ERR_LAT_TS_LARGER_THAN_90, ERR_TOLERANCE_CONDITION, ProjError
from ..core.op import Coords, Operation
from ..mathx import authlat, authset, qsfn
from . import register

EPS = 1e-10


@register
class Cea(Operation):
    """Equal Area Cylindrical (cea.cpp)."""

    name = "cea"

    def setup(self) -> None:
        t = 0.0
        if self.params.has("lat_ts"):
            t = self.params.rad("lat_ts")
            self.k0 = math.cos(t)
            if self.k0 < 0.0:
                raise ProjError(ERR_LAT_TS_LARGER_THAN_90)
        self.spherical = self.ell.es == 0.0
        if not self.spherical:
            st = math.sin(t)
            self.k0 /= math.sqrt(1.0 - self.ell.es * st * st)
            self.apa = authset(self.ell.es)
            self.qp = float(qsfn(np.array([1.0]), self.ell.e, self.ell.one_es)[0])

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        coo.x = self.k0 * lam
        if self.spherical:
            coo.y = np.sin(phi) / self.k0
        else:
            coo.y = 0.5 * qsfn(np.sin(phi), self.ell.e, self.ell.one_es) / self.k0

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        if self.spherical:
            yk = y * self.k0
            t = np.abs(yk)
            bad = t - EPS > 1.0
            coo.set_err(bad, ERR_TOLERANCE_CONDITION)
            phi = np.where(
                t >= 1.0,
                np.where(yk < 0.0, -M_HALFPI, M_HALFPI),
                np.arcsin(np.clip(yk, -1.0, 1.0)),
            )
            coo.y = phi
            coo.x = x / self.k0
        else:
            coo.y = authlat(
                np.arcsin(np.clip(2.0 * y * self.k0 / self.qp, -1.0, 1.0)), self.apa
            )
            coo.x = x / self.k0


@register
class Eqc(Operation):
    """Equidistant Cylindrical / Plate Carrée (eqc.cpp). Spherical only;
    the ellipsoid collapses to a sphere of radius a (P->es forced to 0)."""

    name = "eqc"

    def setup(self) -> None:
        self.rc = math.cos(self.params.rad("lat_ts", 0.0))
        if self.rc <= 0.0:
            raise ProjError(ERR_LAT_TS_LARGER_THAN_90)
        # eqc.cpp:49 sets P->es = 0 (affects only derived helper usage)

    def _fwd(self, coo: Coords) -> None:
        coo.x = self.rc * coo.x
        coo.y = coo.y - self.phi0

    def _inv(self, coo: Coords) -> None:
        coo.x = coo.x / self.rc
        coo.y = coo.y + self.phi0


@register
class Mill(Operation):
    """Miller Cylindrical (mill.cpp): sphere-only closed form."""

    name = "mill"
    need_ellps = False

    def setup(self) -> None:
        pass  # mill.cpp: es = 0 implicitly (spherical formulas)

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        coo.x = lam
        coo.y = np.log(np.tan(M_FORTPI + phi * 0.4)) * 1.25

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        coo.x = x
        coo.y = 2.5 * (np.arctan(np.exp(0.8 * y)) - M_FORTPI)
