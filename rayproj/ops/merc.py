"""Mercator / Web Mercator.

Math re-derived from /root/reference/src/projections/merc.cpp:
  ell fwd:  x = k0·λ,  y = −k0·ln(tsfn(φ))
  ell inv:  φ = phi2(exp(−y/k0)),  λ = x/k0
  sph fwd:  y = k0·ln(tan(π/4 + φ/2))   (log1p guard near φ=0)
  sph inv:  φ = atan(sinh(y/k0)),  λ = x/k0
+lat_ts sets k0 = msfn(φts) (ell) or cos(φts) (sphere); webmerc forces
spherical kernels with k0 = 1 on the given ellipsoid's a.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import M_FORTPI, M_HALFPI
from ..core.errors import (
    ERR_LAT_TS_LARGER_THAN_90,
    ERR_NON_CON_INV_PHI2,
    ERR_TOLERANCE_CONDITION,
    ProjError,
)
from ..core.op import Coords, Operation
from ..mathx import phi2, tsfn
from . import register

EPS10 = 1.0e-10


def _logtanpfpim1(x: np.ndarray) -> np.ndarray:
    """log(tan(x/2 + pi/4)), stable near x = 0."""
    small = np.abs(x) <= np.finfo(np.float64).eps
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.log(np.tan(M_FORTPI + 0.5 * x))
    return np.where(small, np.log1p(x), out)


@register
class Merc(Operation):
    name = "merc"

    def setup(self) -> None:
        self.spherical = self.ell.es == 0.0
        if self.params.has("lat_ts"):
            phits = abs(self.params.rad("lat_ts"))
            if phits >= M_HALFPI:
                raise ProjError(ERR_LAT_TS_LARGER_THAN_90)
            if not self.spherical:
                sp, cp = math.sin(phits), math.cos(phits)
                self.k0 = cp / math.sqrt(1.0 - self.ell.es * sp * sp)
            else:
                self.k0 = math.cos(phits)

    def _fwd(self, coo: Coords) -> None:
        at_pole = np.abs(np.abs(coo.y) - M_HALFPI) <= EPS10
        coo.set_err(at_pole, ERR_TOLERANCE_CONDITION)
        lam, phi = coo.x, coo.y
        if self.spherical:
            x = self.k0 * lam
            y = self.k0 * _logtanpfpim1(phi)
        else:
            x = self.k0 * lam
            y = -self.k0 * np.log(tsfn(phi, np.sin(phi), self.ell.e))
        coo.x, coo.y = x, y

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        if self.spherical:
            phi = np.arctan(np.sinh(y / self.k0))
        else:
            phi, nonconv = phi2(np.exp(-y / self.k0), self.ell.e)
            coo.set_err(nonconv, ERR_NON_CON_INV_PHI2)
        coo.x = x / self.k0
        coo.y = phi


@register
class WebMerc(Operation):
    """Pseudo/Web Mercator: spherical formulas on the ellipsoid's a, k0=1."""

    name = "webmerc"

    def setup(self) -> None:
        self.k0 = 1.0

    def _fwd(self, coo: Coords) -> None:
        at_pole = np.abs(np.abs(coo.y) - M_HALFPI) <= EPS10
        coo.set_err(at_pole, ERR_TOLERANCE_CONDITION)
        coo.x, coo.y = self.k0 * coo.x, self.k0 * _logtanpfpim1(coo.y)

    def _inv(self, coo: Coords) -> None:
        coo.x, coo.y = coo.x / self.k0, np.arctan(np.sinh(coo.y / self.k0))
