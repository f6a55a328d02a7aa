"""Lambert Conformal Conic.

Math re-derived from /root/reference/src/projections/lcc.cpp:
setup :80-151 (n, c, rho0 from tsfn/msfn, 1SP & 2SP secant cone);
fwd :23-43 (rho = c·tsfn^n); inv :46-77 (hypot + phi2).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import M_FORTPI, M_HALFPI
from ..core.errors import (
    ERR_CONIC_LAT_EQUAL,
    ERR_INVALID_ECCENTRICITY,
    ERR_LAT_1_OR_2_ZERO_OR_90,
    ERR_LAT_LARGER_THAN_90,
    ERR_TOLERANCE_CONDITION,
    ProjError,
)
from ..core.op import Coords, Operation
from ..mathx import phi2, tsfn
from . import register

EPS10 = 1e-10


def _tsfn_scalar(phi: float, e: float) -> float:
    return float(tsfn(np.array([phi]), np.array([math.sin(phi)]), e)[0])


@register
class Lcc(Operation):
    name = "lcc"

    def setup(self) -> None:
        phi1 = self.params.rad("lat_1", 0.0)
        if self.params.has("lat_2"):
            phi2_ = self.params.rad("lat_2")
        else:
            phi2_ = phi1
            if not self.params.has("lat_0"):
                self.phi0 = phi1
        if abs(phi1) > M_HALFPI or abs(phi2_) > M_HALFPI:
            raise ProjError(ERR_LAT_LARGER_THAN_90)
        if abs(phi1 + phi2_) < EPS10:
            raise ProjError(ERR_CONIC_LAT_EQUAL)

        es, e = self.ell.es, self.ell.e
        sinphi = math.sin(phi1)
        cosphi = math.cos(phi1)
        n = sinphi
        secant = abs(phi1 - phi2_) >= EPS10
        if es != 0.0:
            m1 = cosphi / math.sqrt(1.0 - es * sinphi * sinphi)
            ml1 = _tsfn_scalar(phi1, e)
            if ml1 == 0:
                raise ProjError(ERR_LAT_1_OR_2_ZERO_OR_90)
            if secant:
                sinphi2 = math.sin(phi2_)
                m2 = math.cos(phi2_) / math.sqrt(1.0 - es * sinphi2 * sinphi2)
                n = math.log(m1 / m2)
                if n == 0:
                    raise ProjError(ERR_INVALID_ECCENTRICITY)
                ml2 = _tsfn_scalar(phi2_, e)
                if ml2 == 0:
                    raise ProjError(ERR_LAT_1_OR_2_ZERO_OR_90)
                denom = math.log(ml1 / ml2)
                if denom == 0:
                    raise ProjError(ERR_INVALID_ECCENTRICITY)
                n /= denom
            rho0 = m1 * ml1 ** (-n) / n
            c = rho0
            if abs(abs(self.phi0) - M_HALFPI) < EPS10:
                rho0 = 0.0
            else:
                rho0 *= _tsfn_scalar(self.phi0, e) ** n
        else:
            if abs(cosphi) < EPS10 or abs(math.cos(phi2_)) < EPS10:
                raise ProjError(ERR_LAT_1_OR_2_ZERO_OR_90)
            if secant:
                n = math.log(cosphi / math.cos(phi2_)) / math.log(
                    math.tan(M_FORTPI + 0.5 * phi2_) / math.tan(M_FORTPI + 0.5 * phi1)
                )
            if n == 0:
                raise ProjError(ERR_CONIC_LAT_EQUAL)
            c = cosphi * math.tan(M_FORTPI + 0.5 * phi1) ** n / n
            if abs(abs(self.phi0) - M_HALFPI) < EPS10:
                rho0 = 0.0
            else:
                rho0 = c * math.tan(M_FORTPI + 0.5 * self.phi0) ** (-n)
        self.n, self.c, self.rho0 = n, c, rho0

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        es, e = self.ell.es, self.ell.e
        at_pole = np.abs(np.abs(phi) - M_HALFPI) < EPS10
        bad_pole = at_pole & (phi * self.n <= 0.0)
        coo.set_err(bad_pole, ERR_TOLERANCE_CONDITION)
        if es != 0.0:
            base = tsfn(phi, np.sin(phi), e)
        else:
            base = np.tan(M_FORTPI + 0.5 * phi)
        with np.errstate(invalid="ignore"):
            rho = self.c * np.power(base, self.n if es != 0.0 else -self.n)
        rho = np.where(at_pole, 0.0, rho)
        lamn = lam * self.n
        coo.x = self.k0 * (rho * np.sin(lamn))
        coo.y = self.k0 * (self.rho0 - rho * np.cos(lamn))

    def _inv(self, coo: Coords) -> None:
        es, e = self.ell.es, self.ell.e
        x = coo.x / self.k0
        y = self.rho0 - coo.y / self.k0
        rho = np.hypot(x, y)
        if self.n < 0.0:
            rho = -rho
            x = -x
            y = -y
        center = rho == 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            if es != 0.0:
                phi_, nonconv = phi2(np.power(rho / self.c, 1.0 / self.n), e)
                coo.set_err(nonconv & ~center, ERR_TOLERANCE_CONDITION)
            else:
                phi_ = 2.0 * np.arctan(np.power(self.c / rho, 1.0 / self.n)) - M_HALFPI
            lam = np.arctan2(x, y) / self.n
        pole = M_HALFPI if self.n > 0.0 else -M_HALFPI
        coo.x = np.where(center, 0.0, lam)
        coo.y = np.where(center, pole, phi_)
