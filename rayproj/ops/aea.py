"""Albers Equal Area / Lambert Equal Area Conic.

Math re-derived from /root/reference/src/projections/aea.cpp:
setup :164-233 (n, c, dd, rho0 from qsfn/msfn); fwd :105-118
(rho = dd·sqrt(c − n·qsfn(sinφ))); inv :121-160 with the phi1_
Newton iteration on authalic latitude (:45-70, max 15+1 iters, tol
1e-10) vectorized as a masked fixed-point loop.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import M_HALFPI
from ..core.errors import (
    ERR_CONIC_LAT_EQUAL,
    ERR_INVALID_ECCENTRICITY,
    ERR_LAT_LARGER_THAN_90,
    ERR_TOLERANCE_CONDITION,
    ProjError,
)
from ..core.op import Coords, Operation
from ..mathx import qsfn
from . import register

EPS10 = 1e-10
TOL7 = 1e-7
EPSILON = 1.0e-7
TOL = 1.0e-10
N_ITER = 15


def _phi1(qs: np.ndarray, Te: float, Tone_es: float) -> tuple[np.ndarray, np.ndarray]:
    """Inverse authalic latitude (aea.cpp:49-70). Vectorized Newton:
    lanes stop updating once |dphi| <= TOL; non-converged after 16
    passes are flagged."""
    Phi = np.arcsin(np.clip(0.5 * qs, -1.0, 1.0))
    if Te < EPSILON:
        return Phi, np.zeros(Phi.shape, dtype=bool)
    active = np.isfinite(qs)
    converged = ~active
    # the reference loop runs up to N_ITER+1 times (do/while with i>=0)
    for _ in range(N_ITER + 1):
        if not np.any(active):
            break
        p = Phi[active]
        sinpi = np.sin(p)
        cospi = np.cos(p)
        con = Te * sinpi
        com = 1.0 - con * con
        with np.errstate(divide="ignore", invalid="ignore"):
            dphi = (
                0.5
                * com
                * com
                / cospi
                * (qs[active] / Tone_es - sinpi / com + 0.5 / Te * np.log((1.0 - con) / (1.0 + con)))
            )
        Phi[active] = p + dphi
        done = ~(np.abs(dphi) > TOL)
        idx = np.flatnonzero(active)
        converged[idx[done]] = True
        active[idx[done]] = False
    nonconv = ~converged
    return Phi, nonconv


@register
class Aea(Operation):
    name = "aea"

    def _read_lats(self) -> tuple[float, float]:
        return self.params.rad("lat_1", 0.0), self.params.rad("lat_2", 0.0)

    def setup(self) -> None:
        phi1, phi2_ = self._read_lats()
        if abs(phi1) > M_HALFPI or abs(phi2_) > M_HALFPI:
            raise ProjError(ERR_LAT_LARGER_THAN_90)
        if abs(phi1 + phi2_) < EPS10:
            raise ProjError(ERR_CONIC_LAT_EQUAL)
        es, e, one_es = self.ell.es, self.ell.e, self.ell.one_es
        sinphi = math.sin(phi1)
        cosphi = math.cos(phi1)
        n = sinphi
        secant = abs(phi1 - phi2_) >= EPS10
        self.ellips = es > 0.0
        if self.ellips:
            m1 = cosphi / math.sqrt(1.0 - es * sinphi * sinphi)
            ml1 = float(qsfn(np.array([sinphi]), e, one_es)[0])
            if secant:
                sinphi2 = math.sin(phi2_)
                m2 = math.cos(phi2_) / math.sqrt(1.0 - es * sinphi2 * sinphi2)
                ml2 = float(qsfn(np.array([sinphi2]), e, one_es)[0])
                if ml2 == ml1:
                    raise ProjError(ERR_CONIC_LAT_EQUAL)
                n = (m1 * m1 - m2 * m2) / (ml2 - ml1)
                if n == 0:
                    raise ProjError(ERR_INVALID_ECCENTRICITY)
            self.ec = 1.0 - 0.5 * one_es * math.log((1.0 - e) / (1.0 + e)) / e
            self.c = m1 * m1 + n * ml1
            self.dd = 1.0 / n
            self.rho0 = self.dd * math.sqrt(
                self.c - n * float(qsfn(np.array([math.sin(self.phi0)]), e, one_es)[0])
            )
            self.n2 = 0.0
        else:
            if secant:
                n = 0.5 * (n + math.sin(phi2_))
            self.n2 = n + n
            self.c = cosphi * cosphi + self.n2 * sinphi
            self.dd = 1.0 / n
            self.rho0 = self.dd * math.sqrt(self.c - self.n2 * math.sin(self.phi0))
            self.ec = 0.0
        self.n = n

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        if self.ellips:
            rho2 = self.c - self.n * qsfn(np.sin(phi), self.ell.e, self.ell.one_es)
        else:
            rho2 = self.c - self.n2 * np.sin(phi)
        coo.set_err(rho2 < 0.0, ERR_TOLERANCE_CONDITION)
        rho = self.dd * np.sqrt(np.maximum(rho2, 0.0))
        lamn = lam * self.n
        coo.x = rho * np.sin(lamn)
        coo.y = self.rho0 - rho * np.cos(lamn)

    def _inv(self, coo: Coords) -> None:
        x = coo.x
        y = self.rho0 - coo.y
        rho = np.hypot(x, y)
        if self.n < 0.0:
            rho = -rho
            x = -x
            y = -y
        center = rho == 0.0
        phi = rho / self.dd
        if self.ellips:
            phi = (self.c - phi * phi) / self.n
            interior = np.abs(self.ec - np.abs(phi)) > TOL7
            too_far = interior & (np.abs(phi) > 2.0)
            coo.set_err(too_far & ~center, ERR_TOLERANCE_CONDITION)
            it_phi, nonconv = _phi1(np.where(interior & ~too_far, phi, 0.0), self.ell.e, self.ell.one_es)
            coo.set_err(interior & ~too_far & nonconv & ~center, ERR_TOLERANCE_CONDITION)
            phi = np.where(
                interior, it_phi, np.where(phi < 0.0, -M_HALFPI, M_HALFPI)
            )
        else:
            phi = (self.c - phi * phi) / self.n2
            phi = np.where(
                np.abs(phi) <= 1.0,
                np.arcsin(np.clip(phi, -1.0, 1.0)),
                np.where(phi < 0.0, -M_HALFPI, M_HALFPI),
            )
        with np.errstate(invalid="ignore"):
            lam = np.arctan2(x, y) / self.n
        pole = M_HALFPI if self.n > 0.0 else -M_HALFPI
        coo.x = np.where(center, 0.0, lam)
        coo.y = np.where(center, pole, phi)


@register
class Leac(Aea):
    name = "leac"

    def _read_lats(self) -> tuple[float, float]:
        phi2_ = self.params.rad("lat_1", 0.0)
        phi1 = -M_HALFPI if self.params.bool_("south") else M_HALFPI
        return phi1, phi2_
