"""Stereographic / Universal Polar Stereographic.

Math re-derived from /root/reference/src/projections/stere.cpp: 4 modes
(N_POLE/S_POLE/OBLIQ/EQUIT) chosen per-instance in setup (:239-298);
ellipsoidal kernels via the conformal latitude helper ssfn_ (:36-41),
fwd :44-96, inverse fixed-point loop (8 iters, tol 1e-10, :141-190)
vectorized as a masked iteration; sphere variants :99-139, :193-230;
ups constructor :314-333.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import M_FORTPI, M_HALFPI
from ..core.errors import (
    ERR_ELLIPSOID_USE_REQUIRED,
    ERR_TOLERANCE_CONDITION,
    ProjError,
)
from ..core.op import Coords, Operation
from ..mathx import tsfn
from . import register

EPS10 = 1e-10
TOL = 1e-8
NITER = 8
CONV = 1e-10

S_POLE, N_POLE, OBLIQ, EQUIT = 0, 1, 2, 3


def _ssfn(phit, sinphi, e):
    sinphi = sinphi * e
    return np.tan(0.5 * (M_HALFPI + phit)) * np.power((1.0 - sinphi) / (1.0 + sinphi), 0.5 * e)


@register
class Stere(Operation):
    name = "stere"

    def _read_phits(self) -> float:
        if self.params.has("lat_ts"):
            return self.params.rad("lat_ts")
        return M_HALFPI

    def setup(self) -> None:
        self.phits = abs(self._read_phits())
        t = abs(self.phi0)
        if abs(t - M_HALFPI) < EPS10:
            self.mode = S_POLE if self.phi0 < 0.0 else N_POLE
        else:
            self.mode = OBLIQ if t > EPS10 else EQUIT
        es, e = self.ell.es, self.ell.e
        self.spherical = es == 0.0
        self.sinX1 = self.cosX1 = 0.0
        if not self.spherical:
            if self.mode in (N_POLE, S_POLE):
                if abs(self.phits - M_HALFPI) < EPS10:
                    self.akm1 = 2.0 * self.k0 / math.sqrt(
                        (1 + e) ** (1 + e) * (1 - e) ** (1 - e)
                    )
                else:
                    t_ = math.sin(self.phits)
                    self.akm1 = math.cos(self.phits) / float(
                        tsfn(np.array([self.phits]), np.array([t_]), e)[0]
                    )
                    t_ *= e
                    self.akm1 /= math.sqrt(1.0 - t_ * t_)
            else:
                t_ = math.sin(self.phi0)
                X = 2.0 * math.atan(float(_ssfn(np.array([self.phi0]), np.array([t_]), e)[0])) - M_HALFPI
                t_ *= e
                self.akm1 = 2.0 * self.k0 * math.cos(self.phi0) / math.sqrt(1.0 - t_ * t_)
                self.sinX1 = math.sin(X)
                self.cosX1 = math.cos(X)
        else:
            if self.mode == OBLIQ:
                self.sinX1 = math.sin(self.phi0)  # sinph0
                self.cosX1 = math.cos(self.phi0)  # cosph0
                self.akm1 = 2.0 * self.k0
            elif self.mode == EQUIT:
                self.akm1 = 2.0 * self.k0
            else:
                if abs(self.phits - M_HALFPI) >= EPS10:
                    self.akm1 = math.cos(self.phits) / math.tan(M_FORTPI - 0.5 * self.phits)
                else:
                    self.akm1 = 2.0 * self.k0

    # ------------------------------------------------------------------
    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        e = self.ell.e
        coslam = np.cos(lam)
        sinlam = np.sin(lam)
        sinphi = np.sin(phi)
        if not self.spherical:
            if self.mode in (OBLIQ, EQUIT):
                X = 2.0 * np.arctan(_ssfn(phi, sinphi, e)) - M_HALFPI
                sinX = np.sin(X)
                cosX = np.cos(X)
                if self.mode == OBLIQ:
                    denom = self.cosX1 * (1.0 + self.sinX1 * sinX + self.cosX1 * cosX * coslam)
                    coo.set_err(denom == 0, ERR_TOLERANCE_CONDITION)
                    A = self.akm1 / denom
                    y = A * (self.cosX1 * sinX - self.sinX1 * cosX * coslam)
                    x = A * cosX
                else:
                    denom = 1.0 + cosX * coslam
                    A = self.akm1 / denom
                    y = np.where(denom == 0.0, np.inf, A * sinX)
                    x = A * cosX
            else:
                if self.mode == S_POLE:
                    phi_ = -phi
                    coslam_ = -coslam
                    sinphi_ = -sinphi
                else:
                    phi_, coslam_, sinphi_ = phi, coslam, sinphi
                x = self.akm1 * tsfn(phi_, sinphi_, e)
                y = -x * coslam_
            coo.x = x * sinlam
            coo.y = y
        else:
            cosphi = np.cos(phi)
            if self.mode in (EQUIT, OBLIQ):
                if self.mode == EQUIT:
                    y = 1.0 + cosphi * coslam
                else:
                    y = 1.0 + self.sinX1 * sinphi + self.cosX1 * cosphi * coslam
                coo.set_err(y <= EPS10, ERR_TOLERANCE_CONDITION)
                y = self.akm1 / y
                x = y * cosphi * sinlam
                if self.mode == EQUIT:
                    y = y * sinphi
                else:
                    y = y * (self.cosX1 * sinphi - self.sinX1 * cosphi * coslam)
            else:
                if self.mode == N_POLE:
                    coslam_ = -coslam
                    phi_ = -phi
                else:
                    coslam_, phi_ = coslam, phi
                coo.set_err(np.abs(phi_ - M_HALFPI) < TOL, ERR_TOLERANCE_CONDITION)
                y = self.akm1 * np.tan(M_FORTPI + 0.5 * phi_)
                x = sinlam * y
                y = y * coslam_
            coo.x, coo.y = x, y

    # ------------------------------------------------------------------
    def _inv(self, coo: Coords) -> None:
        x, y = coo.x.copy(), coo.y.copy()
        e = self.ell.e
        rho = np.hypot(x, y)
        if not self.spherical:
            if self.mode in (OBLIQ, EQUIT):
                tp = 2.0 * np.arctan2(rho * self.cosX1, self.akm1)
                cosphi = np.cos(tp)
                sinphi = np.sin(tp)
                with np.errstate(divide="ignore", invalid="ignore"):
                    phi_l = np.where(
                        rho == 0.0,
                        np.arcsin(np.clip(cosphi * self.sinX1, -1, 1)),
                        np.arcsin(np.clip(cosphi * self.sinX1 + (y * sinphi * self.cosX1 / rho), -1, 1)),
                    )
                tp = np.tan(0.5 * (M_HALFPI + phi_l))
                x = x * sinphi
                y = rho * self.cosX1 * cosphi - y * self.sinX1 * sinphi
                halfpi = M_HALFPI
                halfe = 0.5 * e
            else:
                if self.mode == N_POLE:
                    y = -y
                tp = -rho / self.akm1
                phi_l = M_HALFPI - 2.0 * np.arctan(tp)
                halfpi = -M_HALFPI
                halfe = -0.5 * e
            # fixed-point iteration (stere.cpp:174-187), masked
            phi_out = np.full_like(phi_l, np.nan)
            active = np.isfinite(phi_l)
            nonconv = active.copy()
            for _ in range(NITER):
                if not np.any(active):
                    break
                sinphi = e * np.sin(phi_l[active])
                new_phi = (
                    2.0 * np.arctan(tp[active] * np.power((1.0 + sinphi) / (1.0 - sinphi), halfe))
                    - halfpi
                )
                done = np.abs(phi_l[active] - new_phi) < CONV
                idx = np.flatnonzero(active)
                phi_l[active] = new_phi
                phi_out[idx[done]] = new_phi[done]
                nonconv[idx[done]] = False
                active[idx[done]] = False
            coo.set_err(nonconv, ERR_TOLERANCE_CONDITION)
            phi = phi_out
            if self.mode == S_POLE:
                phi = -phi
            lam = np.where((x == 0.0) & (y == 0.0), 0.0, np.arctan2(x, y))
            coo.x, coo.y = lam, phi
        else:
            c = 2.0 * np.arctan(rho / self.akm1)
            sinc = np.sin(c)
            cosc = np.cos(c)
            if self.mode == EQUIT:
                with np.errstate(divide="ignore", invalid="ignore"):
                    phi = np.where(np.abs(rho) <= EPS10, 0.0, np.arcsin(np.clip(y * sinc / rho, -1, 1)))
                lam = np.where((cosc != 0.0) | (x != 0.0), np.arctan2(x * sinc, cosc * rho), 0.0)
            elif self.mode == OBLIQ:
                with np.errstate(divide="ignore", invalid="ignore"):
                    phi = np.where(
                        np.abs(rho) <= EPS10,
                        self.phi0,
                        np.arcsin(np.clip(cosc * self.sinX1 + y * sinc * self.cosX1 / rho, -1, 1)),
                    )
                cc = cosc - self.sinX1 * np.sin(phi)
                lam = np.where((cc != 0.0) | (x != 0.0), np.arctan2(x * sinc * self.cosX1, cc * rho), 0.0)
            else:
                if self.mode == N_POLE:
                    y = -y
                phi = np.where(
                    np.abs(rho) <= EPS10,
                    self.phi0,
                    np.arcsin(np.clip(-cosc if self.mode == S_POLE else cosc, -1, 1)),
                )
                lam = np.where((x == 0.0) & (y == 0.0), 0.0, np.arctan2(x, y))
            coo.x, coo.y = lam, phi


@register
class Ups(Stere):
    name = "ups"

    def setup(self) -> None:
        self.phi0 = -M_HALFPI if self.params.bool_("south") else M_HALFPI
        if self.ell.es == 0.0:
            raise ProjError(ERR_ELLIPSOID_USE_REQUIRED, "ups")
        self.k0 = 0.994
        self.x0 = 2000000.0
        self.y0 = 2000000.0
        self.lam0 = 0.0
        self.phits = M_HALFPI
        # run the shared mode/constant setup with phits pinned to the pole
        saved = self._read_phits
        self._read_phits = lambda: M_HALFPI
        try:
            super().setup()
        finally:
            self._read_phits = saved
