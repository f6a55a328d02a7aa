"""Azimuthal projections: laea, aeqd, ortho, gnom.

Math re-derived from /root/reference/src/projections/{laea,aeqd,ortho,gnom}.cpp.
Mode (pole/equatorial/oblique) is per-instance; per-point conditionals
become np.where masks.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import M_FORTPI, M_HALFPI, M_PI
from ..core.errors import (
    ERR_LAT_LARGER_THAN_90,
    ERR_TOLERANCE_CONDITION,
    ProjError,
)
from ..core.op import Coords, Operation
from ..mathx import aasin, authlat, authset, enfn, inv_mlfn, mlfn, qsfn
from . import register

EPS10 = 1e-10

N_POLE, S_POLE, EQUIT, OBLIQ = 0, 1, 2, 3


@register
class Laea(Operation):
    """Lambert Azimuthal Equal Area (laea.cpp)."""

    name = "laea"

    def setup(self) -> None:
        t = abs(self.phi0)
        if t > M_HALFPI + EPS10:
            raise ProjError(ERR_LAT_LARGER_THAN_90)
        if abs(t - M_HALFPI) < EPS10:
            self.mode = S_POLE if self.phi0 < 0.0 else N_POLE
        elif abs(t) < EPS10:
            self.mode = EQUIT
        else:
            self.mode = OBLIQ
        es, e, one_es = self.ell.es, self.ell.e, self.ell.one_es
        self.spherical = es == 0.0
        self.sinb1 = self.cosb1 = 0.0
        self.xmf = self.ymf = self.dd = self.rq = 0.0
        if not self.spherical:
            self.qp = float(qsfn(np.array([1.0]), e, one_es)[0])
            self.mmf = 0.5 / (1.0 - es)
            self.apa = authset(es)
            if self.mode in (N_POLE, S_POLE):
                self.dd = 1.0
            elif self.mode == EQUIT:
                self.rq = math.sqrt(0.5 * self.qp)
                self.dd = 1.0 / self.rq
                self.xmf = 1.0
                self.ymf = 0.5 * self.qp
            else:
                self.rq = math.sqrt(0.5 * self.qp)
                sinphi = math.sin(self.phi0)
                self.sinb1 = float(qsfn(np.array([sinphi]), e, one_es)[0]) / self.qp
                self.cosb1 = math.sqrt(1.0 - self.sinb1 * self.sinb1)
                # IEEE division like the reference (laea.cpp OBLIQ setup,
                # no zero guard): cosb1 rounds to 0 at near-polar lat_0
                # -> dd = inf, ymf = 0 — garbage coords, never a crash
                with np.errstate(divide="ignore", invalid="ignore"):
                    den = math.sqrt(1.0 - es * sinphi * sinphi) * self.rq * self.cosb1
                    self.dd = float(np.float64(math.cos(self.phi0)) / np.float64(den))
                    self.xmf = self.rq
                    self.ymf = float(np.float64(self.rq) / np.float64(self.dd))
                    self.xmf *= self.dd
        else:
            if self.mode == OBLIQ:
                self.sinb1 = math.sin(self.phi0)
                self.cosb1 = math.cos(self.phi0)

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        coslam = np.cos(lam)
        sinlam = np.sin(lam)
        sinphi = np.sin(phi)
        if not self.spherical:
            e, one_es = self.ell.e, self.ell.one_es
            q = qsfn(sinphi, e, one_es)
            if self.mode in (OBLIQ, EQUIT):
                sinb = q / self.qp
                cosb2 = 1.0 - sinb * sinb
                cosb = np.sqrt(np.maximum(cosb2, 0.0))
                if self.mode == OBLIQ:
                    b = 1.0 + self.sinb1 * sinb + self.cosb1 * cosb * coslam
                else:
                    b = 1.0 + cosb * coslam
                coo.set_err(np.abs(b) < EPS10, ERR_TOLERANCE_CONDITION)
                with np.errstate(divide="ignore", invalid="ignore"):
                    b = np.sqrt(2.0 / b)
                if self.mode == OBLIQ:
                    y = self.ymf * b * (self.cosb1 * sinb - self.sinb1 * cosb * coslam)
                else:
                    y = b * sinb * self.ymf
                x = self.xmf * b * cosb * sinlam
            else:
                if self.mode == N_POLE:
                    b = M_HALFPI + phi
                    q2 = self.qp - q
                else:
                    b = phi - M_HALFPI
                    q2 = self.qp + q
                coo.set_err(np.abs(b) < EPS10, ERR_TOLERANCE_CONDITION)
                rb = np.sqrt(np.maximum(q2, 0.0))
                x = np.where(q2 >= 1e-15, rb * sinlam, 0.0)
                y = np.where(
                    q2 >= 1e-15, coslam * (rb if self.mode == S_POLE else -rb), 0.0
                )
            coo.x, coo.y = x, y
        else:
            cosphi = np.cos(phi)
            if self.mode in (EQUIT, OBLIQ):
                if self.mode == EQUIT:
                    y = 1.0 + cosphi * coslam
                else:
                    y = 1.0 + self.sinb1 * sinphi + self.cosb1 * cosphi * coslam
                coo.set_err(y <= EPS10, ERR_TOLERANCE_CONDITION)
                with np.errstate(divide="ignore", invalid="ignore"):
                    y = np.sqrt(2.0 / y)
                x = y * cosphi * sinlam
                if self.mode == EQUIT:
                    y = y * sinphi
                else:
                    y = y * (self.cosb1 * sinphi - self.sinb1 * cosphi * coslam)
            else:
                cl = -coslam if self.mode == N_POLE else coslam
                coo.set_err(np.abs(phi + self.phi0) < EPS10, ERR_TOLERANCE_CONDITION)
                yy = M_FORTPI - phi * 0.5
                yy = 2.0 * (np.cos(yy) if self.mode == S_POLE else np.sin(yy))
                x = yy * sinlam
                y = yy * cl
            coo.x, coo.y = x, y

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x.copy(), coo.y.copy()
        if not self.spherical:
            if self.mode in (EQUIT, OBLIQ):
                x = x / self.dd
                y = y * self.dd
                rho = np.hypot(x, y)
                center = rho < EPS10
                sCe = 2.0 * np.arcsin(np.clip(0.5 * rho / self.rq, -1.0, 1.0))
                cCe = np.cos(sCe)
                sCe = np.sin(sCe)
                x = x * sCe
                with np.errstate(divide="ignore", invalid="ignore"):
                    if self.mode == OBLIQ:
                        ab = cCe * self.sinb1 + y * sCe * self.cosb1 / rho
                        y = rho * self.cosb1 * cCe - y * self.sinb1 * sCe
                    else:
                        ab = y * sCe / rho
                        y = rho * cCe
                lam = np.arctan2(x, y)
                phi = authlat(np.arcsin(np.clip(ab, -1.0, 1.0)), self.apa)
                coo.x = np.where(center, 0.0, lam)
                coo.y = np.where(center, self.phi0, phi)
            else:
                if self.mode == N_POLE:
                    y = -y
                q = x * x + y * y
                center = q == 0.0
                ab = 1.0 - q / self.qp
                if self.mode == S_POLE:
                    ab = -ab
                lam = np.arctan2(x, y)
                phi = authlat(np.arcsin(np.clip(ab, -1.0, 1.0)), self.apa)
                coo.x = np.where(center, 0.0, lam)
                coo.y = np.where(center, self.phi0, phi)
        else:
            rh = np.hypot(x, y)
            half = rh * 0.5
            coo.set_err(half > 1.0, ERR_TOLERANCE_CONDITION)
            phi_c = 2.0 * np.arcsin(np.clip(half, -1.0, 1.0))
            if self.mode in (OBLIQ, EQUIT):
                sinz = np.sin(phi_c)
                cosz = np.cos(phi_c)
                with np.errstate(divide="ignore", invalid="ignore"):
                    if self.mode == EQUIT:
                        phi = np.where(
                            np.abs(rh) <= EPS10, 0.0,
                            np.arcsin(np.clip(y * sinz / rh, -1, 1)),
                        )
                        x = x * sinz
                        y = cosz * rh
                    else:
                        phi = np.where(
                            np.abs(rh) <= EPS10, self.phi0,
                            np.arcsin(np.clip(cosz * self.sinb1 + y * sinz * self.cosb1 / rh, -1, 1)),
                        )
                        x = x * sinz * self.cosb1
                        y = (cosz - np.sin(phi) * self.sinb1) * rh
                lam = np.where((y == 0.0), 0.0, np.arctan2(x, y))
            elif self.mode == N_POLE:
                y = -y
                phi = M_HALFPI - phi_c
                lam = np.where((x == 0.0) & (y == 0.0), 0.0, np.arctan2(x, y))
            else:
                phi = phi_c - M_HALFPI
                lam = np.where((x == 0.0) & (y == 0.0), 0.0, np.arctan2(x, y))
            coo.x, coo.y = lam, phi


@register
class Aeqd(Operation):
    """Azimuthal Equidistant (aeqd.cpp). Ellipsoidal oblique/equatorial
    modes need Karney geodesics (geod_direct/inverse) — provided by
    mathx.geodesic; polar / Guam / spherical modes are closed-form."""

    name = "aeqd"

    def setup(self) -> None:
        self.tol = 1e-14
        t = abs(self.phi0)
        if abs(t - M_HALFPI) < EPS10:
            self.mode = S_POLE if self.phi0 < 0.0 else N_POLE
            self.sinph0 = -1.0 if self.phi0 < 0.0 else 1.0
            self.cosph0 = 0.0
        elif t < EPS10:
            self.mode = EQUIT
            self.sinph0, self.cosph0 = 0.0, 1.0
        else:
            self.mode = OBLIQ
            self.sinph0 = math.sin(self.phi0)
            self.cosph0 = math.cos(self.phi0)
        self.spherical = self.ell.es == 0.0
        self.guam = self.params.bool_("guam", False)
        if not self.spherical:
            self.en = enfn(self.ell.es)
            if self.guam:
                self.M1 = float(mlfn(np.array([self.phi0]), np.array([self.sinph0]),
                                     np.array([self.cosph0]), self.en)[0])
            elif self.mode == N_POLE:
                self.Mp = float(mlfn(np.array([M_HALFPI]), np.array([1.0]),
                                     np.array([0.0]), self.en)[0])
            elif self.mode == S_POLE:
                self.Mp = float(mlfn(np.array([-M_HALFPI]), np.array([-1.0]),
                                     np.array([0.0]), self.en)[0])

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        if self.spherical:
            self._s_fwd(coo)
            return
        if self.guam:
            cosphi = np.cos(phi)
            sinphi = np.sin(phi)
            t = 1.0 / np.sqrt(1.0 - self.ell.es * sinphi * sinphi)
            coo.x = lam * cosphi * t
            coo.y = (mlfn(phi, sinphi, cosphi, self.en) - self.M1
                     + 0.5 * lam * lam * cosphi * sinphi * t)
            return
        if self.mode in (N_POLE, S_POLE):
            coslam = np.cos(lam)
            if self.mode == N_POLE:
                coslam = -coslam
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            rho = np.abs(self.Mp - mlfn(phi, sinphi, cosphi, self.en))
            coo.x = rho * np.sin(lam)
            coo.y = rho * coslam
            return
        # ellipsoidal oblique/equatorial: geodesic azimuth+distance
        from ..mathx.geodesic import geod_inverse

        at_center = (np.abs(lam) < EPS10) & (np.abs(phi - self.phi0) < EPS10)
        s12, azi1, _ = geod_inverse(
            self.ell.a, self.ell.f,
            np.full_like(phi, self.phi0), np.full_like(lam, self.lam0),
            phi, lam + self.lam0,
        )
        x = s12 * np.sin(azi1) / self.ell.a
        y = s12 * np.cos(azi1) / self.ell.a
        coo.x = np.where(at_center, 0.0, x)
        coo.y = np.where(at_center, 0.0, y)

    def _inv(self, coo: Coords) -> None:
        if self.spherical:
            self._s_inv(coo)
            return
        x, y = coo.x, coo.y
        if self.guam:
            x2 = 0.5 * x * x
            phi = np.full_like(x, self.phi0)
            t = np.zeros_like(x)
            for _ in range(3):
                t = self.ell.e * np.sin(phi)
                t = np.sqrt(1.0 - t * t)
                phi, _ = inv_mlfn(self.M1 + y - x2 * np.tan(phi) * t, self.ell.es, self.en)
            coo.y = phi
            with np.errstate(divide="ignore", invalid="ignore"):
                coo.x = x * t / np.cos(phi)
            return
        c = np.hypot(x, y)
        center = c < EPS10
        if self.mode in (N_POLE, S_POLE):
            arg = self.Mp - c if self.mode == N_POLE else self.Mp + c
            phi, nonconv = inv_mlfn(arg, self.ell.es, self.en)
            coo.set_err(nonconv & ~center, -17)
            lam = np.arctan2(x, -y if self.mode == N_POLE else y)
            coo.x = np.where(center, 0.0, lam)
            coo.y = np.where(center, self.phi0, phi)
            return
        from ..mathx.geodesic import geod_direct

        x2 = x * self.ell.a
        y2 = y * self.ell.a
        azi1 = np.arctan2(x2, y2)
        s12 = np.sqrt(x2 * x2 + y2 * y2)
        phi2, lam2, _ = geod_direct(
            self.ell.a, self.ell.f,
            np.full_like(x, self.phi0), np.full_like(x, self.lam0), azi1, s12,
        )
        coo.x = np.where(center, 0.0, lam2 - self.lam0)
        coo.y = np.where(center, self.phi0, phi2)

    # spherical kernels (aeqd.cpp:138-185, :234-283)
    def _s_fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        if self.mode in (EQUIT, OBLIQ):
            if self.mode == EQUIT:
                yb = cosphi * coslam
            else:
                yb = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam
            on_edge = np.abs(np.abs(yb) - 1.0) < self.tol
            antipode = on_edge & (yb < 0.0)
            coo.set_err(antipode, ERR_TOLERANCE_CONDITION)
            with np.errstate(divide="ignore", invalid="ignore"):
                z = np.arccos(np.clip(yb, -1.0, 1.0))
                f = np.where(on_edge, 1.0, z / np.sin(z))
            x = f * cosphi * np.sin(lam)
            if self.mode == EQUIT:
                y = f * sinphi
            else:
                y = f * (self.cosph0 * sinphi - self.sinph0 * cosphi * coslam)
            # at the exact center z/sin(z) → 1 giving x=0,y=0 as the
            # reference's aeqd_e_forward special case does
            coo.x, coo.y = x, y
        else:
            if self.mode == N_POLE:
                phi_ = -phi
                coslam_ = -coslam
            else:
                phi_, coslam_ = phi, coslam
            coo.set_err(np.abs(phi_ - M_HALFPI) < EPS10, ERR_TOLERANCE_CONDITION)
            yy = M_HALFPI + phi_
            coo.x = yy * np.sin(lam)
            coo.y = yy * coslam_

    def _s_inv(self, coo: Coords) -> None:
        x, y = coo.x.copy(), coo.y.copy()
        c_rh = np.hypot(x, y)
        too_far = c_rh - EPS10 > M_PI
        coo.set_err(too_far, ERR_TOLERANCE_CONDITION)
        c_rh = np.minimum(c_rh, M_PI)
        center = c_rh < EPS10
        if self.mode in (OBLIQ, EQUIT):
            sinc = np.sin(c_rh)
            cosc = np.cos(c_rh)
            with np.errstate(divide="ignore", invalid="ignore"):
                if self.mode == EQUIT:
                    phi, err = aasin(y * sinc / c_rh)
                    coo.set_err(err & ~center, -19)
                    x = x * sinc
                    y = cosc * c_rh
                else:
                    phi, err = aasin(cosc * self.sinph0 + y * sinc * self.cosph0 / c_rh)
                    coo.set_err(err & ~center, -19)
                    y = (cosc - self.sinph0 * np.sin(phi)) * c_rh
                    x = x * sinc * self.cosph0
            lam = np.where(y == 0.0, 0.0, np.arctan2(x, y))
        elif self.mode == N_POLE:
            phi = M_HALFPI - c_rh
            lam = np.arctan2(x, -y)
        else:
            phi = c_rh - M_HALFPI
            lam = np.arctan2(x, y)
        coo.x = np.where(center, 0.0, lam)
        coo.y = np.where(center, self.phi0, phi)


@register
class Ortho(Operation):
    """Orthographic (ortho.cpp): spherical closed forms + EPSG GN7-2
    ellipsoidal variant with Newton inverse."""

    name = "ortho"

    def setup(self) -> None:
        self.sinph0 = math.sin(self.phi0)
        self.cosph0 = math.cos(self.phi0)
        if abs(abs(self.phi0) - M_HALFPI) <= EPS10:
            self.mode = S_POLE if self.phi0 < 0.0 else N_POLE
        elif abs(self.phi0) > EPS10:
            self.mode = OBLIQ
        else:
            self.mode = EQUIT
        self.spherical = self.ell.es == 0.0
        if not self.spherical:
            es = self.ell.es
            self.nu0 = 1.0 / math.sqrt(1.0 - es * self.sinph0 * self.sinph0)
            self.y_shift = es * self.nu0 * self.sinph0 * self.cosph0
            self.y_scale = 1.0 / math.sqrt(1.0 - es * self.cosph0 * self.cosph0)

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        coslam = np.cos(lam)
        if self.spherical:
            if self.mode == EQUIT:
                hidden = cosphi * coslam < -EPS10
                y = sinphi
            elif self.mode == OBLIQ:
                hidden = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam < -EPS10
                y = self.cosph0 * sinphi - self.sinph0 * cosphi * coslam
            else:
                cl = -coslam if self.mode == N_POLE else coslam
                hidden = np.abs(phi - self.phi0) - EPS10 > M_HALFPI
                y = cosphi * cl
            coo.set_err(hidden, ERR_TOLERANCE_CONDITION)
            coo.x = np.where(hidden, np.inf, cosphi * np.sin(lam))
            coo.y = np.where(hidden, np.inf, y)
        else:
            hidden = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam < -EPS10
            coo.set_err(hidden, ERR_TOLERANCE_CONDITION)
            es = self.ell.es
            nu = 1.0 / np.sqrt(1.0 - es * sinphi * sinphi)
            x = nu * cosphi * np.sin(lam)
            y = nu * (sinphi * self.cosph0 - cosphi * self.sinph0 * coslam) + es * (
                self.nu0 * self.sinph0 - nu * sinphi
            ) * self.cosph0
            coo.x = np.where(hidden, np.inf, x)
            coo.y = np.where(hidden, np.inf, y)

    def _s_inverse_arrays(self, x, y):
        rh = np.hypot(x, y)
        sinc = np.minimum(rh, 1.0)
        bad = (rh - 1.0) > EPS10
        cosc = np.sqrt(1.0 - sinc * sinc)
        center = np.abs(rh) <= EPS10
        with np.errstate(divide="ignore", invalid="ignore"):
            if self.mode == N_POLE:
                phi = np.arccos(sinc)
                lam = np.arctan2(x, -y)
            elif self.mode == S_POLE:
                phi = -np.arccos(sinc)
                lam = np.arctan2(x, y)
            elif self.mode == EQUIT:
                p = y * sinc / rh
                xx = x * sinc
                yy = cosc * rh
                phi = np.where(np.abs(p) >= 1.0, np.where(p < 0, -M_HALFPI, M_HALFPI),
                               np.arcsin(np.clip(p, -1, 1)))
                lam = np.where(
                    yy == 0.0,
                    np.where(xx == 0.0, 0.0, np.where(xx < 0.0, -M_HALFPI, M_HALFPI)),
                    np.arctan2(xx, yy),
                )
            else:
                p = cosc * self.sinph0 + y * sinc * self.cosph0 / rh
                yy = (cosc - self.sinph0 * p) * rh
                xx = x * sinc * self.cosph0
                phi = np.where(np.abs(p) >= 1.0, np.where(p < 0, -M_HALFPI, M_HALFPI),
                               np.arcsin(np.clip(p, -1, 1)))
                lam = np.where(
                    yy == 0.0,
                    np.where(xx == 0.0, 0.0, np.where(xx < 0.0, -M_HALFPI, M_HALFPI)),
                    np.arctan2(xx, yy),
                )
        phi = np.where(center, self.phi0, phi)
        lam = np.where(center, 0.0, lam)
        return lam, phi, bad

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        if self.spherical:
            lam, phi, bad = self._s_inverse_arrays(x, y)
            coo.set_err(bad, ERR_TOLERANCE_CONDITION)
            coo.x = np.where(bad, np.inf, lam)
            coo.y = np.where(bad, np.inf, phi)
            return
        es, one_es = self.ell.es, self.ell.one_es
        if self.mode in (N_POLE, S_POLE):
            rh2 = x * x + y * y
            bad = (rh2 - 1.0) > EPS10
            coo.set_err(bad, ERR_TOLERANCE_CONDITION)
            edge = rh2 >= 1.0 - 1e-15
            with np.errstate(divide="ignore", invalid="ignore"):
                phi = np.arccos(
                    np.sqrt(np.clip(rh2 * one_es / (1 - es * rh2), 0.0, 1.0))
                ) * (1 if self.mode == N_POLE else -1)
            phi = np.where(edge, 0.0, phi)
            lam = np.arctan2(x, y * (-1 if self.mode == N_POLE else 1))
            coo.x = np.where(bad, np.inf, lam)
            coo.y = np.where(bad, np.inf, phi)
            return
        if self.mode == EQUIT:
            bad = x * x + (y * (self.ell.a / self.ell.b)) ** 2 > 1 + 1e-11
            coo.set_err(bad, ERR_TOLERANCE_CONDITION)
            with np.errstate(divide="ignore", invalid="ignore"):
                sinphi2 = np.where(y == 0, 0.0, 1.0 / (((1 - es) / y) ** 2 + es))
            at_pole = sinphi2 > 1 - 1e-11
            phi = np.where(
                at_pole,
                M_HALFPI * np.where(y > 0, 1.0, -1.0),
                np.arcsin(np.sqrt(np.clip(sinphi2, 0, 1))) * np.where(y > 0, 1.0, -1.0),
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                sinlam = x * np.sqrt((1 - es * sinphi2) / np.maximum(1 - sinphi2, 1e-300))
            lam = np.where(
                np.abs(sinlam) - 1 > -1e-15,
                M_HALFPI * np.where(x > 0, 1.0, -1.0),
                np.arcsin(np.clip(sinlam, -1, 1)),
            )
            lam = np.where(at_pole, 0.0, lam)
            coo.x = np.where(bad, np.inf, lam)
            coo.y = np.where(bad, np.inf, phi)
            return
        # oblique ellipsoidal: seed from the spherical inverse, Newton-iterate
        yr = (y - self.y_shift) / self.y_scale
        bad = x * x + yr * yr > 1 + 1e-11
        coo.set_err(bad, ERR_TOLERANCE_CONDITION)
        lam, phi, _ = self._s_inverse_arrays(x, yr)
        active = np.isfinite(phi) & ~bad
        nonconv = active.copy()
        for _ in range(20):
            if not np.any(active):
                break
            cp = np.cos(phi[active])
            sp = np.sin(phi[active])
            cl = np.cos(lam[active])
            sl = np.sin(lam[active])
            ome = 1.0 - es * sp * sp
            nu = 1.0 / np.sqrt(ome)
            xn = nu * cp * sl
            yn = nu * (sp * self.cosph0 - cp * self.sinph0 * cl) + es * (
                self.nu0 * self.sinph0 - nu * sp
            ) * self.cosph0
            rho = (1.0 - es) * nu / ome
            J11 = -rho * sp * sl
            J12 = nu * cp * cl
            J21 = rho * (cp * self.cosph0 + sp * self.sinph0 * cl)
            J22 = nu * self.sinph0 * self.cosph0 * sl
            D = J11 * J22 - J12 * J21
            dx = x[active] - xn
            dy = y[active] - yn
            dphi = (J22 * dx - J12 * dy) / D
            dlam = (-J21 * dx + J11 * dy) / D
            phi[active] = np.clip(phi[active] + dphi, -M_HALFPI, M_HALFPI)
            lam[active] = lam[active] + dlam
            done = (np.abs(dphi) < 1e-12) & (np.abs(dlam) < 1e-12)
            idx = np.flatnonzero(active)
            nonconv[idx[done]] = False
            active[idx[done]] = False
        coo.set_err(nonconv, -53)
        coo.x = np.where(bad, np.inf, lam)
        coo.y = np.where(bad, np.inf, phi)


@register
class Gnom(Operation):
    """Gnomonic (gnom.cpp), sphere only."""

    name = "gnom"
    need_ellps = False

    def setup(self) -> None:
        self.sinph0 = self.cosph0 = 0.0
        t = abs(self.phi0)
        if abs(t - M_HALFPI) < EPS10:
            self.mode = S_POLE if self.phi0 < 0.0 else N_POLE
        elif t < EPS10:
            self.mode = EQUIT
        else:
            self.mode = OBLIQ
            self.sinph0 = math.sin(self.phi0)
            self.cosph0 = math.cos(self.phi0)

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        if self.mode == EQUIT:
            y = cosphi * coslam
        elif self.mode == OBLIQ:
            y = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam
        elif self.mode == S_POLE:
            y = -sinphi
        else:
            y = sinphi
        bad = y <= EPS10
        coo.set_err(bad, ERR_TOLERANCE_CONDITION)
        with np.errstate(divide="ignore", invalid="ignore"):
            f = 1.0 / y
        x = f * cosphi * np.sin(lam)
        if self.mode == EQUIT:
            y2 = f * sinphi
        elif self.mode == OBLIQ:
            y2 = f * (self.cosph0 * sinphi - self.sinph0 * cosphi * coslam)
        elif self.mode == N_POLE:
            y2 = f * cosphi * (-coslam)
        else:
            y2 = f * cosphi * coslam
        coo.x = np.where(bad, np.inf, x)
        coo.y = np.where(bad, np.inf, y2)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x.copy(), coo.y.copy()
        rh = np.hypot(x, y)
        phi = np.arctan(rh)
        sinz = np.sin(phi)
        cosz = np.sqrt(1.0 - sinz * sinz)
        center = np.abs(rh) <= EPS10
        with np.errstate(divide="ignore", invalid="ignore"):
            if self.mode == OBLIQ:
                p = cosz * self.sinph0 + y * sinz * self.cosph0 / rh
                phi_ = np.where(np.abs(p) >= 1.0, np.where(p > 0, M_HALFPI, -M_HALFPI),
                                np.arcsin(np.clip(p, -1, 1)))
                y = (cosz - self.sinph0 * np.sin(phi_)) * rh
                x = x * sinz * self.cosph0
            elif self.mode == EQUIT:
                p = y * sinz / rh
                phi_ = np.where(np.abs(p) >= 1.0, np.where(p > 0, M_HALFPI, -M_HALFPI),
                                np.arcsin(np.clip(p, -1, 1)))
                y = cosz * rh
                x = x * sinz
            elif self.mode == S_POLE:
                phi_ = phi - M_HALFPI
            else:
                phi_ = M_HALFPI - phi
                y = -y
        lam = np.arctan2(x, y)
        coo.x = np.where(center, 0.0, lam)
        coo.y = np.where(center, self.phi0, phi_)


@register
class Geos(Operation):
    """Geostationary Satellite View (geos.cpp), sphere & ellipsoid."""

    name = "geos"

    def setup(self) -> None:
        from ..core.errors import ERR_INVALID_H, ERR_INVALID_SWEEP_AXIS

        self.h = self.params.float_("h", 0.0)
        sweep = self.params.str_("sweep")
        if sweep is None:
            self.flip_axis = False
        else:
            if sweep not in ("x", "y"):
                raise ProjError(ERR_INVALID_SWEEP_AXIS)
            self.flip_axis = sweep == "x"
        self.radius_g_1 = self.h / self.ell.a
        if self.radius_g_1 <= 0 or self.radius_g_1 > 1e10:
            raise ProjError(ERR_INVALID_H)
        self.radius_g = 1.0 + self.radius_g_1
        self.C = self.radius_g * self.radius_g - 1.0
        self.spherical = self.ell.es == 0.0
        if not self.spherical:
            self.radius_p = math.sqrt(self.ell.one_es)
            self.radius_p2 = self.ell.one_es
            self.radius_p_inv2 = self.ell.rone_es
        else:
            self.radius_p = self.radius_p2 = self.radius_p_inv2 = 1.0

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        if self.spherical:
            tmp = np.cos(phi)
            Vx = np.cos(lam) * tmp
            Vy = np.sin(lam) * tmp
            Vz = np.sin(phi)
        else:
            phi_c = np.arctan(self.radius_p2 * np.tan(phi))
            r = self.radius_p / np.hypot(self.radius_p * np.cos(phi_c), np.sin(phi_c))
            Vx = r * np.cos(lam) * np.cos(phi_c)
            Vy = r * np.sin(lam) * np.cos(phi_c)
            Vz = r * np.sin(phi_c)
            hidden = ((self.radius_g - Vx) * Vx - Vy * Vy - Vz * Vz * self.radius_p_inv2) < 0.0
            coo.set_err(hidden, ERR_TOLERANCE_CONDITION)
        tmp = self.radius_g - Vx
        with np.errstate(divide="ignore", invalid="ignore"):
            if self.flip_axis:
                x = self.radius_g_1 * np.arctan(Vy / np.hypot(Vz, tmp))
                y = self.radius_g_1 * np.arctan(Vz / tmp)
            else:
                x = self.radius_g_1 * np.arctan(Vy / tmp)
                y = self.radius_g_1 * np.arctan(Vz / np.hypot(Vy, tmp))
        coo.x, coo.y = x, y

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        Vx = -1.0
        if self.flip_axis:
            Vz = np.tan(y / self.radius_g_1)
            Vy = np.tan(x / self.radius_g_1) * np.hypot(1.0, Vz)
        else:
            Vy = np.tan(x / self.radius_g_1)
            Vz = np.tan(y / self.radius_g_1) * np.hypot(1.0, Vy)
        if self.spherical:
            a = Vy * Vy + Vz * Vz + 1.0
        else:
            az = Vz / self.radius_p
            a = Vy * Vy + az * az + 1.0
        b = 2 * self.radius_g * Vx
        det = b * b - 4 * a * self.C
        bad = det < 0.0
        coo.set_err(bad, ERR_TOLERANCE_CONDITION)
        with np.errstate(invalid="ignore"):
            k = (-b - np.sqrt(np.maximum(det, 0.0))) / (2.0 * a)
        Vx2 = self.radius_g + k * Vx
        Vy = Vy * k
        Vz = Vz * k
        lam = np.arctan2(Vy, Vx2)
        phi = np.arctan(Vz * np.cos(lam) / Vx2)
        if not self.spherical:
            phi = np.arctan(self.radius_p_inv2 * np.tan(phi))
        coo.x = np.where(bad, np.inf, lam)
        coo.y = np.where(bad, np.inf, phi)
