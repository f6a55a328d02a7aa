"""Additional projections: wink1, wink2, bertin1953, ccon, lcca, airy,
gstmerc, calcofi.

Math re-derived from the same-named files under
/root/reference/src/projections/ (see per-class docstrings).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import DEG_TO_RAD, M_FORTPI, M_HALFPI, M_PI, RAD_TO_DEG
from ..core.errors import (
    ERR_LAT1_IS_ZERO,
    ERR_LAT_0_IS_ZERO,
    ERR_TOLERANCE_CONDITION,
    ProjError,
)
from ..core.op import IO_PROJECTED, Coords, Operation
from ..mathx import adjlon, enfn, inv_mlfn, mlfn, phi2, tsfn
from ._geninv import generic_inverse_2d
from .pseudocyl import _spherify
from . import register

M_TWO_D_PI = 2.0 / M_PI


@register
class Wink1(Operation):
    """Winkel I (wink1.cpp): x = λ(cosφ₁+cosφ)/2, y = φ."""

    name = "wink1"
    need_ellps = False

    def setup(self) -> None:
        _spherify(self)
        self.cosphi1 = math.cos(self.params.rad("lat_ts", 0.0))

    def _fwd(self, coo: Coords) -> None:
        coo.x = 0.5 * coo.x * (self.cosphi1 + np.cos(coo.y))

    def _inv(self, coo: Coords) -> None:
        phi = coo.y
        coo.x = 2.0 * coo.x / (self.cosphi1 + np.cos(phi))
        coo.y = phi


@register
class Wink2(Operation):
    """Winkel II (wink2.cpp): mollweide-style Newton for the auxiliary
    latitude, inverse via the generic 2D Newton."""

    name = "wink2"
    need_ellps = False

    def setup(self) -> None:
        _spherify(self)
        self.cosphi1 = math.cos(self.params.rad("lat_1", 0.0))

    def _fwd_arrays(self, lam, phi0):
        y0 = phi0 * M_TWO_D_PI
        k = M_PI * np.sin(phi0)
        phi = phi0 * 1.8
        active = np.isfinite(phi)
        for _ in range(10):
            if not np.any(active):
                break
            V = np.where(active,
                         (phi + np.sin(phi) - k) / (1.0 + np.cos(phi)), 0.0)
            phi = phi - V
            active = active & ~(np.abs(V) < 1e-7)
        # lanes still active after 10 iterations pin to ±π/2; converged
        # lanes halve (wink2.cpp:41-46)
        phi = np.where(active, np.where(phi < 0, -M_HALFPI, M_HALFPI), phi * 0.5)
        x = 0.5 * lam * (np.cos(phi) + self.cosphi1)
        y = M_FORTPI * (np.sin(phi) + y0)
        return x, y

    def _fwd(self, coo: Coords) -> None:
        coo.x, coo.y = self._fwd_arrays(coo.x, coo.y)

    def _inv(self, coo: Coords) -> None:
        X, Y = coo.x, coo.y
        lam, phi, conv = generic_inverse_2d(self._fwd_arrays, X, Y, X, Y)
        coo.set_err(~conv & np.isfinite(X), -53)
        coo.x, coo.y = lam, phi


@register
class Bertin1953(Operation):
    """Bertin 1953 (bertin1953.cpp): hard-wired oblique rotation
    (φ₀=−42°, λ shift −16.5°) + Hammer-like warp. Forward only."""

    name = "bertin1953"
    need_ellps = False
    has_inverse = False

    def setup(self) -> None:
        _spherify(self)
        self.lam0 = 0.0  # the reference stomps lam0/phi0 (bertin1953.cpp:106)
        phi0 = -42.0 * DEG_TO_RAD
        self.cos_dphi = math.cos(phi0)
        self.sin_dphi = math.sin(phi0)

    def _fwd(self, coo: Coords) -> None:
        fu, k, w = 1.4, 12.0, 1.68
        lam = coo.x + DEG_TO_RAD * -16.5
        phi = coo.y
        cosphi = np.cos(phi)
        x = np.cos(lam) * cosphi
        y = np.sin(lam) * cosphi
        z = np.sin(phi)
        z0 = z * self.cos_dphi + x * self.sin_dphi
        lam = np.arctan2(y, x * self.cos_dphi - z * self.sin_dphi)
        phi = np.arcsin(np.clip(z0, -1.0, 1.0))
        lam = adjlon(lam)
        cond = lam + phi < -fu
        d = np.where(cond, (lam - phi + 1.6) * (lam + phi + fu) / 8.0, 0.0)
        lam = lam + np.where(cond, d, 0.0)
        phi = phi - np.where(cond, 0.8 * d * np.sin(phi + M_PI / 2.0), 0.0)
        cosphi = np.cos(phi)
        d = np.sqrt(2.0 / (1.0 + cosphi * np.cos(lam / 2.0)))
        x_out = w * d * cosphi * np.sin(lam / 2.0)
        y_out = d * np.sin(phi)
        d = (1.0 - np.cos(lam * phi)) / k
        x_out = np.where(y_out < 0.0, x_out * (1.0 + d), x_out)
        y_out = np.where(y_out > 0.0, y_out * (1.0 + d / 1.5 * x_out * x_out), y_out)
        coo.x, coo.y = x_out, y_out


@register
class Ccon(Operation):
    """Central Conic (ccon.cpp): perspective conic on the sphere."""

    name = "ccon"
    need_ellps = False

    def setup(self) -> None:
        _spherify(self)
        phi1 = self.params.rad("lat_1", 0.0)
        if abs(phi1) < 1e-10:
            raise ProjError(ERR_LAT1_IS_ZERO, "ccon: |lat_1| < eps")
        self.phi1 = phi1
        self.sinphi1 = math.sin(phi1)
        self.ctgphi1 = math.cos(phi1) / self.sinphi1

    def _fwd(self, coo: Coords) -> None:
        r = self.ctgphi1 - np.tan(coo.y - self.phi1)
        a = coo.x * self.sinphi1
        coo.x = r * np.sin(a)
        coo.y = self.ctgphi1 - r * np.cos(a)

    def _inv(self, coo: Coords) -> None:
        x = coo.x
        y = self.ctgphi1 - coo.y
        coo.y = self.phi1 - np.arctan(np.hypot(x, y) - self.ctgphi1)
        coo.x = np.arctan2(x, y) / self.sinphi1


@register
class Lcca(Operation):
    """Lambert Conformal Conic Alternative (lcca.cpp)."""

    name = "lcca"
    need_ellps = True

    def setup(self) -> None:
        p0 = self.phi0
        if p0 == 0.0:
            raise ProjError(ERR_LAT_0_IS_ZERO, "lcca: lat_0 is zero")
        self.en = enfn(self.ell.es)
        self.l = math.sin(p0)
        self.M0 = float(mlfn(np.array([p0]), np.array([self.l]),
                             np.array([math.cos(p0)]), self.en)[0])
        s2p0 = self.l * self.l
        R0 = 1.0 / (1.0 - self.ell.es * s2p0)
        N0 = math.sqrt(R0)
        R0 *= self.ell.one_es * N0
        tan0 = math.tan(p0)
        self.r0 = N0 / tan0
        self.C = 1.0 / (6.0 * R0 * N0)

    @staticmethod
    def _fS(S, C):
        return S * (1.0 + S * S * C)

    @staticmethod
    def _fSp(S, C):
        return 1.0 + 3.0 * S * S * C

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        S = mlfn(phi, np.sin(phi), np.cos(phi), self.en) - self.M0
        dr = self._fS(S, self.C)
        r = self.r0 - dr
        lam_l = lam * self.l
        coo.x = self.k0 * (r * np.sin(lam_l))
        coo.y = self.k0 * (self.r0 - r * np.cos(lam_l))

    def _inv(self, coo: Coords) -> None:
        x = coo.x / self.k0
        y = coo.y / self.k0
        theta = np.arctan2(x, self.r0 - y)
        dr = y - x * np.tan(0.5 * theta)
        lam = theta / self.l
        S = dr.copy()
        nonconv = np.isfinite(S)
        for _ in range(10):
            dif = (self._fS(S, self.C) - dr) / self._fSp(S, self.C)
            S = S - dif
            done = np.abs(dif) < 1e-12
            nonconv = nonconv & ~done
            if not np.any(nonconv):
                break
        coo.set_err(nonconv & np.isfinite(x), ERR_TOLERANCE_CONDITION)
        phi = inv_mlfn(S + self.M0, self.ell.es, self.en)[0]
        coo.x = np.where(nonconv, np.inf, lam)
        coo.y = np.where(nonconv, np.inf, phi)


@register
class Airy(Operation):
    """Airy minimum-error azimuthal (airy.cpp). Forward only."""

    name = "airy"
    need_ellps = False
    has_inverse = False
    EPS = 1e-10

    def setup(self) -> None:
        _spherify(self)
        self.no_cut = self.params.bool_("no_cut", False)
        beta = 0.5 * (M_HALFPI - self.params.rad("lat_b", 0.0))
        if abs(beta) < self.EPS:
            self.Cb = -0.5
        else:
            Cb = 1.0 / math.tan(beta)
            self.Cb = Cb * Cb * math.log(math.cos(beta))
        p0 = self.phi0
        if abs(abs(p0) - M_HALFPI) < self.EPS:
            self.mode = "s_pole" if p0 < 0 else "n_pole"
            self.p_halfpi = -M_HALFPI if p0 < 0 else M_HALFPI
        elif abs(p0) < self.EPS:
            self.mode = "equit"
        else:
            self.mode = "obliq"
            self.sinph0 = math.sin(p0)
            self.cosph0 = math.cos(p0)

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        sinlam = np.sin(lam)
        coslam = np.cos(lam)
        err = np.zeros(lam.shape, dtype=bool)
        if self.mode in ("equit", "obliq"):
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            cosz = cosphi * coslam
            if self.mode == "obliq":
                cosz = self.sinph0 * sinphi + self.cosph0 * cosz
            if not self.no_cut:
                err |= cosz < -self.EPS
            s = 1.0 - cosz
            t = 0.5 * (1.0 + cosz)
            err |= (np.abs(s) > self.EPS) & (t == 0)
            with np.errstate(divide="ignore", invalid="ignore"):
                Krho = np.where(
                    np.abs(s) > self.EPS,
                    -np.log(np.where(t > 0, t, 1.0)) / np.where(s != 0, s, 1.0)
                    - self.Cb / np.where(t > 0, t, 1.0),
                    0.5 - self.Cb,
                )
            x = Krho * cosphi * sinlam
            if self.mode == "obliq":
                y = Krho * (self.cosph0 * sinphi - self.sinph0 * cosphi * coslam)
            else:
                y = Krho * sinphi
        else:
            phi_ = np.abs(self.p_halfpi - phi)
            if not self.no_cut:
                err |= (phi_ - self.EPS) > M_HALFPI
            phi_ = phi_ * 0.5
            big = phi_ > self.EPS
            t = np.tan(np.where(big, phi_, 1.0))
            with np.errstate(divide="ignore", invalid="ignore"):
                Krho = -2.0 * (np.log(np.cos(phi_)) / t + t * self.Cb)
            x = np.where(big, Krho * sinlam, 0.0)
            y = np.where(big, Krho * coslam, 0.0)
            if self.mode == "n_pole":
                y = -y
        coo.set_err(err, ERR_TOLERANCE_CONDITION)
        coo.x = np.where(err, np.inf, x)
        coo.y = np.where(err, np.inf, y)


@register
class Gstmerc(Operation):
    """Gauss-Schreiber Transverse Mercator (gstmerc.cpp)."""

    name = "gstmerc"
    need_ellps = True

    def setup(self) -> None:
        es, e = self.ell.es, self.ell.e
        p0 = self.phi0
        self.n1 = math.sqrt(1.0 + es * math.cos(p0) ** 4 / (1.0 - es))
        self.phic = math.asin(math.sin(p0) / self.n1)
        self.c = (math.log(float(tsfn(np.array([-self.phic]), np.array([0.0]), 0.0)[0]))
                  - self.n1 * math.log(float(tsfn(np.array([-p0]),
                                                  np.array([-math.sin(p0)]), e)[0])))
        self.n2 = (self.k0 * self.ell.a * math.sqrt(1.0 - es)
                   / (1.0 - es * math.sin(p0) ** 2))
        self.XS = 0.0
        self.YS = -self.n2 * self.phic

    def _fwd(self, coo: Coords) -> None:
        e, a = self.ell.e, self.ell.a
        lam, phi = coo.x, coo.y
        L = self.n1 * lam
        Ls = self.c + self.n1 * np.log(tsfn(-phi, -np.sin(phi), e))
        sinLs1 = np.sin(L) / np.cosh(Ls)
        Ls1 = np.log(tsfn(-np.arcsin(sinLs1), np.zeros_like(lam), 0.0))
        coo.x = (self.XS + self.n2 * Ls1) / a
        coo.y = (self.YS + self.n2 * np.arctan(np.sinh(Ls) / np.cos(L))) / a

    def _inv(self, coo: Coords) -> None:
        e, a = self.ell.e, self.ell.a
        x = coo.x * a - self.XS
        y = coo.y * a - self.YS
        L = np.arctan(np.sinh(x / self.n2) / np.cos(y / self.n2))
        sinC = np.sin(y / self.n2) / np.cosh(x / self.n2)
        LC = np.log(tsfn(-np.arcsin(sinC), np.zeros_like(x), 0.0))
        coo.x = L / self.n1
        coo.y = -phi2(np.exp((LC - self.c) / self.n1), e)[0]


@register
class Calcofi(Operation):
    """CalCOFI line/station grid (calcofi.cpp). Output is line/station
    numbers — the reference forces a=1, x0=y0=0 so no unit scaling."""

    name = "calcofi"
    need_ellps = True

    EPS10 = 1e-10
    DEG_TO_LINE = 5
    DEG_TO_STATION = 15
    LINE_TO_RAD = 0.0034906585039886592
    STATION_TO_RAD = 0.0011635528346628863
    PT_O_LINE = 80
    PT_O_STATION = 60
    PT_O_LAMBDA = -2.1144663887911301
    PT_O_PHI = 0.59602993955606354
    ROT = 0.52359877559829882

    def setup(self) -> None:
        # the reference stomps lam0/a/x0/y0 and sets +over so xy stays
        # consistent with reference point O (calcofi.cpp:150-157)
        self.right = IO_PROJECTED
        self.x0 = 0.0
        self.y0 = 0.0
        self.lam0 = 0.0
        self.over = True

    def _mercator_y(self, phi):
        if self.ell.es != 0.0:
            return -np.log(tsfn(phi, np.sin(phi), self.ell.e))
        return np.log(np.tan(M_FORTPI + 0.5 * phi))

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        err = np.abs(np.abs(phi) - M_HALFPI) <= self.EPS10
        coo.set_err(err, ERR_TOLERANCE_CONDITION)
        y = self._mercator_y(phi)
        oy = float(self._mercator_y(np.array([self.PT_O_PHI]))[0])
        l1 = (y - oy) * math.tan(self.ROT)
        l2 = -lam - l1 + self.PT_O_LAMBDA
        ry = l2 * math.cos(self.ROT) * math.sin(self.ROT) + y
        if self.ell.es != 0.0:
            ry = phi2(np.exp(-ry), self.ell.e)[0]
        else:
            ry = M_HALFPI - 2.0 * np.arctan(np.exp(-ry))
        x_out = self.PT_O_LINE - RAD_TO_DEG * (
            ry - self.PT_O_PHI) * self.DEG_TO_LINE / math.cos(self.ROT)
        y_out = self.PT_O_STATION + RAD_TO_DEG * (
            ry - phi) * self.DEG_TO_STATION / math.sin(self.ROT)
        coo.x = np.where(err, np.inf, x_out)
        coo.y = np.where(err, np.inf, y_out)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        ry = self.PT_O_PHI - self.LINE_TO_RAD * (x - self.PT_O_LINE) * math.cos(self.ROT)
        phi = ry - self.STATION_TO_RAD * (y - self.PT_O_STATION) * math.sin(self.ROT)
        oy = float(self._mercator_y(np.array([self.PT_O_PHI]))[0])
        rym = self._mercator_y(ry)
        xym = self._mercator_y(phi)
        l1 = (xym - oy) * math.tan(self.ROT)
        l2 = (rym - xym) / (math.cos(self.ROT) * math.sin(self.ROT))
        coo.x = self.PT_O_LAMBDA - (l1 + l2)
        coo.y = phi


@register
class Qsc(Operation):
    """Quadrilateralized Spherical Cube (qsc.cpp): cube-face projection
    used for planetary / cosmology grids; face chosen from lon_0/lat_0,
    per-quadrant area handling vectorized with masks."""

    name = "qsc"
    need_ellps = True
    EPS10 = 1e-10

    FACE_FRONT, FACE_RIGHT, FACE_BACK, FACE_LEFT, FACE_TOP, FACE_BOTTOM = range(6)

    def setup(self) -> None:
        p0, l0 = self.phi0, self.lam0
        if p0 >= M_HALFPI - M_FORTPI / 2.0:
            self.face = self.FACE_TOP
        elif p0 <= -(M_HALFPI - M_FORTPI / 2.0):
            self.face = self.FACE_BOTTOM
        elif abs(l0) <= M_FORTPI:
            self.face = self.FACE_FRONT
        elif abs(l0) <= M_HALFPI + M_FORTPI:
            self.face = self.FACE_RIGHT if l0 > 0 else self.FACE_LEFT
        else:
            self.face = self.FACE_BACK
        a = self.ell.a
        self.b = a * math.sqrt(1.0 - self.ell.es)
        self.one_minus_f = 1.0 - (a - self.b) / a
        self.one_minus_f_squared = self.one_minus_f ** 2

    @staticmethod
    def _shift_lon(lon, offset):
        slon = lon + offset
        slon = np.where(slon < -M_PI, slon + 2 * M_PI, slon)
        slon = np.where(slon > M_PI, slon - 2 * M_PI, slon)
        return slon

    @staticmethod
    def _equat_face_theta(phi, y, x):
        """qsc_fwd_equat_face_theta, vectorized → (theta, area)."""
        theta = np.arctan2(y, x)
        area = np.zeros(phi.shape, dtype=np.int8)
        t = theta
        a1 = (t > M_FORTPI) & (t <= M_HALFPI + M_FORTPI)
        a2 = (t > M_HALFPI + M_FORTPI) | (t <= -(M_HALFPI + M_FORTPI))
        a0 = np.abs(t) <= M_FORTPI
        a3 = ~(a0 | a1 | a2)
        area[a1] = 1
        area[a2] = 2
        area[a3] = 3
        theta = np.where(a1, t - M_HALFPI, theta)
        theta = np.where(a2, np.where(t >= 0, t - M_PI, t + M_PI), theta)
        theta = np.where(a3, t + M_HALFPI, theta)
        small = phi < Qsc.EPS10
        theta = np.where(small, 0.0, theta)
        area = np.where(small, 0, area)
        return theta, area

    def _fwd(self, coo: Coords) -> None:
        lam, lat = coo.x, coo.y
        if self.ell.es != 0.0:
            lat = np.arctan(self.one_minus_f_squared * np.tan(lat))
        lon = lam
        F = self.face
        if F == self.FACE_TOP:
            phi = M_HALFPI - lat
            in0 = (lon >= M_FORTPI) & (lon <= M_HALFPI + M_FORTPI)
            in1 = (lon > M_HALFPI + M_FORTPI) | (lon <= -(M_HALFPI + M_FORTPI))
            in2 = (lon > -(M_HALFPI + M_FORTPI)) & (lon <= -M_FORTPI)
            area = np.where(in0, 0, np.where(in1, 1, np.where(in2, 2, 3))).astype(np.int8)
            theta = np.where(in0, lon - M_HALFPI,
                             np.where(in1, np.where(lon > 0, lon - M_PI, lon + M_PI),
                                      np.where(in2, lon + M_HALFPI, lon)))
        elif F == self.FACE_BOTTOM:
            phi = M_HALFPI + lat
            in0 = (lon >= M_FORTPI) & (lon <= M_HALFPI + M_FORTPI)
            in1 = (lon < M_FORTPI) & (lon >= -M_FORTPI)
            in2 = (lon < -M_FORTPI) & (lon >= -(M_HALFPI + M_FORTPI))
            area = np.where(in0, 0, np.where(in1, 1, np.where(in2, 2, 3))).astype(np.int8)
            theta = np.where(in0, -lon + M_HALFPI,
                             np.where(in1, -lon,
                                      np.where(in2, -lon - M_HALFPI,
                                               np.where(lon > 0, -lon + M_PI, -lon - M_PI))))
        else:
            if F == self.FACE_RIGHT:
                lon = self._shift_lon(lon, M_HALFPI)
            elif F == self.FACE_BACK:
                lon = self._shift_lon(lon, M_PI)
            elif F == self.FACE_LEFT:
                lon = self._shift_lon(lon, -M_HALFPI)
            sinlat, coslat = np.sin(lat), np.cos(lat)
            sinlon, coslon = np.sin(lon), np.cos(lon)
            q = coslat * coslon
            r = coslat * sinlon
            s = sinlat
            if F == self.FACE_FRONT:
                phi = np.arccos(np.clip(q, -1, 1))
                theta, area = self._equat_face_theta(phi, s, r)
            elif F == self.FACE_RIGHT:
                phi = np.arccos(np.clip(r, -1, 1))
                theta, area = self._equat_face_theta(phi, s, -q)
            elif F == self.FACE_BACK:
                phi = np.arccos(np.clip(-q, -1, 1))
                theta, area = self._equat_face_theta(phi, s, -r)
            else:  # LEFT
                phi = np.arccos(np.clip(-r, -1, 1))
                theta, area = self._equat_face_theta(phi, s, q)
        mu = np.arctan((12.0 / M_PI) * (
            theta + np.arccos(np.clip(np.sin(theta) * math.cos(M_FORTPI), -1, 1))
            - M_HALFPI))
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.sqrt(np.maximum(
                (1.0 - np.cos(phi))
                / (np.cos(mu) ** 2)
                / (1.0 - np.cos(np.arctan(1.0 / np.cos(theta)))), 0.0))
        mu = mu + np.where(area == 1, M_HALFPI,
                           np.where(area == 2, M_PI,
                                    np.where(area == 3, M_PI + M_HALFPI, 0.0)))
        coo.x = t * np.cos(mu)
        coo.y = t * np.sin(mu)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        nu = np.arctan(np.hypot(x, y))
        mu = np.arctan2(y, x)
        a0 = (x >= 0.0) & (x >= np.abs(y))
        a1 = ~a0 & (y >= 0.0) & (y >= np.abs(x))
        a2 = ~a0 & ~a1 & (x < 0.0) & (-x >= np.abs(y))
        a3 = ~(a0 | a1 | a2)
        area = np.where(a0, 0, np.where(a1, 1, np.where(a2, 2, 3))).astype(np.int8)
        mu = np.where(a1, mu - M_HALFPI, mu)
        mu = np.where(a2, np.where(mu < 0, mu + M_PI, mu - M_PI), mu)
        mu = np.where(a3, mu + M_HALFPI, mu)
        t = (M_PI / 12.0) * np.tan(mu)
        tantheta = np.sin(t) / (np.cos(t) - 1.0 / math.sqrt(2.0))
        theta = np.arctan(tantheta)
        cosmu = np.cos(mu)
        tannu = np.tan(nu)
        cosphi = 1.0 - cosmu * cosmu * tannu * tannu * (
            1.0 - np.cos(np.arctan(1.0 / np.cos(theta))))
        cosphi = np.clip(cosphi, -1.0, 1.0)
        F = self.face
        if F == self.FACE_TOP:
            phi = np.arccos(cosphi)
            lp_phi = M_HALFPI - phi
            lp_lam = np.where(area == 0, theta + M_HALFPI,
                              np.where(area == 1,
                                       np.where(theta < 0, theta + M_PI, theta - M_PI),
                                       np.where(area == 2, theta - M_HALFPI, theta)))
        elif F == self.FACE_BOTTOM:
            phi = np.arccos(cosphi)
            lp_phi = phi - M_HALFPI
            lp_lam = np.where(area == 0, -theta + M_HALFPI,
                              np.where(area == 1, -theta,
                                       np.where(area == 2, -theta - M_HALFPI,
                                                np.where(theta < 0, -theta - M_PI,
                                                         -theta + M_PI))))
        else:
            q = cosphi
            tt = q * q
            s = np.where(tt >= 1.0, 0.0, np.sqrt(np.maximum(1.0 - tt, 0)) * np.sin(theta))
            tt = tt + s * s
            r = np.where(tt >= 1.0, 0.0, np.sqrt(np.maximum(1.0 - tt, 0)))
            r2 = np.where(a1, -s, np.where(a2, -r, np.where(a3, s, r)))
            s2 = np.where(a1, r, np.where(a2, -s, np.where(a3, -r, s)))
            q2, r3 = q, r2
            if F == self.FACE_RIGHT:
                q2, r3 = -r2, q * np.ones_like(r2)
            elif F == self.FACE_BACK:
                q2, r3 = -q * np.ones_like(r2), -r2
            elif F == self.FACE_LEFT:
                q2, r3 = r2, -q * np.ones_like(r2)
            lp_phi = np.arccos(np.clip(-s2, -1, 1)) - M_HALFPI
            lp_lam = np.arctan2(r3, q2)
            if F == self.FACE_RIGHT:
                lp_lam = self._shift_lon(lp_lam, -M_HALFPI)
            elif F == self.FACE_BACK:
                lp_lam = self._shift_lon(lp_lam, -M_PI)
            elif F == self.FACE_LEFT:
                lp_lam = self._shift_lon(lp_lam, M_HALFPI)
        if self.ell.es != 0.0:
            a = self.ell.a
            invert = lp_phi < 0.0
            tanphi = np.tan(lp_phi)
            xa = self.b / np.sqrt(tanphi * tanphi + self.one_minus_f_squared)
            lp_phi = np.arctan(np.sqrt(np.maximum(a * a - xa * xa, 0.0))
                               / (self.one_minus_f * xa))
            lp_phi = np.where(invert, -lp_phi, lp_phi)
        coo.x, coo.y = lp_lam, lp_phi


@register
class ImwP(Operation):
    """International Map of the World Polyconic (imw_p.cpp): two-point
    modified polyconic; inverse is the reference's alternating secant /
    scaling iteration, vectorized with masks."""

    name = "imw_p"
    need_ellps = True
    TOL = 1e-10

    def setup(self) -> None:
        from ..core.errors import ERR_ABS_LAT1_EQ_ABS_LAT2, ERR_LAT_1_2_UNSPECIFIED

        p = self.params
        self.en = enfn(self.ell.es)
        if not (p.has("lat_1") and p.has("lat_2")):
            raise ProjError(ERR_LAT_1_2_UNSPECIFIED, "imw_p: lat_1/lat_2 required")
        phi_1 = p.rad("lat_1")
        phi_2 = p.rad("lat_2")
        delta = 0.5 * (phi_2 - phi_1)
        sig = 0.5 * (phi_2 + phi_1)
        if abs(delta) < 1e-10 or abs(sig) < 1e-10:
            raise ProjError(ERR_ABS_LAT1_EQ_ABS_LAT2, "imw_p: |lat_1| == |lat_2|")
        if phi_2 < phi_1:
            phi_1, phi_2 = phi_2, phi_1
        self.phi_1, self.phi_2 = phi_1, phi_2
        if p.has("lon_1"):
            self.lam_1 = p.rad("lon_1")
        else:
            s = abs(sig * RAD_TO_DEG)
            s = 2.0 if s <= 60 else (4.0 if s <= 76 else 8.0)
            self.lam_1 = s * DEG_TO_RAD
        self.mode = 0
        self.sphi_1 = self.R_1 = 0.0
        self.sphi_2 = self.R_2 = 0.0
        if phi_1 != 0.0:
            x1, y1 = self._anchor(phi_1, 1)
        else:
            self.mode = 1  # PHI_1_IS_ZERO
            x1, y1 = self.lam_1, 0.0
        if phi_2 != 0.0:
            x2, T2 = self._anchor(phi_2, 2)
        else:
            self.mode = -1  # PHI_2_IS_ZERO
            x2, T2 = self.lam_1, 0.0
        m1 = float(mlfn(np.array([phi_1]), np.array([self.sphi_1]),
                        np.array([math.cos(phi_1)]), self.en)[0])
        m2 = float(mlfn(np.array([phi_2]), np.array([self.sphi_2]),
                        np.array([math.cos(phi_2)]), self.en)[0])
        t = m2 - m1
        s = x2 - x1
        y2 = math.sqrt(t * t - s * s) + y1
        self.C2 = y2 - T2
        t = 1.0 / t
        self.Pc = (m2 * y1 - m1 * y2) * t
        self.Qc = (y2 - y1) * t
        self.Pp = (m2 * x1 - m1 * x2) * t
        self.Qp = (x2 - x1) * t

    def _anchor(self, phi, which):
        sp = math.sin(phi)
        R = 1.0 / (math.tan(phi) * math.sqrt(1.0 - self.ell.es * sp * sp))
        F = self.lam_1 * sp
        if which == 1:
            self.sphi_1, self.R_1 = sp, R
        else:
            self.sphi_2, self.R_2 = sp, R
        return R * math.sin(F), R * (1.0 - math.cos(F))

    def _loc_for(self, lam, phi):
        """loc_for (imw_p.cpp:47-92), vectorized. Returns (x, y, yc)."""
        es = self.ell.es
        zero = phi == 0.0
        sp = np.sin(phi)
        m = mlfn(phi, sp, np.cos(phi), self.en)
        xa = self.Pp + self.Qp * m
        ya = self.Pc + self.Qc * m
        with np.errstate(divide="ignore", invalid="ignore"):
            R = 1.0 / (np.tan(phi) * np.sqrt(1.0 - es * sp * sp))
        C = np.sqrt(np.maximum(R * R - xa * xa, 0.0))
        C = np.where(phi < 0.0, -C, C)
        C = C + ya - R
        if self.mode == -1:
            xb = lam
            yb = np.full_like(lam, self.C2)
        else:
            t = lam * self.sphi_2
            xb = self.R_2 * np.sin(t)
            yb = self.C2 + self.R_2 * (1.0 - np.cos(t))
        if self.mode == 1:
            xc = lam
            yc = np.zeros_like(lam)
        else:
            t = lam * self.sphi_1
            xc = self.R_1 * np.sin(t)
            yc = self.R_1 * (1.0 - np.cos(t))
        with np.errstate(divide="ignore", invalid="ignore"):
            D = (xb - xc) / (yb - yc)
        B = xc + D * (C + R - yc)
        x = D * np.sqrt(np.maximum(R * R * (1 + D * D) - B * B, 0.0))
        x = np.where(phi > 0, -x, x)
        x = (B + x) / (1.0 + D * D)
        y = np.sqrt(np.maximum(R * R - x * x, 0.0))
        y = np.where(phi > 0, -y, y)
        y = y + C + R
        x = np.where(zero, lam, x)
        y = np.where(zero, 0.0, y)
        yc = np.where(zero, 0.0, yc)
        return x, y, yc

    def _fwd(self, coo: Coords) -> None:
        x, y, _ = self._loc_for(coo.x, coo.y)
        coo.x, coo.y = x, y

    def _inv(self, coo: Coords) -> None:
        from ..core.errors import ERR_NON_CONVERGENT

        X, Y = coo.x, coo.y
        phi = np.full_like(X, self.phi_2)
        lam = X / math.cos(self.phi_2)
        active = np.isfinite(X) & np.isfinite(Y)
        err = np.zeros_like(active)
        for _ in range(1000):
            if not np.any(active):
                break
            tx, ty, yc = self._loc_for(lam[active], phi[active])
            denom = ty - yc
            y_mis = np.abs(ty - Y[active]) > self.TOL
            x_mis = np.abs(tx - X[active]) > self.TOL
            blow = (denom == 0) & y_mis
            upd_phi = (denom != 0) | y_mis
            with np.errstate(divide="ignore", invalid="ignore"):
                new_phi = ((phi[active] - self.phi_1) * (Y[active] - yc)
                           / np.where(denom != 0, denom, 1.0)) + self.phi_1
            pa = phi[active]
            pa = np.where(upd_phi & (denom != 0), new_phi, pa)
            phi[active] = pa
            la = lam[active]
            with np.errstate(divide="ignore", invalid="ignore"):
                la = np.where((tx != 0) & x_mis, la * X[active] / np.where(tx != 0, tx, 1.0), la)
            lam[active] = la
            done = ~(x_mis | y_mis)
            idx = np.flatnonzero(active)
            err[idx[blow]] = True
            active[idx[blow | done]] = False
        err |= active  # hit the iteration cap
        coo.set_err(err & np.isfinite(X), ERR_NON_CONVERGENT)
        coo.x = np.where(err, np.inf, lam)
        coo.y = np.where(err, np.inf, phi)


@register
class Bipc(Operation):
    """Bipolar conic of the western hemisphere (bipc.cpp)."""

    name = "bipc"
    need_ellps = False

    EPS10 = 1e-10
    ONEEPS = 1.000000001
    lamB = -0.34894976726250681539
    n_ = 0.63055844881274687180
    F = 1.89724742567461030582
    Azab = 0.81650043674686363166
    Azba = 1.82261843856185925133
    T = 1.27246578267089012270
    rhoc = 1.20709121521568721927
    cAzc = 0.69691523038678375519
    sAzc = 0.71715351331143607555
    C45 = 0.70710678118654752469
    S45 = 0.70710678118654752410
    C20 = 0.93969262078590838411
    S20 = -0.34202014332566873287
    R110 = 1.91986217719376253360
    R104 = 1.81514242207410275904

    def setup(self) -> None:
        _spherify(self)
        self.noskew = self.params.bool_("ns", False)

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        cphi, sphi = np.cos(phi), np.sin(phi)
        sdlam0 = self.lamB - lam
        cdlam = np.cos(sdlam0)
        sdlam = np.sin(sdlam0)
        at_pole = np.abs(np.abs(phi) - M_HALFPI) < self.EPS10
        with np.errstate(divide="ignore", invalid="ignore"):
            tphi = np.where(at_pole, np.inf, sphi / cphi)
        Az = np.where(at_pole, np.where(phi < 0, M_PI, 0.0),
                      np.arctan2(sdlam, self.C45 * (tphi - cdlam)))
        tag = Az > self.Azba
        err = np.zeros(phi.shape, dtype=bool)
        # tag branch (Azab side)
        sdlam_t = np.sin(lam + self.R110)
        cdlam_t = np.cos(lam + self.R110)
        z_t = self.S20 * sphi + self.C20 * cphi * cdlam_t
        err |= tag & (np.abs(z_t) > self.ONEEPS)
        z_t = np.arccos(np.clip(z_t, -1.0, 1.0))
        Az_t = np.where(np.isinf(tphi), Az,
                        np.arctan2(sdlam_t, self.C20 * tphi - self.S20 * cdlam_t))
        # non-tag branch
        z_n = self.S45 * (sphi + cphi * cdlam)
        err |= ~tag & (np.abs(z_n) > self.ONEEPS)
        z_n = np.arccos(np.clip(z_n, -1.0, 1.0))
        z = np.where(tag, z_t, z_n)
        Az = np.where(tag, Az_t, Az)
        Av = np.where(tag, self.Azab, self.Azba)
        y = np.where(tag, self.rhoc, -self.rhoc)
        err |= z < 0.0
        t = np.tan(0.5 * z) ** self.n_
        r = self.F * t
        al = 0.5 * (self.R104 - z)
        err |= al < 0.0
        al_arg = (t + np.abs(al) ** self.n_) / self.T
        err |= np.abs(al_arg) > self.ONEEPS
        al = np.arccos(np.clip(al_arg, -1.0, 1.0))
        tv = self.n_ * (Av - Az)
        shrink = np.abs(tv) < al
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(shrink, r / np.cos(al + np.where(tag, tv, -tv)), r)
        x_out = r * np.sin(tv)
        y_out = y + np.where(tag, -r, r) * np.cos(tv)
        if self.noskew:
            tmp = x_out
            x_out = -x_out * self.cAzc - y_out * self.sAzc
            y_out = -y_out * self.cAzc + tmp * self.sAzc
        coo.set_err(err, ERR_TOLERANCE_CONDITION)
        coo.x = np.where(err, np.inf, x_out)
        coo.y = np.where(err, np.inf, y_out)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x.copy(), coo.y.copy()
        if self.noskew:
            tmp = x.copy()
            x = -tmp * self.cAzc + y * self.sAzc
            y = -y * self.cAzc - tmp * self.sAzc
        neg = x < 0.0
        y = np.where(neg, self.rhoc - y, y + self.rhoc)
        s = np.where(neg, self.S20, self.S45)
        c = np.where(neg, self.C20, self.C45)
        Av = np.where(neg, self.Azab, self.Azba)
        r = np.hypot(x, y)
        rp = r.copy()
        rl = r.copy()
        Az = np.arctan2(x, y)
        fAz = np.abs(Az)
        active = np.isfinite(r)
        conv = np.zeros_like(active)
        z = np.zeros_like(r)
        for _ in range(10):
            if not np.any(active):
                break
            za = 2.0 * np.arctan((r[active] / self.F) ** (1.0 / self.n_))
            al = np.arccos(np.clip(
                (np.tan(0.5 * za) ** self.n_
                 + np.tan(0.5 * (self.R104 - za)) ** self.n_) / self.T, -1.0, 1.0))
            ra = r[active]
            cond = fAz[active] < al
            ra = np.where(cond,
                          rp[active] * np.cos(al + np.where(neg[active],
                                                            Az[active], -Az[active])),
                          ra)
            z[active] = za
            done = np.abs(rl[active] - ra) < 1e-10
            r[active] = ra
            rl[active] = ra
            idx = np.flatnonzero(active)
            conv[idx[done]] = True
            active[idx[done]] = False
        coo.set_err(~conv & np.isfinite(x), ERR_TOLERANCE_CONDITION)
        Az = Av - Az / self.n_
        phi = np.arcsin(np.clip(s * np.cos(z) + c * np.sin(z) * np.cos(Az), -1, 1))
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.arctan2(np.sin(Az), c / np.tan(z) - s * np.cos(Az))
        lam = np.where(neg, lam - self.R110, self.lamB - lam)
        coo.x = np.where(conv, lam, np.inf)
        coo.y = np.where(conv, phi, np.inf)


@register
class Labrd(Operation):
    """Laborde (labrd.cpp) — Madagascar grid: Gauss-sphere conformal +
    cubic skew correction."""

    name = "labrd"
    need_ellps = True

    def setup(self) -> None:
        if self.phi0 == 0.0:
            raise ProjError(ERR_LAT_0_IS_ZERO, "labrd: lat_0 is zero")
        e, es, one_es = self.ell.e, self.ell.es, self.ell.one_es
        Az = self.params.rad("azi", 0.0)
        sinp = math.sin(self.phi0)
        t = 1.0 - es * sinp * sinp
        N = 1.0 / math.sqrt(t)
        R = one_es * N / t
        self.kRg = self.k0 * math.sqrt(N * R)
        self.p0s = math.atan(math.sqrt(R / N) * math.tan(self.phi0))
        self.A = sinp / math.sin(self.p0s)
        t = e * sinp
        self.C = (0.5 * e * self.A * math.log((1.0 + t) / (1.0 - t))
                  - self.A * math.log(math.tan(M_FORTPI + 0.5 * self.phi0))
                  + math.log(math.tan(M_FORTPI + 0.5 * self.p0s)))
        t = Az + Az
        self.Cb = 1.0 / (12.0 * self.kRg * self.kRg)
        self.Ca = (1.0 - math.cos(t)) * self.Cb
        self.Cb *= math.sin(t)
        self.Cc = 3.0 * (self.Ca * self.Ca - self.Cb * self.Cb)
        self.Cd = 6.0 * self.Ca * self.Cb

    def _fwd(self, coo: Coords) -> None:
        e = self.ell.e
        lam, phi = coo.x, coo.y
        V1 = self.A * np.log(np.tan(M_FORTPI + 0.5 * phi))
        t = e * np.sin(phi)
        V2 = 0.5 * e * self.A * np.log((1.0 + t) / (1.0 - t))
        ps = 2.0 * (np.arctan(np.exp(V1 - V2 + self.C)) - M_FORTPI)
        I1 = ps - self.p0s
        cosps = np.cos(ps)
        cosps2 = cosps * cosps
        sinps = np.sin(ps)
        sinps2 = sinps * sinps
        I4 = self.A * cosps
        I2 = 0.5 * self.A * I4 * sinps
        I3 = I2 * self.A * self.A * (5.0 * cosps2 - sinps2) / 12.0
        I6 = I4 * self.A * self.A
        I5 = I6 * (cosps2 - sinps2) / 6.0
        I6 = I6 * self.A * self.A * (
            5.0 * cosps2 * cosps2 + sinps2 * (sinps2 - 18.0 * cosps2)) / 120.0
        t = lam * lam
        x = self.kRg * lam * (I4 + t * (I5 + t * I6))
        y = self.kRg * (I1 + t * (I2 + t * I3))
        x2 = x * x
        y2 = y * y
        V1 = 3.0 * x * y2 - x * x2
        V2 = y * y2 - 3.0 * x2 * y
        coo.x = x + self.Ca * V1 + self.Cb * V2
        coo.y = y + self.Ca * V2 - self.Cb * V1

    def _inv(self, coo: Coords) -> None:
        e, es, one_es = self.ell.e, self.ell.es, self.ell.one_es
        x, y = coo.x.copy(), coo.y.copy()
        x2 = x * x
        y2 = y * y
        V1 = 3.0 * x * y2 - x * x2
        V2 = y * y2 - 3.0 * x2 * y
        V3 = x * (5.0 * y2 * y2 + x2 * (-10.0 * y2 + x2))
        V4 = y * (5.0 * x2 * x2 + y2 * (-10.0 * x2 + y2))
        x = x - self.Ca * V1 - self.Cb * V2 + self.Cc * V3 + self.Cd * V4
        y = y + self.Cb * V1 - self.Ca * V2 - self.Cd * V3 + self.Cc * V4
        ps = self.p0s + y / self.kRg
        pe = ps + self.phi0 - self.p0s
        active = np.isfinite(pe)
        for _ in range(20):
            if not np.any(active):
                break
            V1 = self.A * np.log(np.tan(M_FORTPI + 0.5 * pe[active]))
            tpe = e * np.sin(pe[active])
            V2 = 0.5 * e * self.A * np.log((1.0 + tpe) / (1.0 - tpe))
            t = ps[active] - 2.0 * (np.arctan(np.exp(V1 - V2 + self.C)) - M_FORTPI)
            pe[active] = pe[active] + t
            done = np.abs(t) < 1e-10
            idx = np.flatnonzero(active)
            rem = active.copy()
            rem[idx[done]] = False
            active = rem
        t = e * np.sin(pe)
        t = 1.0 - t * t
        Re = one_es / (t * np.sqrt(t))
        t = np.tan(ps)
        t2 = t * t
        s = self.kRg * self.kRg
        d = Re * self.k0 * self.kRg
        I7 = t / (2.0 * d)
        I8 = t * (5.0 + 3.0 * t2) / (24.0 * d * s)
        d = np.cos(ps) * self.kRg * self.A
        I9 = 1.0 / d
        d = d * s
        I10 = (1.0 + 2.0 * t2) / (6.0 * d)
        I11 = (5.0 + t2 * (28.0 + 24.0 * t2)) / (120.0 * d * s)
        x2 = x * x
        coo.y = pe + x2 * (-I7 + I8 * x2)
        coo.x = x * (I9 + x2 * (-I10 + x2 * I11))


@register
class Rouss(Operation):
    """Roussilhe Stereographic (rouss.cpp): power series around lat_0
    over the geodesic meridional distance (proj_mdist.cpp)."""

    name = "rouss"
    need_ellps = True

    def setup(self) -> None:
        from ..mathx import mdist, mdist_ini

        es, one_es = self.ell.es, self.ell.one_es
        self.md = mdist_ini(es)
        sinp = math.sin(self.phi0)
        self.s0 = float(mdist(np.array([self.phi0]), np.array([sinp]),
                              np.array([math.cos(self.phi0)]), self.md)[0])
        es2 = es * sinp * sinp
        t = 1.0 - es2
        N0 = 1.0 / math.sqrt(t)
        R_R0_2 = t * t / one_es
        R_R0_4 = R_R0_2 * R_R0_2
        t = math.tan(self.phi0)
        t2 = t * t
        self.C1 = self.A1 = R_R0_2 / 4.0
        self.C2 = self.A2 = R_R0_2 * (2 * t2 - 1.0 - 2.0 * es2) / 12.0
        self.A3 = R_R0_2 * t * (1.0 + 4.0 * t2) / (12.0 * N0)
        self.A4 = R_R0_4 / 24.0
        self.A5 = R_R0_4 * (-1.0 + t2 * (11.0 + 12.0 * t2)) / 24.0
        self.A6 = R_R0_4 * (-2.0 + t2 * (11.0 - 2.0 * t2)) / 240.0
        self.B1 = t / (2.0 * N0)
        self.B2 = R_R0_2 / 12.0
        self.B3 = R_R0_2 * (1.0 + 2.0 * t2 - 2.0 * es2) / 4.0
        self.B4 = R_R0_2 * t * (2.0 - t2) / (24.0 * N0)
        self.B5 = R_R0_2 * t * (5.0 + 4.0 * t2) / (8.0 * N0)
        self.B6 = R_R0_4 * (-2.0 + t2 * (-5.0 + 6.0 * t2)) / 48.0
        self.B7 = R_R0_4 * (5.0 + t2 * (19.0 + 12.0 * t2)) / 24.0
        self.B8 = R_R0_4 / 120.0
        self.C3 = R_R0_2 * t * (1.0 + t2) / (3.0 * N0)
        self.C4 = R_R0_4 * (-3.0 + t2 * (34.0 + 22.0 * t2)) / 240.0
        self.C5 = R_R0_4 * (4.0 + t2 * (13.0 + 12.0 * t2)) / 24.0
        self.C6 = R_R0_4 / 16.0
        self.C7 = R_R0_4 * t * (11.0 + t2 * (33.0 + t2 * 16.0)) / (48.0 * N0)
        self.C8 = R_R0_4 * t * (1.0 + t2 * 4.0) / (36.0 * N0)
        self.D1 = t / (2.0 * N0)
        self.D2 = R_R0_2 / 12.0
        self.D3 = R_R0_2 * (2 * t2 + 1.0 - 2.0 * es2) / 4.0
        self.D4 = R_R0_2 * t * (1.0 + t2) / (8.0 * N0)
        self.D5 = R_R0_2 * t * (1.0 + t2 * 2.0) / (4.0 * N0)
        self.D6 = R_R0_4 * (1.0 + t2 * (6.0 + t2 * 6.0)) / 16.0
        self.D7 = R_R0_4 * t2 * (3.0 + t2 * 4.0) / 8.0
        self.D8 = R_R0_4 / 80.0
        self.D9 = R_R0_4 * t * (-21.0 + t2 * (178.0 - t2 * 26.0)) / 720.0
        self.D10 = R_R0_4 * t * (29.0 + t2 * (86.0 + t2 * 48.0)) / (96.0 * N0)
        self.D11 = R_R0_4 * t * (37.0 + t2 * 44.0) / (96.0 * N0)

    def _fwd(self, coo: Coords) -> None:
        from ..mathx import mdist

        es = self.ell.es
        lam, phi = coo.x, coo.y
        cp = np.cos(phi)
        sp = np.sin(phi)
        s = mdist(phi, sp, cp, self.md) - self.s0
        s2 = s * s
        al = lam * cp / np.sqrt(1.0 - es * sp * sp)
        al2 = al * al
        coo.x = self.k0 * al * (1.0 + s2 * (self.A1 + s2 * self.A4)
                                - al2 * (self.A2 + s * self.A3 + s2 * self.A5
                                         + al2 * self.A6))
        coo.y = self.k0 * (al2 * (self.B1 + al2 * self.B4)
                           + s * (1.0 + al2 * (self.B3 - al2 * self.B6)
                                  + s2 * (self.B2 + s2 * self.B8)
                                  + s * al2 * (self.B5 + s * self.B7)))

    def _inv(self, coo: Coords) -> None:
        from ..core.errors import ERR_NON_CONV_INV_MERI_DIST
        from ..mathx import inv_mdist

        es = self.ell.es
        x = coo.x / self.k0
        y = coo.y / self.k0
        x2 = x * x
        y2 = y * y
        al = x * (1.0 - self.C1 * y2
                  + x2 * (self.C2 + self.C3 * y - self.C4 * x2
                          + self.C5 * y2 - self.C7 * x2 * y)
                  + y2 * (self.C6 * y2 - self.C8 * x2 * y))
        s = self.s0 + y * (1.0 + y2 * (-self.D2 + self.D8 * y2)) + x2 * (
            -self.D1 + y * (-self.D3 + y * (-self.D5 + y * (-self.D7 + y * self.D11)))
            + x2 * (self.D4 + y * (self.D6 + y * self.D10) - x2 * self.D9))
        phi, nonconv = inv_mdist(s, self.md)
        coo.set_err(nonconv & np.isfinite(x), ERR_NON_CONV_INV_MERI_DIST)
        sp = np.sin(phi)
        coo.x = al * np.sqrt(1.0 - es * sp * sp) / np.cos(phi)
        coo.y = phi


@register
class ColUrban(Operation):
    """Colombia Urban (col_urban.cpp, IOGP Guidance Note 7-2)."""

    name = "col_urban"
    need_ellps = True

    def setup(self) -> None:
        es = self.ell.es
        h0_unscaled = self.params.float_("h_0", 0.0)
        self.h0 = h0_unscaled / self.ell.a
        sinphi0 = math.sin(self.phi0)
        nu0 = 1.0 / math.sqrt(1 - es * sinphi0 * sinphi0)
        self.A = 1 + self.h0 / nu0
        self.rho0 = (1 - es) / (1 - es * sinphi0 * sinphi0) ** 1.5
        self.B = math.tan(self.phi0) / (2 * self.rho0 * nu0)
        self.Cc = 1 + self.h0
        self.D = self.rho0 * (1 + self.h0 / (1 - es))

    def _fwd(self, coo: Coords) -> None:
        es = self.ell.es
        lam, phi = coo.x, coo.y
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        nu = 1.0 / np.sqrt(1 - es * sinphi * sinphi)
        lam_nu_cosphi = lam * nu * cosphi
        x = self.A * lam_nu_cosphi
        sinphi_m = np.sin(0.5 * (phi + self.phi0))
        rho_m = (1 - es) / (1 - es * sinphi_m * sinphi_m) ** 1.5
        G = 1 + self.h0 / rho_m
        coo.x = x
        coo.y = G * self.rho0 * ((phi - self.phi0) + self.B * lam_nu_cosphi ** 2)

    def _inv(self, coo: Coords) -> None:
        es = self.ell.es
        x, y = coo.x, coo.y
        phi = self.phi0 + y / self.D - self.B * (x / self.Cc) ** 2
        sinphi = np.sin(phi)
        nu = 1.0 / np.sqrt(1 - es * sinphi * sinphi)
        coo.x = x / (self.Cc * nu * np.cos(phi))
        coo.y = phi


@register
class Chamb(Operation):
    """Chamberlin Trimetric (chamb.cpp): mean of three-arc intercepts
    from three control points. Forward only."""

    name = "chamb"
    need_ellps = False
    has_inverse = False
    TOLC = 1e-9
    THIRD = 1.0 / 3.0

    def setup(self) -> None:
        from ..core.errors import ERR_CONTROL_POINT_NO_DIST

        _spherify(self)
        self.ctl = []
        for i in (1, 2, 3):
            phi = self.params.rad(f"lat_{i}", 0.0)
            lam = float(adjlon(np.array([self.params.rad(f"lon_{i}", 0.0)
                                         - self.lam0]))[0])
            self.ctl.append({
                "phi": phi, "lam": lam,
                "cosphi": math.cos(phi), "sinphi": math.sin(phi),
            })
        for i in range(3):
            j = 0 if i == 2 else i + 1
            r, Az = self._vect_s(
                self.ctl[j]["phi"] - self.ctl[i]["phi"],
                self.ctl[i]["cosphi"], self.ctl[i]["sinphi"],
                self.ctl[j]["cosphi"], self.ctl[j]["sinphi"],
                self.ctl[j]["lam"] - self.ctl[i]["lam"])
            if r == 0.0:
                raise ProjError(ERR_CONTROL_POINT_NO_DIST,
                                "chamb: control points with no distance")
            self.ctl[i]["vr"] = r
            self.ctl[i]["vAz"] = Az
        self.beta_0 = self._lc_s(self.ctl[0]["vr"], self.ctl[2]["vr"], self.ctl[1]["vr"])
        self.beta_1 = self._lc_s(self.ctl[0]["vr"], self.ctl[1]["vr"], self.ctl[2]["vr"])
        self.beta_2 = M_PI - self.beta_0
        y01 = self.ctl[2]["vr"] * math.sin(self.beta_0)
        self.ctl[0]["py"] = y01
        self.ctl[1]["py"] = y01
        self.p_y = 2.0 * y01
        self.ctl[2]["py"] = 0.0
        self.ctl[1]["px"] = 0.5 * self.ctl[0]["vr"]
        self.ctl[0]["px"] = -self.ctl[1]["px"]
        self.ctl[2]["px"] = self.ctl[0]["px"] + self.ctl[2]["vr"] * math.cos(self.beta_0)
        self.p_x = self.ctl[2]["px"]

    @staticmethod
    def _vect_s(dphi, c1, s1, c2, s2, dlam):
        cdl = math.cos(dlam)
        if abs(dphi) > 1.0 or abs(dlam) > 1.0:
            r = math.acos(max(-1.0, min(1.0, s1 * s2 + c1 * c2 * cdl)))
        else:
            dp = math.sin(0.5 * dphi)
            dl = math.sin(0.5 * dlam)
            r = 2.0 * math.asin(max(-1.0, min(1.0,
                                              math.sqrt(dp * dp + c1 * c2 * dl * dl))))
        if abs(r) > Chamb.TOLC:
            Az = math.atan2(c2 * math.sin(dlam), c1 * s2 - s1 * c2 * cdl)
        else:
            r = Az = 0.0
        return r, Az

    @staticmethod
    def _lc_s(b, c, a):
        return math.acos(max(-1.0, min(1.0, 0.5 * (b * b + c * c - a * a) / (b * c))))

    def _vect(self, dphi, c1, s1, c2, s2, dlam):
        cdl = np.cos(dlam)
        small = (np.abs(dphi) <= 1.0) & (np.abs(dlam) <= 1.0)
        dp = np.sin(0.5 * dphi)
        dl = np.sin(0.5 * dlam)
        r_small = 2.0 * np.arcsin(np.clip(
            np.sqrt(dp * dp + c1 * c2 * dl * dl), -1.0, 1.0))
        r_big = np.arccos(np.clip(s1 * s2 + c1 * c2 * cdl, -1.0, 1.0))
        r = np.where(small, r_small, r_big)
        Az = np.arctan2(c2 * np.sin(dlam), c1 * s2 - s1 * c2 * cdl)
        zero = np.abs(r) <= self.TOLC
        return np.where(zero, 0.0, r), np.where(zero, 0.0, Az)

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        vr = []
        vAz = []
        at_ctl = np.full(lam.shape, -1, dtype=np.int8)
        for i in range(3):
            c = self.ctl[i]
            r, Az = self._vect(phi - c["phi"], c["cosphi"], c["sinphi"],
                               cosphi, sinphi, lam - c["lam"])
            Az = adjlon(Az - c["vAz"])
            at_ctl = np.where((at_ctl < 0) & (r == 0.0), i, at_ctl)
            vr.append(r)
            vAz.append(Az)
        x = np.full_like(lam, self.p_x)
        y = np.full_like(lam, self.p_y)
        for i in range(3):
            j = 0 if i == 2 else i + 1
            b, c_, a_ = self.ctl[i]["vr"], vr[i], vr[j]
            a = np.arccos(np.clip(0.5 * (b * b + c_ * c_ - a_ * a_)
                                  / (b * c_), -1.0, 1.0))
            a = np.where(vAz[i] < 0.0, -a, a)
            if i == 0:
                x = x + vr[i] * np.cos(a)
                y = y - vr[i] * np.sin(a)
            elif i == 1:
                a = self.beta_1 - a
                x = x - vr[i] * np.cos(a)
                y = y - vr[i] * np.sin(a)
            else:
                a = self.beta_2 - a
                x = x + vr[i] * np.cos(a)
                y = y + vr[i] * np.sin(a)
        x = x * self.THIRD
        y = y * self.THIRD
        for i in range(3):
            m = at_ctl == i
            x = np.where(m, self.ctl[i]["px"], x)
            y = np.where(m, self.ctl[i]["py"], y)
        coo.x, coo.y = x, y
