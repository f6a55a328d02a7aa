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
