"""Miscellaneous spherical projections (batch 1).

Math re-derived from the corresponding files in
/root/reference/src/projections/: wag2, wag3, wag7, collg, crast,
fahey, fouc_s, boggs, denoy, gins8. All sphere-only (reference setup
stomps es=0). Forward-only ops simply omit the inverse.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import M_HALFPI, M_PI
from ..core.errors import ERR_N_OUT_OF_RANGE, ERR_TOLERANCE_CONDITION, ProjError
from ..core.op import Coords, Operation
from ..mathx import aasin, asqrt
from .pseudocyl import _spherify
from . import register

M_SQRT2 = math.sqrt(2.0)


class _Sph(Operation):
    need_ellps = True

    def setup(self) -> None:
        _spherify(self)


@register
class Wag2(_Sph):
    name = "wag2"
    C_x, C_y, C_p1, C_p2 = 0.92483, 1.38725, 0.88022, 0.88550

    def _fwd(self, coo: Coords) -> None:
        phi, err = aasin(self.C_p1 * np.sin(self.C_p2 * coo.y))
        coo.set_err(err, -19)
        coo.x = self.C_x * coo.x * np.cos(phi)
        coo.y = self.C_y * phi

    def _inv(self, coo: Coords) -> None:
        phi = coo.y / self.C_y
        coo.x = coo.x / (self.C_x * np.cos(phi))
        phi2, err = aasin(np.sin(phi) / self.C_p1)
        coo.set_err(err, -19)
        coo.y = phi2 / self.C_p2


@register
class Wag3(_Sph):
    name = "wag3"

    def setup(self) -> None:
        super().setup()
        ts = self.params.rad("lat_ts", 0.0)
        self.C_x = math.cos(ts) / math.cos(2.0 * ts / 3.0)

    def _fwd(self, coo: Coords) -> None:
        coo.x = self.C_x * coo.x * np.cos(coo.y * (2.0 / 3.0))

    def _inv(self, coo: Coords) -> None:
        coo.x = coo.x / (self.C_x * np.cos(coo.y * (2.0 / 3.0)))


@register
class Wag7(_Sph):
    name = "wag7"

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        y = 0.90630778703664996 * np.sin(phi)
        theta = np.arcsin(np.clip(y, -1, 1))
        ct = np.cos(theta)
        lam3 = lam / 3.0
        x = 2.66723 * ct * np.sin(lam3)
        D = 1.0 / np.sqrt(0.5 * (1.0 + ct * np.cos(lam3)))
        coo.x = x * D
        coo.y = y * 1.24104 * D


@register
class Collg(_Sph):
    name = "collg"
    FXC = 1.12837916709551257390
    FYC = 1.77245385090551602729

    def _fwd(self, coo: Coords) -> None:
        y = np.sqrt(np.maximum(1.0 - np.sin(coo.y), 0.0))
        coo.x = self.FXC * coo.x * y
        coo.y = self.FYC * (1.0 - y)

    def _inv(self, coo: Coords) -> None:
        p = coo.y / self.FYC - 1.0
        p = 1.0 - p * p
        over = np.abs(p) >= 1.0
        coo.set_err(np.abs(p) > 1.0000001, ERR_TOLERANCE_CONDITION)
        phi = np.where(
            over, np.where(p < 0, -M_HALFPI, M_HALFPI), np.arcsin(np.clip(p, -1, 1))
        )
        s = 1.0 - np.sin(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(s <= 0.0, 0.0, coo.x / (self.FXC * np.sqrt(np.maximum(s, 0))))
        coo.x, coo.y = lam, phi


@register
class Crast(_Sph):
    name = "crast"
    XM, RXM = 0.97720502380583984317, 1.02332670794648848847
    YM, RYM = 3.06998012383946546542, 0.32573500793527994772

    def _fwd(self, coo: Coords) -> None:
        phi3 = coo.y / 3.0
        coo.x = self.XM * coo.x * (2.0 * np.cos(phi3 + phi3) - 1.0)
        coo.y = self.YM * np.sin(phi3)

    def _inv(self, coo: Coords) -> None:
        phi = 3.0 * np.arcsin(np.clip(coo.y * self.RYM, -1, 1))
        coo.x = coo.x * self.RXM / (2.0 * np.cos((phi + phi) / 3.0) - 1.0)
        coo.y = phi


@register
class Fahey(_Sph):
    name = "fahey"

    def _fwd(self, coo: Coords) -> None:
        t = np.tan(0.5 * coo.y)
        coo.y = 1.819152 * t
        coo.x = 0.819152 * coo.x * asqrt(1.0 - t * t)

    def _inv(self, coo: Coords) -> None:
        y = coo.y / 1.819152
        phi = 2.0 * np.arctan(y)
        y2 = 1.0 - y * y
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(np.abs(y2) < 1e-6, 0.0, coo.x / (0.819152 * np.sqrt(np.maximum(y2, 0))))
        coo.x, coo.y = lam, phi


@register
class FoucS(_Sph):
    name = "fouc_s"

    def setup(self) -> None:
        super().setup()
        self.n = self.params.float_("n", 0.0)
        if self.n < 0.0 or self.n > 1.0:
            raise ProjError(ERR_N_OUT_OF_RANGE)
        self.n1 = 1.0 - self.n

    def _fwd(self, coo: Coords) -> None:
        t = np.cos(coo.y)
        coo.x = coo.x * t / (self.n + self.n1 * t)
        coo.y = self.n * coo.y + self.n1 * np.sin(coo.y)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        if self.n != 0.0:
            phi = y.copy()
            active = np.isfinite(phi)
            n_left = np.full(phi.shape, 10, dtype=np.int32)
            for _ in range(10):
                if not np.any(active):
                    break
                p = phi[active]
                V = (self.n * p + self.n1 * np.sin(p) - y[active]) / (self.n + self.n1 * np.cos(p))
                phi[active] = p - V
                n_left[active] -= 1
                done = np.abs(V) < 1e-7
                idx = np.flatnonzero(active)
                active[idx[done]] = False
            exhausted = (n_left <= 0) & np.isfinite(phi)
            phi = np.where(exhausted, np.where(y < 0, -M_HALFPI, M_HALFPI), phi)
        else:
            phi, err = aasin(y)
            coo.set_err(err, -19)
        V = np.cos(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            coo.x = x * (self.n + self.n1 * V) / V
        coo.y = phi


@register
class Boggs(_Sph):
    name = "boggs"
    FXC, FXC2, FYC = 2.00276, 1.11072, 0.49931

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        at_pole = np.abs(np.abs(phi) - M_HALFPI) < 1e-7
        theta = phi.copy()
        c = np.sin(theta) * M_PI
        active = np.isfinite(theta) & ~at_pole
        for _ in range(20):
            if not np.any(active):
                break
            t = theta[active]
            th1 = (t + np.sin(t) - c[active]) / (1.0 + np.cos(t))
            theta[active] = t - th1
            done = np.abs(th1) < 1e-7
            idx = np.flatnonzero(active)
            active[idx[done]] = False
        theta = theta * 0.5
        with np.errstate(divide="ignore", invalid="ignore"):
            x = self.FXC * lam / (1.0 / np.cos(phi) + self.FXC2 / np.cos(theta))
        coo.x = np.where(at_pole, 0.0, x)
        coo.y = self.FYC * (phi + M_SQRT2 * np.sin(theta))


@register
class Denoy(_Sph):
    name = "denoy"
    C0, C1, C3 = 0.95, -0.08333333333333333333, 0.00166666666666666666
    D1, D5 = 0.9, 0.03

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        al = np.abs(lam)
        coo.x = lam * np.cos(
            (self.C0 + al * (self.C1 + al * al * self.C3))
            * (phi * (self.D1 + self.D5 * phi * phi * phi * phi))
        )
        coo.y = phi


@register
class Gins8(_Sph):
    name = "gins8"
    Cl, Cp, C12 = 0.000952426, 0.162388, 0.08333333333333333

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        t = phi * phi
        coo.y = phi * (1.0 + t * self.C12)
        x = lam * (1.0 - self.Cp * t)
        t = lam * lam
        coo.x = x * (0.87 - self.Cl * t * t)


@register
class Lagrng(_Sph):
    name = "lagrng"

    def setup(self) -> None:
        super().setup()
        self.w = self.params.float_("W", 2.0) if self.params.has("W") else 2.0
        if self.w <= 0:
            raise ProjError(-27)
        self.hw = 0.5 * self.w
        self.rw = 1.0 / self.w
        self.hrw = 0.5 * self.rw
        sin_phi1 = math.sin(self.params.rad("lat_1", 0.0))
        if abs(abs(sin_phi1) - 1.0) < 1e-10:
            raise ProjError(-22)
        self.a1 = ((1.0 - sin_phi1) / (1.0 + sin_phi1)) ** self.hrw
        self.a2 = self.a1 * self.a1

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        sp = np.sin(phi)
        at_pole = np.abs(np.abs(sp) - 1.0) < 1e-10
        with np.errstate(divide="ignore", invalid="ignore"):
            v = self.a1 * np.power((1.0 + sp) / (1.0 - sp), self.hrw)
            lam2 = lam * self.rw
            c = 0.5 * (v + 1.0 / v) + np.cos(lam2)
            coo.set_err(~at_pole & (c < 1e-10), ERR_TOLERANCE_CONDITION)
            x = 2.0 * np.sin(lam2) / c
            y = (v - 1.0 / v) / c
        coo.x = np.where(at_pole, 0.0, x)
        coo.y = np.where(at_pole, np.where(phi < 0, -2.0, 2.0), y)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        at_pole = np.abs(np.abs(y) - 2.0) < 1e-10
        x2 = x * x
        y2p = 2.0 + y
        y2m = 2.0 - y
        c = y2p * y2m - x2
        coo.set_err(~at_pole & (np.abs(c) < 1e-10), ERR_TOLERANCE_CONDITION)
        with np.errstate(divide="ignore", invalid="ignore"):
            phi = 2.0 * np.arctan(np.power((y2p * y2p + x2) / (self.a2 * (y2m * y2m + x2)), self.hw)) - M_HALFPI
            lam = self.w * np.arctan2(4.0 * x, c)
        coo.x = np.where(at_pole, 0.0, lam)
        coo.y = np.where(at_pole, np.where(y < 0, -M_HALFPI, M_HALFPI), phi)


@register
class Larr(_Sph):
    name = "larr"

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        coo.x = 0.5 * lam * (1.0 + np.sqrt(np.maximum(np.cos(phi), 0.0)))
        coo.y = phi / (np.cos(0.5 * phi) * np.cos(lam / 6.0))


@register
class Lask(_Sph):
    name = "lask"

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        a10, a12, a32, a14 = 0.975534, -0.119161, -0.0143059, -0.0547009
        b01, b21, b03, b41, b23, b05 = 1.00384, 0.0802894, 0.0998909, 0.000199025, -0.0285500, -0.0491032
        l2 = lam * lam
        p2 = phi * phi
        coo.x = lam * (a10 + p2 * (a12 + l2 * a32 + p2 * a14))
        coo.y = phi * (b01 + l2 * (b21 + p2 * b23 + l2 * b41) + p2 * (b03 + p2 * b05))


@register
class Loxim(_Sph):
    name = "loxim"
    EPS = 1e-8

    def setup(self) -> None:
        super().setup()
        self.phi1 = self.params.rad("lat_1", 0.0)
        self.cosphi1 = math.cos(self.phi1)
        if self.cosphi1 < self.EPS:
            raise ProjError(-22)
        self.tanphi1 = math.tan(math.pi / 4 + 0.5 * self.phi1)

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        dy = phi - self.phi1
        near = np.abs(dy) < self.EPS
        t = math.pi / 4 + 0.5 * phi
        deg = (np.abs(t) < self.EPS) | (np.abs(np.abs(t) - M_HALFPI) < self.EPS)
        with np.errstate(divide="ignore", invalid="ignore"):
            x = lam * dy / np.log(np.tan(t) / self.tanphi1)
        coo.x = np.where(near, lam * self.cosphi1, np.where(deg, 0.0, x))
        coo.y = dy

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        phi = y + self.phi1
        near = np.abs(y) < self.EPS
        t = math.pi / 4 + 0.5 * phi
        deg = (np.abs(t) < self.EPS) | (np.abs(np.abs(t) - M_HALFPI) < self.EPS)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = x * np.log(np.tan(t) / self.tanphi1) / y
        coo.x = np.where(near, x / self.cosphi1, np.where(deg, 0.0, lam))
        coo.y = phi


@register
class Nicol(_Sph):
    name = "nicol"
    EPS = 1e-10

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        on_mer = np.abs(lam) < self.EPS
        on_eq = np.abs(phi) < self.EPS
        on_edge = np.abs(np.abs(lam) - M_HALFPI) < self.EPS
        at_pole = np.abs(np.abs(phi) - M_HALFPI) < self.EPS
        with np.errstate(divide="ignore", invalid="ignore"):
            tb = M_HALFPI / lam - lam / M_HALFPI
            c = phi / M_HALFPI
            sp = np.sin(phi)
            d = (1 - c * c) / (sp - c)
            r2 = (tb / d) ** 2
            m = (tb * sp / d - 0.5 * tb) / (1.0 + r2)
            n = (sp / r2 + 0.5 * d) / (1.0 + 1.0 / r2)
            xr = np.sqrt(np.maximum(m * m + np.cos(phi) ** 2 / (1.0 + r2), 0.0))
            x = M_HALFPI * (m + np.where(lam < 0.0, -xr, xr))
            yr = np.sqrt(np.maximum(n * n - (sp * sp / r2 + d * sp - 1.0) / (1.0 + 1.0 / r2), 0.0))
            y = M_HALFPI * (n + np.where(phi < 0.0, yr, -yr))
        x = np.where(on_edge, lam * np.cos(phi), x)
        y = np.where(on_edge, M_HALFPI * np.sin(phi), y)
        x = np.where(on_eq & ~on_mer, lam, x)
        y = np.where(on_eq & ~on_mer, 0.0, y)
        x = np.where(on_mer | at_pole, 0.0, x)
        y = np.where(on_mer | at_pole, phi, y)
        coo.x, coo.y = x, y


class _BaconBase(_Sph):
    HLFPI2 = 2.46740110027233965467
    EPS = 1e-10
    bacn = False
    ortl = False

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        y = M_HALFPI * np.sin(phi) if self.bacn else phi
        ax = np.abs(lam)
        small = ax < self.EPS
        with np.errstate(divide="ignore", invalid="ignore"):
            if self.ortl:
                edge = ax >= M_HALFPI
                x_edge = np.sqrt(np.maximum(self.HLFPI2 - phi * phi + self.EPS, 0.0)) + ax - M_HALFPI
            else:
                edge = np.zeros(lam.shape, dtype=bool)
                x_edge = np.zeros_like(lam)
            f = 0.5 * (self.HLFPI2 / ax + ax)
            x_gen = ax - f + np.sqrt(np.maximum(f * f - y * y, 0.0))
            x = np.where(edge, x_edge, x_gen)
            x = np.where(lam < 0.0, -x, x)
        coo.x = np.where(small, 0.0, x)
        coo.y = y


@register
class Bacon(_BaconBase):
    name = "bacon"
    bacn = True


@register
class Apian(_BaconBase):
    name = "apian"


@register
class Ortel(_BaconBase):
    name = "ortel"
    ortl = True


@register
class August(_Sph):
    name = "august"

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        M = 1.333333333333333
        t = np.tan(0.5 * phi)
        c1 = np.sqrt(np.maximum(1.0 - t * t, 0.0))
        hl = lam * 0.5
        c = 1.0 + c1 * np.cos(hl)
        x1 = np.sin(hl) * c1 / c
        y1 = t / c
        x12 = x1 * x1
        y12 = y1 * y1
        coo.x = M * x1 * (3.0 + x12 - 3.0 * y12)
        coo.y = M * y1 * (3.0 + 3.0 * x12 - y12)


@register
class Hammer(_Sph):
    name = "hammer"
    EPS = 1e-10

    def setup(self) -> None:
        super().setup()
        if self.params.has("W"):
            self.w = abs(self.params.float_("W"))
            if self.w <= 0:
                raise ProjError(-27)
        else:
            self.w = 0.5
        if self.params.has("M"):
            self.m = abs(self.params.float_("M"))
            if self.m <= 0:
                raise ProjError(-27)
        else:
            self.m = 1.0
        self.rm = 1.0 / self.m
        self.m /= self.w

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        cosphi = np.cos(phi)
        lam2 = lam * self.w
        denom = 1.0 + cosphi * np.cos(lam2)
        coo.set_err(denom == 0.0, ERR_TOLERANCE_CONDITION)
        with np.errstate(divide="ignore", invalid="ignore"):
            d = np.sqrt(2.0 / denom)
        coo.x = self.m * d * cosphi * np.sin(lam2)
        coo.y = self.rm * d * np.sin(phi)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        z = np.sqrt(np.maximum(1.0 - 0.25 * self.w * self.w * x * x - 0.25 * y * y, 0.0))
        bad = np.abs(2.0 * z * z - 1.0) < self.EPS
        from ..core.errors import ERR_LAT_OR_LON_EXCEED_LIMIT

        coo.set_err(bad, ERR_LAT_OR_LON_EXCEED_LIMIT)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.arctan2(self.w * x * z, 2.0 * z * z - 1.0) / self.w
        phi, err = aasin(z * y)
        coo.set_err(err, -19)
        coo.x = np.where(bad, np.inf, lam)
        coo.y = np.where(bad, np.inf, phi)


class _AitoffBase(_Sph):
    winkel = False
    cosphi1 = 0.0

    def _fwd_arrays(self, lam, phi):
        c = 0.5 * lam
        d = np.arccos(np.clip(np.cos(phi) * np.cos(c), -1, 1))
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_sd = 1.0 / np.sin(d)
            x = 2.0 * d * np.cos(phi) * np.sin(c) * inv_sd
            y = d * np.sin(phi) * inv_sd
        x = np.where(d == 0.0, 0.0, x)
        y = np.where(d == 0.0, 0.0, y)
        if self.winkel:
            x = (x + lam * self.cosphi1) * 0.5
            y = (y + phi) * 0.5
        return x, y

    def _fwd(self, coo: Coords) -> None:
        coo.x, coo.y = self._fwd_arrays(coo.x, coo.y)

    def _inv(self, coo: Coords) -> None:
        """Vectorized port of the double Newton loop (aitoff.cpp:?).
        Outer rounds restart from the current estimate when the
        re-projected point is still off."""
        X, Y = coo.x, coo.y
        EPSILON = 1e-12
        at_origin = (np.abs(X) < EPSILON) & (np.abs(Y) < EPSILON)
        phi = Y.copy()
        lam = X.copy()
        bad = np.zeros(X.shape, dtype=bool)
        for _round in range(20):
            for _ in range(11):
                sl = np.sin(lam * 0.5)
                cl = np.cos(lam * 0.5)
                sp = np.sin(phi)
                cp = np.cos(phi)
                D = cp * cl
                C = 1.0 - D * D
                denom = np.power(C, 1.5)
                zero_denom = denom == 0
                with np.errstate(divide="ignore", invalid="ignore"):
                    D = np.arccos(np.clip(D, -1, 1)) / np.where(zero_denom, np.nan, denom)
                    f1 = 2.0 * D * C * cp * sl
                    f2 = D * C * sp
                    f1p = 2.0 * (sl * cl * sp * cp / C - D * sp * sl)
                    f1l = cp * cp * sl * sl / C + D * cp * cl * sp * sp
                    f2p = sp * sp * cl / C + D * sl * sl * cp
                    f2l = 0.5 * (sp * cp * sl / C - D * sp * cp * cp * sl * cl)
                    if self.winkel:
                        f1 = 0.5 * (f1 + lam * self.cosphi1)
                        f2 = 0.5 * (f2 + phi)
                        f1p = f1p * 0.5
                        f1l = 0.5 * (f1l + self.cosphi1)
                        f2p = 0.5 * (f2p + 1.0)
                        f2l = f2l * 0.5
                    f1 = f1 - X
                    f2 = f2 - Y
                    dp_den = f1p * f2l - f2p * f1l
                    dl = (f2 * f1p - f1 * f2p) / dp_den
                    dp = (f1 * f2l - f2 * f1l) / dp_den
                dl = np.mod(dl + M_PI, 2 * M_PI) - M_PI
                phi = phi - np.where(np.isfinite(dp), dp, 0.0)
                lam = lam - np.where(np.isfinite(dl), dl, 0.0)
                bad |= zero_denom
                if np.all((np.abs(dp[np.isfinite(dp)]) <= EPSILON)
                          if np.any(np.isfinite(dp)) else True):
                    if np.all((np.abs(dl[np.isfinite(dl)]) <= EPSILON)
                              if np.any(np.isfinite(dl)) else True):
                        break
            phi = np.where(phi > M_HALFPI, phi - 2.0 * (phi - M_HALFPI), phi)
            phi = np.where(phi < -M_HALFPI, phi - 2.0 * (phi + M_HALFPI), phi)
            if not self.winkel:
                lam = np.where(np.abs(np.abs(phi) - M_HALFPI) < EPSILON, 0.0, lam)
            x2, y2 = self._fwd_arrays(lam, phi)
            if np.all((np.abs(X - x2) <= EPSILON) | ~np.isfinite(x2)) and np.all(
                (np.abs(Y - y2) <= EPSILON) | ~np.isfinite(y2)
            ):
                break
        coo.set_err(bad, -53)
        coo.x = np.where(at_origin, 0.0, lam)
        coo.y = np.where(at_origin, 0.0, phi)


@register
class Aitoff(_AitoffBase):
    name = "aitoff"


@register
class Wintri(_AitoffBase):
    name = "wintri"
    winkel = True

    def setup(self) -> None:
        super().setup()
        if self.params.has("lat_1"):
            self.cosphi1 = math.cos(self.params.rad("lat_1"))
            if self.cosphi1 == 0.0:
                raise ProjError(-22)
        else:
            self.cosphi1 = 0.636619772367581343
