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


# --- polynomial-latitude cylindricals (natearth family) --------------------


class _PolyLatBase(_Sph):
    """y = φ·polynomial; inverse via Newton (natearth.cpp pattern)."""

    MAX_Y = 0.0
    EPS_N = 1e-11
    MAX_ITER = 100

    def _fy(self, phi):
        raise NotImplementedError

    def _fy_der(self, phi):
        raise NotImplementedError

    def _fx_scale(self, phi):
        raise NotImplementedError

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        coo.x = lam * self._fx_scale(phi)
        coo.y = self._fy(phi)

    def _inv(self, coo: Coords) -> None:
        x = coo.x
        y = np.clip(coo.y, -self.MAX_Y, self.MAX_Y)
        yc = y.copy()
        active = np.isfinite(yc)
        converged = ~active
        for _ in range(self.MAX_ITER):
            if not np.any(active):
                break
            p = yc[active]
            tol = (self._fy(p) - y[active]) / self._fy_der(p)
            yc[active] = p - tol
            done = np.abs(tol) < self.EPS_N
            idx = np.flatnonzero(active)
            converged[idx[done]] = True
            active[idx[done]] = False
        coo.set_err(~converged & np.isfinite(y), -53)
        coo.y = yc
        with np.errstate(divide="ignore", invalid="ignore"):
            coo.x = x / self._fx_scale(yc)


@register
class Natearth(_PolyLatBase):
    name = "natearth"
    A = (0.8707, -0.131979, -0.013791, 0.003971, -0.001529)
    B = (1.007226, 0.015085, -0.044475, 0.028874, -0.005916)
    MAX_Y = 0.8707 * 0.52 * M_PI

    def _fx_scale(self, phi):
        A0, A1, A2, A3, A4 = self.A
        p2 = phi * phi
        return A0 + p2 * (A1 + p2 * (A2 + p2 * p2 * p2 * (A3 + p2 * A4)))

    def _fy(self, phi):
        B0, B1, B2, B3, B4 = self.B
        p2 = phi * phi
        p4 = p2 * p2
        return phi * (B0 + p2 * (B1 + p4 * (B2 + B3 * p2 + B4 * p4)))

    def _fy_der(self, phi):
        B0, B1, B2, B3, B4 = self.B
        p2 = phi * phi
        p4 = p2 * p2
        return B0 + p2 * (3 * B1 + p4 * (7 * B2 + 9 * B3 * p2 + 11 * B4 * p4))


@register
class Natearth2(_PolyLatBase):
    name = "natearth2"
    A = (0.84719, -0.13063, -0.04515, 0.05494, -0.02326, 0.00331)
    B = (1.01183, -0.02625, 0.01926, -0.00396)
    MAX_Y = 0.84719 * 0.535117535153096 * M_PI

    def _fx_scale(self, phi):
        A0, A1, A2, A3, A4, A5 = self.A
        p2 = phi * phi
        p4 = p2 * p2
        p6 = p2 * p4
        return A0 + A1 * p2 + p6 * p6 * (A2 + A3 * p2 + A4 * p4 + A5 * p6)

    def _fy(self, phi):
        B0, B1, B2, B3 = self.B
        p2 = phi * phi
        p4 = p2 * p2
        return phi * (B0 + p4 * p4 * (B1 + B2 * p2 + B3 * p4))

    def _fy_der(self, phi):
        B0, B1, B2, B3 = self.B
        p2 = phi * phi
        p4 = p2 * p2
        return B0 + p4 * p4 * (9 * B1 + 11 * B2 * p2 + 13 * B3 * p4)


@register
class Patterson(_PolyLatBase):
    name = "patterson"
    K = (1.0148, 0.23185, -0.14499, 0.02406)
    MAX_Y = 1.790857183

    def _fx_scale(self, phi):
        return np.ones_like(phi) if isinstance(phi, np.ndarray) else 1.0

    def _fy(self, phi):
        K1, K2, K3, K4 = self.K
        p2 = phi * phi
        return phi * (K1 + p2 * p2 * (K2 + p2 * (K3 + K4 * p2)))

    def _fy_der(self, phi):
        K1, K2, K3, K4 = self.K
        p2 = phi * phi
        return K1 + p2 * p2 * (5 * K2 + p2 * (7 * K3 + 9 * K4 * p2))


@register
class Comill(_PolyLatBase):
    name = "comill"
    K = (0.9902, 0.1604, -0.03054)
    MAX_Y = 0.6000207669862655 * M_PI

    def _fx_scale(self, phi):
        return np.ones_like(phi) if isinstance(phi, np.ndarray) else 1.0

    def _fy(self, phi):
        K1, K2, K3 = self.K
        p2 = phi * phi
        return phi * (K1 + p2 * (K2 + K3 * p2))

    def _fy_der(self, phi):
        K1, K2, K3 = self.K
        p2 = phi * phi
        return K1 + p2 * (3 * K2 + 5 * K3 * p2)


@register
class Eqearth(Operation):
    """Equal Earth (eqearth.cpp) — sphere & ellipsoid (authalic)."""

    name = "eqearth"
    A1, A2, A3, A4 = 1.340264, -0.081106, 0.000893, 0.003796
    M = math.sqrt(3.0) / 2.0
    MAX_Y = 1.3173627591574

    def setup(self) -> None:
        from ..mathx import authset, qsfn

        self.rqda = 1.0
        if self.ell.es != 0.0:
            self.apa = authset(self.ell.es)
            self.qp = float(qsfn(np.array([1.0]), self.ell.e, self.ell.one_es)[0])
            self.rqda = math.sqrt(0.5 * self.qp)

    def _fwd(self, coo: Coords) -> None:
        from ..mathx import qsfn

        lam, phi = coo.x, coo.y
        sbeta = np.sin(phi)
        if self.ell.es != 0.0:
            sbeta = qsfn(sbeta, self.ell.e, 1.0 - self.ell.es) / self.qp
            sbeta = np.clip(sbeta, -1.0, 1.0)
        psi = np.arcsin(self.M * sbeta)
        psi2 = psi * psi
        psi6 = psi2 * psi2 * psi2
        A1, A2, A3, A4 = self.A1, self.A2, self.A3, self.A4
        coo.x = self.rqda * lam * np.cos(psi) / (
            self.M * (A1 + 3 * A2 * psi2 + psi6 * (7 * A3 + 9 * A4 * psi2))
        )
        coo.y = self.rqda * psi * (A1 + A2 * psi2 + psi6 * (A3 + A4 * psi2))

    def _inv(self, coo: Coords) -> None:
        from ..mathx import authlat

        A1, A2, A3, A4 = self.A1, self.A2, self.A3, self.A4
        x = coo.x / self.rqda
        y = np.clip(coo.y / self.rqda, -self.MAX_Y, self.MAX_Y)
        yc = y.copy()
        active = np.isfinite(yc)
        converged = ~active
        for _ in range(12):
            if not np.any(active):
                break
            p = yc[active]
            p2 = p * p
            p6 = p2 * p2 * p2
            f = p * (A1 + A2 * p2 + p6 * (A3 + A4 * p2)) - y[active]
            fder = A1 + 3 * A2 * p2 + p6 * (7 * A3 + 9 * A4 * p2)
            tol = f / fder
            yc[active] = p - tol
            done = np.abs(tol) < 1e-11
            idx = np.flatnonzero(active)
            converged[idx[done]] = True
            active[idx[done]] = False
        coo.set_err(~converged & np.isfinite(y), -53)
        y2 = yc * yc
        y6 = y2 * y2 * y2
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = self.M * x * (A1 + 3 * A2 * y2 + y6 * (7 * A3 + 9 * A4 * y2)) / np.cos(yc)
        s = np.clip(np.sin(yc) / self.M, -1.0, 1.0)
        # At the poles sin(yc)/M lands within a few hundred ulps of ±1 and
        # asin amplifies that to ~1e-6°; snap so pole inputs invert to ±90°
        # (the reference's scalar rounding chain happens to do the same).
        s = np.where(1.0 - np.abs(s) < 1e-13, np.sign(s), s)
        phi = np.arcsin(s)
        if self.ell.es != 0.0:
            phi = authlat(phi, self.apa)
        coo.x, coo.y = lam, phi


@register
class Nell(_Sph):
    name = "nell"

    def _fwd(self, coo: Coords) -> None:
        lam, phi0 = coo.x, coo.y
        k = 2.0 * np.sin(phi0)
        p2 = phi0 * phi0
        phi = phi0 * (1.00371 + p2 * (-0.0935382 + p2 * -0.011412))
        active = np.isfinite(phi)
        for _ in range(10):
            if not np.any(active):
                break
            p = phi[active]
            V = (p + np.sin(p) - k[active]) / (1.0 + np.cos(p))
            phi[active] = p - V
            done = np.abs(V) < 1e-7
            idx = np.flatnonzero(active)
            active[idx[done]] = False
        coo.x = 0.5 * lam * (1.0 + np.cos(phi))
        coo.y = phi

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        coo.x = 2.0 * x / (1.0 + np.cos(y))
        phi, err = aasin(0.5 * (y + np.sin(y)))
        coo.set_err(err, -19)
        coo.y = phi


@register
class NellH(_Sph):
    name = "nell_h"

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        coo.x = 0.5 * lam * (1.0 + np.cos(phi))
        coo.y = 2.0 * (phi - np.tan(0.5 * phi))

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        p = 0.5 * y
        phi = np.zeros_like(y)
        active = np.isfinite(y)
        n_left = np.full(y.shape, 9, dtype=np.int32)
        for _ in range(9):
            if not np.any(active):
                break
            ph = phi[active]
            c = np.cos(0.5 * ph)
            V = (ph - np.tan(ph / 2) - p[active]) / (1.0 - 0.5 / (c * c))
            phi[active] = ph - V
            n_left[active] -= 1
            done = np.abs(V) < 1e-7
            idx = np.flatnonzero(active)
            active[idx[done]] = False
        exhausted = (n_left <= 0) & np.isfinite(y)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(exhausted, 2.0 * x, 2.0 * x / (1.0 + np.cos(phi)))
        coo.y = np.where(exhausted, np.where(p < 0.0, -M_HALFPI, M_HALFPI), phi)
        coo.x = lam


@register
class MbtFps(_Sph):
    name = "mbt_fps"
    C1, C2, C3 = 0.45503, 1.36509, 1.41546
    C_x, C_y = 0.22248, 1.44492

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y.copy()
        k = self.C3 * np.sin(phi)
        active = np.isfinite(phi)
        for _ in range(10):
            if not np.any(active):
                break
            p = phi[active]
            t = p / self.C2
            V = (self.C1 * np.sin(t) + np.sin(p) - k[active]) / (
                (self.C1 / self.C2) * np.cos(t) + np.cos(p)
            )
            phi[active] = p - V
            done = np.abs(V) < 1e-7
            idx = np.flatnonzero(active)
            active[idx[done]] = False
        t = phi / self.C2
        with np.errstate(divide="ignore", invalid="ignore"):
            coo.x = self.C_x * lam * (1.0 + 3.0 * np.cos(phi) / np.cos(t))
        coo.y = self.C_y * np.sin(t)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        t, err = aasin(y / self.C_y)
        coo.set_err(err, -19)
        phi = self.C2 * t
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = x / (self.C_x * (1.0 + 3.0 * np.cos(phi) / np.cos(t)))
        phi2, err2 = aasin((self.C1 * np.sin(t) + np.sin(phi)) / self.C3)
        coo.set_err(err2, -19)
        coo.x, coo.y = lam, phi2


@register
class Mbtfpp(_Sph):
    name = "mbtfpp"
    CSy = 0.95257934441568037152
    FXC = 0.92582009977255146156
    FYC = 3.40168025708304504493

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        phi = np.arcsin(np.clip(self.CSy * np.sin(phi), -1, 1))
        coo.x = self.FXC * lam * (2.0 * np.cos((2.0 / 3.0) * phi) - 1.0)
        coo.y = self.FYC * np.sin(phi / 3.0)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        phi = y / self.FYC
        over1 = np.abs(phi) >= 1.0
        coo.set_err(np.abs(phi) > 1.0000001, ERR_TOLERANCE_CONDITION)
        phi = np.where(over1, np.where(phi < 0, -M_HALFPI, M_HALFPI),
                       np.arcsin(np.clip(phi, -1, 1)))
        phi = phi * 3.0
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = x / (self.FXC * (2.0 * np.cos((2.0 / 3.0) * phi) - 1.0))
        sp = np.sin(phi) / self.CSy
        over2 = np.abs(sp) >= 1.0
        coo.set_err(np.abs(sp) > 1.0000001, ERR_TOLERANCE_CONDITION)
        phi = np.where(over2, np.where(sp < 0, -M_HALFPI, M_HALFPI),
                       np.arcsin(np.clip(sp, -1, 1)))
        coo.x, coo.y = lam, phi


@register
class Mbtfpq(_Sph):
    name = "mbtfpq"
    C = 1.70710678118654752440
    FYC = 1.87475828462269495505
    RYC = 0.53340209679417701685
    FXC = 0.31245971410378249250

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y.copy()
        c = self.C * np.sin(phi)
        active = np.isfinite(phi)
        for _ in range(20):
            if not np.any(active):
                break
            p = phi[active]
            th1 = (np.sin(0.5 * p) + np.sin(p) - c[active]) / (
                0.5 * np.cos(0.5 * p) + np.cos(p)
            )
            phi[active] = p - th1
            done = np.abs(th1) < 1e-7
            idx = np.flatnonzero(active)
            active[idx[done]] = False
        with np.errstate(divide="ignore", invalid="ignore"):
            coo.x = self.FXC * lam * (1.0 + 2.0 * np.cos(phi) / np.cos(0.5 * phi))
        coo.y = self.FYC * np.sin(0.5 * phi)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        phi = self.RYC * y
        over = np.abs(phi) > 1.0
        coo.set_err(np.abs(phi) > 1.000001, ERR_TOLERANCE_CONDITION)
        t = np.where(over, np.where(phi < 0, -1.0, 1.0), phi)
        phi = np.where(over, np.where(phi < 0, -M_PI, M_PI), 2.0 * np.arcsin(np.clip(t, -1, 1)))
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = x / (self.FXC * (1.0 + 2.0 * np.cos(phi) / np.cos(0.5 * phi)))
        sp = (np.sin(0.5 * phi) + np.sin(phi)) / self.C
        over2 = np.abs(sp) > 1.0
        coo.set_err(np.abs(sp) > 1.000001, ERR_TOLERANCE_CONDITION)
        phi = np.where(over2, np.where(sp < 0, -M_HALFPI, M_HALFPI),
                       np.arcsin(np.clip(sp, -1, 1)))
        coo.x, coo.y = lam, phi


class _StsBase(_Sph):
    """sts.cpp family: x = C_x·λ·cosφ·…, y = C_y·sin/tan(C_p·φ)."""

    p_q_mode = (2.0, 2.0, False)

    def setup(self) -> None:
        super().setup()
        p, q, mode = self.p_q_mode
        self.C_x = q / p
        self.C_y = p
        self.C_p = 1.0 / q
        self.tan_mode = mode

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        x = self.C_x * lam * np.cos(phi)
        pp = phi * self.C_p
        c = np.cos(pp)
        if self.tan_mode:
            coo.x = x * c * c
            coo.y = self.C_y * np.tan(pp)
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                coo.x = x / c
            coo.y = self.C_y * np.sin(pp)

    def _inv(self, coo: Coords) -> None:
        x = coo.x
        yy = coo.y / self.C_y
        if self.tan_mode:
            pp = np.arctan(yy)
        else:
            pp, err = aasin(yy)
            coo.set_err(err, -19)
        c = np.cos(pp)
        phi = pp / self.C_p
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = x / (self.C_x * np.cos(phi))
            if self.tan_mode:
                lam = lam / (c * c)
            else:
                lam = lam * c
        coo.x, coo.y = lam, phi


@register
class Fouc(_StsBase):
    name = "fouc"
    p_q_mode = (2.0, 2.0, True)


@register
class Kav5(_StsBase):
    name = "kav5"
    p_q_mode = (1.50488, 1.35439, False)


@register
class QuaAut(_StsBase):
    name = "qua_aut"
    p_q_mode = (2.0, 2.0, False)


@register
class MbtS(_StsBase):
    name = "mbt_s"
    p_q_mode = (1.48875, 1.36509, False)


@register
class Urmfps(_Sph):
    name = "urmfps"
    C_x = 0.8773826753
    Cy = 1.139753528477
    n_default = None

    def setup(self) -> None:
        super().setup()
        if self.n_default is not None:
            self.n = self.n_default
        elif self.params.has("n"):
            self.n = self.params.float_("n")
            if self.n <= 0.0 or self.n > 1.0:
                raise ProjError(ERR_N_OUT_OF_RANGE)
        else:
            raise ProjError(ERR_N_OUT_OF_RANGE)
        self.C_y = self.Cy / self.n

    def _fwd(self, coo: Coords) -> None:
        phi, err = aasin(self.n * np.sin(coo.y))
        coo.set_err(err, -19)
        coo.x = self.C_x * coo.x * np.cos(phi)
        coo.y = self.C_y * phi

    def _inv(self, coo: Coords) -> None:
        y = coo.y / self.C_y
        phi, err = aasin(np.sin(y) / self.n)
        coo.set_err(err, -19)
        coo.x = coo.x / (self.C_x * np.cos(y))
        coo.y = phi


@register
class Wag1(Urmfps):
    name = "wag1"
    n_default = 0.8660254037844386467637231707


@register
class Urm5(_Sph):
    name = "urm5"

    def setup(self) -> None:
        super().setup()
        if self.params.has("n"):
            self.n = self.params.float_("n")
            if self.n <= 0.0 or self.n > 1.0:
                raise ProjError(ERR_N_OUT_OF_RANGE)
        else:
            raise ProjError(ERR_N_OUT_OF_RANGE)
        self.q3 = self.params.float_("q", 0.0) / 3.0
        alpha = self.params.rad("alpha", 0.0)
        t = self.n * math.sin(alpha)
        denom = math.sqrt(1.0 - t * t)
        if denom == 0:
            from ..core.errors import ERR_LAT_0_OR_ALPHA_EQ_90

            raise ProjError(ERR_LAT_0_OR_ALPHA_EQ_90)
        self.m = math.cos(alpha) / denom
        self.rmn = 1.0 / (self.m * self.n)

    def _fwd(self, coo: Coords) -> None:
        phi, err = aasin(self.n * np.sin(coo.y))
        coo.set_err(err, -19)
        t = phi * phi
        coo.x = self.m * coo.x * np.cos(phi)
        coo.y = phi * (1.0 + t * self.q3) * self.rmn


@register
class Times(_Sph):
    name = "times"

    def _fwd(self, coo: Coords) -> None:
        T = np.tan(coo.y / 2.0)
        S = np.sin((M_PI / 4.0) * T)
        S2 = S * S
        coo.x = coo.x * (0.74482 - 0.34588 * S2)
        coo.y = 1.70711 * T

    def _inv(self, coo: Coords) -> None:
        T = coo.y / 1.70711
        S = np.sin((M_PI / 4.0) * T)
        S2 = S * S
        coo.x = coo.x / (0.74482 - 0.34588 * S2)
        coo.y = 2.0 * np.arctan(T)


@register
class Tobmerc(Operation):
    """Tobler-Mercator (tobmerc.cpp), spherical."""

    name = "tobmerc"

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        at_pole = np.abs(np.abs(phi) - M_HALFPI) <= 1e-10
        coo.set_err(at_pole, ERR_TOLERANCE_CONDITION)
        cosphi = np.cos(phi)
        coo.x = self.k0 * lam * cosphi * cosphi
        small = np.abs(phi) <= np.finfo(np.float64).eps
        with np.errstate(divide="ignore", invalid="ignore"):
            y = np.log(np.tan(M_PI / 4.0 + 0.5 * phi))
        coo.y = self.k0 * np.where(small, np.log1p(phi), y)

    def _inv(self, coo: Coords) -> None:
        phi = np.arctan(np.sinh(coo.y / self.k0))
        cosphi = np.cos(phi)
        coo.x = coo.x / self.k0 / (cosphi * cosphi)
        coo.y = phi


@register
class Cc(_Sph):
    name = "cc"

    def _fwd(self, coo: Coords) -> None:
        at_pole = np.abs(np.abs(coo.y) - M_HALFPI) <= 1e-10
        coo.set_err(at_pole, ERR_TOLERANCE_CONDITION)
        coo.y = np.tan(coo.y)

    def _inv(self, coo: Coords) -> None:
        coo.y = np.arctan(coo.y)


@register
class Tcc(_Sph):
    name = "tcc"

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        b = np.cos(phi) * np.sin(lam)
        bt = 1.0 - b * b
        coo.set_err(bt < 1e-10, ERR_TOLERANCE_CONDITION)
        with np.errstate(divide="ignore", invalid="ignore"):
            coo.x = b / np.sqrt(np.maximum(bt, 0.0))
        coo.y = np.arctan2(np.tan(phi), np.cos(lam))


@register
class Putp2(_Sph):
    name = "putp2"
    C_x, C_y, C_p = 1.89490, 1.71848, 0.6141848493043784

    def _fwd(self, coo: Coords) -> None:
        lam, phi0 = coo.x, coo.y
        p = self.C_p * np.sin(phi0)
        p2 = phi0 * phi0
        phi = phi0 * (0.615709 + p2 * (0.00909953 + p2 * 0.0046292))
        active = np.isfinite(phi)
        n_left = np.full(phi.shape, 10, dtype=np.int32)
        for _ in range(10):
            if not np.any(active):
                break
            ph = phi[active]
            c = np.cos(ph)
            s = np.sin(ph)
            V = (ph + s * (c - 1.0) - p[active]) / (1.0 + c * (c - 1.0) - s * s)
            phi[active] = ph - V
            n_left[active] -= 1
            done = np.abs(V) < 1e-10
            idx = np.flatnonzero(active)
            active[idx[done]] = False
        exhausted = (n_left <= 0) & np.isfinite(phi)
        PI3 = 1.0471975511965977
        phi = np.where(exhausted, np.where(phi < 0, -PI3, PI3), phi)
        coo.x = self.C_x * lam * (np.cos(phi) - 0.5)
        coo.y = self.C_y * np.sin(phi)

    def _inv(self, coo: Coords) -> None:
        phi, err = aasin(coo.y / self.C_y)
        coo.set_err(err, -19)
        c = np.cos(phi)
        coo.x = coo.x / (self.C_x * (c - 0.5))
        phi2, err2 = aasin((phi + np.sin(phi) * (c - 1.0)) / self.C_p)
        coo.set_err(err2, -19)
        coo.y = phi2


class _Putp3Base(_Sph):
    RPISQ = 0.1013211836
    C = 0.79788456
    A_mult = 4.0

    def setup(self) -> None:
        super().setup()
        self.A = self.A_mult * self.RPISQ

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        coo.x = self.C * lam * (1.0 - self.A * phi * phi)
        coo.y = self.C * phi

    def _inv(self, coo: Coords) -> None:
        phi = coo.y / self.C
        coo.x = coo.x / (self.C * (1.0 - self.A * phi * phi))
        coo.y = phi


@register
class Putp3(_Putp3Base):
    name = "putp3"
    A_mult = 4.0


@register
class Putp3p(_Putp3Base):
    name = "putp3p"
    A_mult = 2.0


class _Putp4pBase(_Sph):
    C_x = C_y = 1.0

    def _fwd(self, coo: Coords) -> None:
        lam = coo.x
        phi, err = aasin(0.883883476 * np.sin(coo.y))
        coo.set_err(err, -19)
        x = self.C_x * lam * np.cos(phi)
        phi3 = phi / 3.0
        coo.x = x / np.cos(phi3)
        coo.y = self.C_y * np.sin(phi3)

    def _inv(self, coo: Coords) -> None:
        phi, err = aasin(coo.y / self.C_y)
        coo.set_err(err, -19)
        lam = coo.x * np.cos(phi) / self.C_x
        phi3 = phi * 3.0
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = lam / np.cos(phi3)
        phi2, err2 = aasin(1.13137085 * np.sin(phi3))
        coo.set_err(err2, -19)
        coo.x, coo.y = lam, phi2


@register
class Putp4p(_Putp4pBase):
    name = "putp4p"
    C_x, C_y = 0.874038744, 3.883251825


@register
class Weren(_Putp4pBase):
    name = "weren"
    C_x, C_y = 1.0, 4.442882938


class _Putp5Base(_Sph):
    Cc = 1.01346
    D = 1.2158542
    A = B = 1.0

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        coo.x = self.Cc * lam * (self.A - self.B * np.sqrt(1.0 + self.D * phi * phi))
        coo.y = self.Cc * phi

    def _inv(self, coo: Coords) -> None:
        phi = coo.y / self.Cc
        coo.x = coo.x / (self.Cc * (self.A - self.B * np.sqrt(1.0 + self.D * phi * phi)))
        coo.y = phi


@register
class Putp5(_Putp5Base):
    name = "putp5"
    A, B = 2.0, 1.0


@register
class Putp5p(_Putp5Base):
    name = "putp5p"
    A, B = 1.5, 0.5


class _Putp6Base(_Sph):
    C_x = C_y = A = B = D = 1.0
    CON_POLE = 1.732050807568877

    def _fwd(self, coo: Coords) -> None:
        lam, phi0 = coo.x, coo.y
        p = self.B * np.sin(phi0)
        phi = phi0 * 1.10265779
        active = np.isfinite(phi)
        n_left = np.full(phi.shape, 10, dtype=np.int32)
        for _ in range(10):
            if not np.any(active):
                break
            ph = phi[active]
            r = np.sqrt(1.0 + ph * ph)
            V = ((self.A - r) * ph - np.log(ph + r) - p[active]) / (self.A - 2.0 * r)
            phi[active] = ph - V
            n_left[active] -= 1
            done = np.abs(V) < 1e-10
            idx = np.flatnonzero(active)
            active[idx[done]] = False
        exhausted = (n_left <= 0) & np.isfinite(phi)
        phi = np.where(exhausted, np.where(p < 0, -self.CON_POLE, self.CON_POLE), phi)
        coo.x = self.C_x * lam * (self.D - np.sqrt(1.0 + phi * phi))
        coo.y = self.C_y * phi

    def _inv(self, coo: Coords) -> None:
        phi = coo.y / self.C_y
        r = np.sqrt(1.0 + phi * phi)
        coo.x = coo.x / (self.C_x * (self.D - r))
        phi2, err = aasin(((self.A - r) * phi - np.log(phi + r)) / self.B)
        coo.set_err(err, -19)
        coo.y = phi2


@register
class Putp6(_Putp6Base):
    name = "putp6"
    C_x, C_y, A, B, D = 1.01346, 0.91910, 4.0, 2.1471437182129378784, 2.0


@register
class Putp6p(_Putp6Base):
    name = "putp6p"
    C_x, C_y, A, B, D = 0.44329, 0.80404, 6.0, 5.61125, 3.0


class _Vandg2Base(_Sph):
    vdg3 = False
    TOL = 1e-10

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        M2PI = 2.0 / M_PI
        bt = np.abs(M2PI * phi)
        ct = np.sqrt(np.maximum(1.0 - bt * bt, 0.0))
        on_mer = np.abs(lam) < self.TOL
        with np.errstate(divide="ignore", invalid="ignore"):
            at = 0.5 * np.abs(M_PI / lam - lam / M_PI)
            if self.vdg3:
                x1 = bt / (1.0 + ct)
                x = M_PI * (np.sqrt(at * at + 1.0 - x1 * x1) - at)
                y = M_PI * x1
            else:
                x1 = (ct * np.sqrt(1.0 + at * at) - at * ct * ct) / (1.0 + at * at * bt * bt)
                x = M_PI * x1
                y = M_PI * np.sqrt(np.maximum(1.0 - x1 * (x1 + 2.0 * at) + self.TOL, 0.0))
            x = np.where(lam < 0.0, -x, x)
            y = np.where(phi < 0.0, -y, y)
        mer_y = M_PI * np.where(phi < 0.0, -bt, bt) / (1.0 + ct)
        coo.x = np.where(on_mer, 0.0, x)
        coo.y = np.where(on_mer, mer_y, y)


@register
class Vandg2(_Vandg2Base):
    name = "vandg2"


@register
class Vandg3(_Vandg2Base):
    name = "vandg3"
    vdg3 = True


@register
class Vandg4(_Sph):
    name = "vandg4"
    TOL = 1e-10

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        M2PI = 2.0 / M_PI
        on_eq = np.abs(phi) < self.TOL
        on_mer = (np.abs(lam) < self.TOL) | (np.abs(np.abs(phi) - M_HALFPI) < self.TOL)
        with np.errstate(divide="ignore", invalid="ignore"):
            bt = np.abs(M2PI * phi)
            bt2 = bt * bt
            ct = 0.5 * (bt * (8.0 - bt * (2.0 + bt2)) - 5.0) / (bt2 * (bt - 1.0))
            ct2 = ct * ct
            dt = M2PI * lam
            dt = dt + 1.0 / dt
            dt = np.sqrt(np.maximum(dt * dt - 4.0, 0.0))
            dt = np.where((np.abs(lam) - M_HALFPI) < 0.0, -dt, dt)
            dt2 = dt * dt
            x1 = (bt + ct) ** 2
            t = bt + 3.0 * ct
            ft = x1 * (bt2 + ct2 * dt2 - 1.0) + (1.0 - bt2) * (
                bt2 * (t * t + 4.0 * ct2) + ct2 * (12.0 * bt * ct + 4.0 * ct2)
            )
            x1 = (dt * (x1 + ct2 - 1.0) + 2.0 * np.sqrt(np.maximum(ft, 0.0))) / (4.0 * x1 + dt2)
            x = M_HALFPI * x1
            y = M_HALFPI * np.sqrt(np.maximum(1.0 + dt * np.abs(x1) - x1 * x1, 0.0))
            x = np.where(lam < 0.0, -x, x)
            y = np.where(phi < 0.0, -y, y)
        coo.x = np.where(on_eq, lam, np.where(on_mer, 0.0, x))
        coo.y = np.where(on_eq, 0.0, np.where(on_mer, phi, y))


@register
class Tpeqd(_Sph):
    """Two Point Equidistant (tpeqd.cpp)."""

    name = "tpeqd"

    def setup(self) -> None:
        super().setup()
        from ..mathx import adjlon as _adj

        p = self.params
        phi_1 = p.rad("lat_1", 0.0)
        lam_1 = p.rad("lon_1", 0.0)
        phi_2 = p.rad("lat_2", 0.0)
        lam_2 = p.rad("lon_2", 0.0)
        if phi_1 == phi_2 and lam_1 == lam_2:
            from ..core.errors import ERR_CONTROL_POINT_NO_DIST

            raise ProjError(ERR_CONTROL_POINT_NO_DIST)
        self.lam0 = float(_adj(np.array([0.5 * (lam_1 + lam_2)]))[0])
        dlam2 = float(_adj(np.array([lam_2 - lam_1]))[0])
        self.cp1 = math.cos(phi_1)
        self.cp2 = math.cos(phi_2)
        self.sp1 = math.sin(phi_1)
        self.sp2 = math.sin(phi_2)
        self.cs = self.cp1 * self.sp2
        self.sc = self.sp1 * self.cp2
        self.ccs = self.cp1 * self.cp2 * math.sin(dlam2)
        z02 = math.acos(max(-1, min(1, self.sp1 * self.sp2 + self.cp1 * self.cp2 * math.cos(dlam2))))
        if z02 == 0.0:
            from ..core.errors import ERR_CONTROL_POINT_NO_DIST

            raise ProjError(ERR_CONTROL_POINT_NO_DIST)
        self.hz0 = 0.5 * z02
        A12 = math.atan2(
            self.cp2 * math.sin(dlam2),
            self.cp1 * self.sp2 - self.sp1 * self.cp2 * math.cos(dlam2),
        )
        pp = math.asin(max(-1, min(1, self.cp1 * math.sin(A12))))
        self.ca = math.cos(pp)
        self.sa = math.sin(pp)
        self.lp = float(_adj(np.array([math.atan2(self.cp1 * math.cos(A12), self.sp1) - self.hz0]))[0])
        self.dlam2 = dlam2 * 0.5
        self.lamc = M_HALFPI - math.atan2(math.sin(A12) * self.sp1, math.cos(A12)) - self.dlam2
        self.thz0 = math.tan(self.hz0)
        self.rhshz0 = 0.5 / math.sin(self.hz0)
        self.r2z0 = 0.5 / z02
        self.z02 = z02 * z02

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        sp = np.sin(phi)
        cp = np.cos(phi)
        dl1 = lam + self.dlam2
        dl2 = lam - self.dlam2
        from ..mathx import aacos

        z1, _ = aacos(self.sp1 * sp + self.cp1 * cp * np.cos(dl1))
        z2, _ = aacos(self.sp2 * sp + self.cp2 * cp * np.cos(dl2))
        z1 = z1 * z1
        z2 = z2 * z2
        t = z1 - z2
        x = self.r2z0 * t
        t = self.z02 - t
        y = self.r2z0 * asqrt(4.0 * self.z02 * z2 - t * t)
        y = np.where(
            (self.ccs * sp - cp * (self.cs * np.sin(dl1) - self.sc * np.sin(dl2))) < 0.0,
            -y, y,
        )
        coo.x, coo.y = x, y

    def _inv(self, coo: Coords) -> None:
        from ..mathx import aacos

        x, y = coo.x, coo.y
        cz1 = np.cos(np.hypot(y, x + self.hz0))
        cz2 = np.cos(np.hypot(y, x - self.hz0))
        s = cz1 + cz2
        d = cz1 - cz2
        lam = -np.arctan2(d, s * self.thz0)
        phi, err = aacos(np.hypot(self.thz0 * s, d) * self.rhshz0)
        coo.set_err(err, -19)
        phi = np.where(y < 0.0, -phi, phi)
        sp = np.sin(phi)
        cp = np.cos(phi)
        lam = lam - self.lp
        s2 = np.cos(lam)
        phi2, err2 = aasin(self.sa * sp + self.ca * cp * s2)
        coo.set_err(err2, -19)
        lam2 = np.arctan2(cp * np.sin(lam), self.sa * cp * s2 - self.ca * sp) + self.lamc
        coo.x, coo.y = lam2, phi2


class _SconicsBase(_Sph):
    """Simple conics family (sconics.cpp): euler/murd1-3/pconic/tissot/vitk1."""

    ctype = "euler"

    def setup(self) -> None:
        super().setup()
        from ..core.errors import (
            ERR_ABS_LAT1_EQ_ABS_LAT2,
            ERR_LAT_1_2_UNSPECIFIED,
            ERR_LAT_0_HALF_PI_FROM_MEAN,
        )

        p = self.params
        if not p.has("lat_1") or not p.has("lat_2"):
            raise ProjError(ERR_LAT_1_2_UNSPECIFIED)
        p1 = p.rad("lat_1")
        p2 = p.rad("lat_2")
        del_ = 0.5 * (p2 - p1)
        self.sig = 0.5 * (p2 + p1)
        if abs(del_) < 1e-10 or abs(self.sig) < 1e-10:
            raise ProjError(ERR_ABS_LAT1_EQ_ABS_LAT2)
        t = self.ctype
        self.c1 = self.c2 = 0.0
        if t == "tissot":
            self.n = math.sin(self.sig)
            cs = math.cos(del_)
            self.rho_c = self.n / cs + cs / self.n
            self.rho_0 = math.sqrt((self.rho_c - 2 * math.sin(self.phi0)) / self.n)
        elif t == "murd1":
            self.rho_c = math.sin(del_) / (del_ * math.tan(self.sig)) + self.sig
            self.rho_0 = self.rho_c - self.phi0
            self.n = math.sin(self.sig)
        elif t == "murd2":
            cs = math.sqrt(math.cos(del_))
            self.rho_c = cs / math.tan(self.sig)
            self.rho_0 = self.rho_c + math.tan(self.sig - self.phi0)
            self.n = math.sin(self.sig) * cs
        elif t == "murd3":
            self.rho_c = del_ / (math.tan(self.sig) * math.tan(del_)) + self.sig
            self.rho_0 = self.rho_c - self.phi0
            self.n = math.sin(self.sig) * math.sin(del_) * math.tan(del_) / (del_ * del_)
        elif t == "euler":
            self.n = math.sin(self.sig) * math.sin(del_) / del_
            del_ *= 0.5
            self.rho_c = del_ / (math.tan(del_) * math.tan(self.sig)) + self.sig
            self.rho_0 = self.rho_c - self.phi0
        elif t == "pconic":
            self.n = math.sin(self.sig)
            self.c2 = math.cos(del_)
            self.c1 = 1.0 / math.tan(self.sig)
            dd = self.phi0 - self.sig
            if abs(dd) - 1e-10 >= M_HALFPI:
                raise ProjError(ERR_LAT_0_HALF_PI_FROM_MEAN)
            self.rho_0 = self.c2 * (self.c1 - math.tan(dd))
        else:  # vitk1
            cs = math.tan(del_)
            self.n = cs * math.sin(self.sig) / del_
            self.rho_c = del_ / (cs * math.tan(self.sig)) + self.sig
            self.rho_0 = self.rho_c - self.phi0

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        if self.ctype == "murd2":
            rho = self.rho_c + np.tan(self.sig - phi)
        elif self.ctype == "pconic":
            rho = self.c2 * (self.c1 - np.tan(phi - self.sig))
        else:
            rho = self.rho_c - phi
        lamn = lam * self.n
        coo.x = rho * np.sin(lamn)
        coo.y = self.rho_0 - rho * np.cos(lamn)

    def _inv(self, coo: Coords) -> None:
        x = coo.x
        y = self.rho_0 - coo.y
        rho = np.hypot(x, y)
        if self.n < 0.0:
            rho = -rho
            x = -x
            y = -y
        coo.x = np.arctan2(x, y) / self.n
        if self.ctype == "pconic":
            coo.y = np.arctan(self.c1 - rho / self.c2) + self.sig
        elif self.ctype == "murd2":
            coo.y = self.sig - np.arctan(rho - self.rho_c)
        else:
            coo.y = self.rho_c - rho


for _name in ("euler", "murd1", "murd2", "murd3", "pconic", "tissot", "vitk1"):
    _cls = type(_name.capitalize(), (_SconicsBase,), {"name": _name, "ctype": _name})
    register(_cls)


@register
class Nsper(_Sph):
    """Near-sided perspective (nsper.cpp); tpers adds tilt/azimuth."""

    name = "nsper"
    tilt = False

    def setup(self) -> None:
        super().setup()
        self.height = self.params.float_("h", 0.0)
        t = abs(self.phi0)
        if abs(t - M_HALFPI) < 1e-10:
            self.mode = "s_pole" if self.phi0 < 0 else "n_pole"
        elif t < 1e-10:
            self.mode = "equit"
        else:
            self.mode = "obliq"
        self.sinph0 = math.sin(self.phi0)
        self.cosph0 = math.cos(self.phi0)
        self.pn1 = self.height / self.ell.a
        if self.pn1 <= 0 or self.pn1 > 1e10:
            from ..core.errors import ERR_INVALID_H

            raise ProjError(ERR_INVALID_H)
        self.p = 1.0 + self.pn1
        self.rp = 1.0 / self.p
        self.h = 1.0 / self.pn1
        self.pfact = (self.p + 1.0) * self.h
        if self.tilt:
            omega = self.params.rad("tilt", 0.0)
            gamma = self.params.rad("azi", 0.0)
            self.cg = math.cos(gamma)
            self.sg = math.sin(gamma)
            self.cw = math.cos(omega)
            self.sw = math.sin(omega)

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        if self.mode == "obliq":
            y = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam
        elif self.mode == "equit":
            y = cosphi * coslam
        elif self.mode == "s_pole":
            y = -sinphi
        else:
            y = sinphi
        hidden = y < self.rp
        coo.set_err(hidden, ERR_TOLERANCE_CONDITION)
        with np.errstate(divide="ignore", invalid="ignore"):
            y = self.pn1 / (self.p - y)
        x = y * cosphi * np.sin(lam)
        if self.mode == "obliq":
            y = y * (self.cosph0 * sinphi - self.sinph0 * cosphi * coslam)
        elif self.mode == "equit":
            y = y * sinphi
        elif self.mode == "n_pole":
            y = y * cosphi * (-coslam)
        else:
            y = y * cosphi * coslam
        if self.tilt:
            yt = y * self.cg + x * self.sg
            ba = 1.0 / (yt * self.sw * self.h + self.cw)
            x2 = (x * self.cg - y * self.sg) * self.cw * ba
            y = yt * ba
            x = x2
        coo.x = np.where(hidden, np.inf, x)
        coo.y = np.where(hidden, np.inf, y)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x.copy(), coo.y.copy()
        if self.tilt:
            yt = 1.0 / (self.pn1 - y * self.sw)
            bm = self.pn1 * x * yt
            bq = self.pn1 * y * self.cw * yt
            x = bm * self.cg + bq * self.sg
            y = bq * self.cg - bm * self.sg
        rh = np.hypot(x, y)
        center = np.abs(rh) <= 1e-10
        sinz = 1.0 - rh * rh * self.pfact
        bad = sinz < 0.0
        coo.set_err(bad & ~center, ERR_TOLERANCE_CONDITION)
        with np.errstate(divide="ignore", invalid="ignore"):
            sinz = (self.p - np.sqrt(np.maximum(sinz, 0.0))) / (self.pn1 / rh + rh / self.pn1)
            cosz = np.sqrt(np.maximum(1.0 - sinz * sinz, 0.0))
            if self.mode == "obliq":
                phi = np.arcsin(np.clip(cosz * self.sinph0 + y * sinz * self.cosph0 / rh, -1, 1))
                y2 = (cosz - self.sinph0 * np.sin(phi)) * rh
                x2 = x * sinz * self.cosph0
            elif self.mode == "equit":
                phi = np.arcsin(np.clip(y * sinz / rh, -1, 1))
                y2 = cosz * rh
                x2 = x * sinz
            elif self.mode == "n_pole":
                phi = np.arcsin(np.clip(cosz, -1, 1))
                y2 = -y
                x2 = x
            else:
                phi = -np.arcsin(np.clip(cosz, -1, 1))
                y2 = y
                x2 = x
            lam = np.arctan2(x2, y2)
        coo.x = np.where(bad, np.inf, np.where(center, 0.0, lam))
        coo.y = np.where(bad, np.inf, np.where(center, self.phi0, phi))


@register
class Tpers(Nsper):
    name = "tpers"
    tilt = True


@register
class Rpoly(_Sph):
    name = "rpoly"

    def setup(self) -> None:
        super().setup()
        self.phi1 = abs(self.params.rad("lat_ts", 0.0))
        self.mode = self.phi1 > 1e-9
        if self.mode:
            self.fxb = 0.5 * math.sin(self.phi1)
            self.fxa = 0.5 / self.fxb

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        if self.mode:
            fa = np.tan(lam * self.fxb) * self.fxa
        else:
            fa = 0.5 * lam
        on_eq = np.abs(phi) < 1e-9
        with np.errstate(divide="ignore", invalid="ignore"):
            cot = 1.0 / np.tan(phi)
            fa2 = 2.0 * np.arctan(fa * np.sin(phi))
            x = np.sin(fa2) * cot
            y = phi - self.phi0 + (1.0 - np.cos(fa2)) * cot
        coo.x = np.where(on_eq, fa + fa, x)
        coo.y = np.where(on_eq, -self.phi0, y)


@register
class Ocea(_Sph):
    """Oblique Cylindrical Equal Area (ocea.cpp)."""

    name = "ocea"

    def setup(self) -> None:
        super().setup()
        self.rok = 1.0 / self.k0
        self.rtk = self.k0
        p = self.params
        if p.has("alpha"):
            alpha = M_PI + p.rad("alpha")
            lonz = p.rad("lonc", 0.0)
            lam_p = math.atan2(-math.cos(alpha), -math.sin(self.phi0) * math.sin(alpha)) + lonz
            phi_p = math.asin(math.cos(self.phi0) * math.sin(alpha))
        else:
            phi_1 = p.rad("lat_1", 0.0)
            phi_2 = p.rad("lat_2", 0.0)
            lam_1 = p.rad("lon_1", 0.0)
            lam_2 = p.rad("lon_2", 0.0)
            lam_p = math.atan2(
                math.cos(phi_1) * math.sin(phi_2) * math.cos(lam_1)
                - math.sin(phi_1) * math.cos(phi_2) * math.cos(lam_2),
                math.sin(phi_1) * math.cos(phi_2) * math.sin(lam_2)
                - math.cos(phi_1) * math.sin(phi_2) * math.sin(lam_1),
            )
            if lam_1 == -M_HALFPI:
                lam_p = -lam_p
            c = math.cos(lam_p - lam_1)
            t1 = math.tan(phi_1)
            if t1 == 0.0:
                phi_p = -M_HALFPI if c >= 0.0 else M_HALFPI
            else:
                phi_p = math.atan(-c / t1)
        self.lam0 = lam_p + M_HALFPI
        self.cosphi = math.cos(phi_p)
        self.sinphi = math.sin(phi_p)

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        s = np.sin(lam)
        t = np.cos(lam)
        with np.errstate(divide="ignore", invalid="ignore"):
            x = np.arctan((np.tan(phi) * self.cosphi + self.sinphi * s) / t)
        x = np.where(t < 0.0, x + M_PI, x)
        coo.x = x * self.rtk
        coo.y = self.rok * (self.sinphi * np.sin(phi) - self.cosphi * np.cos(phi) * s)

    def _inv(self, coo: Coords) -> None:
        y = coo.y / self.rok
        x = coo.x / self.rtk
        t = np.sqrt(np.maximum(1.0 - y * y, 0.0))
        s = np.sin(x)
        coo.y = np.arcsin(np.clip(y * self.sinphi + t * self.cosphi * s, -1, 1))
        coo.x = np.arctan2(t * self.sinphi * s - y * self.cosphi, t * np.cos(x))


@register
class Oea(_Sph):
    """Oblated Equal Area (oea.cpp)."""

    name = "oea"

    def setup(self) -> None:
        super().setup()
        self.n = self.params.float_("n", 0.0)
        self.m = self.params.float_("m", 0.0)
        if self.n <= 0.0 or self.m <= 0.0:
            raise ProjError(ERR_N_OUT_OF_RANGE)
        self.theta = self.params.rad("theta", 0.0)
        self.sp0 = math.sin(self.phi0)
        self.cp0 = math.cos(self.phi0)
        self.rn = 1.0 / self.n
        self.rm = 1.0 / self.m
        self.two_r_n = 2.0 * self.rn
        self.two_r_m = 2.0 * self.rm
        self.hm = 0.5 * self.m
        self.hn = 0.5 * self.n

    def _fwd(self, coo: Coords) -> None:
        from ..mathx import aacos

        lam, phi = coo.x, coo.y
        cp = np.cos(phi)
        sp = np.sin(phi)
        cl = np.cos(lam)
        Az = np.arctan2(cp * np.sin(lam), self.cp0 * sp - self.sp0 * cp * cl) + self.theta
        acz, _ = aacos(self.sp0 * sp + self.cp0 * cp * cl)
        shz = np.sin(0.5 * acz)
        M, e1 = aasin(shz * np.sin(Az))
        coo.set_err(e1, -19)
        with np.errstate(divide="ignore", invalid="ignore"):
            N, e2 = aasin(shz * np.cos(Az) * np.cos(M) / np.cos(M * self.two_r_m))
        coo.set_err(e2, -19)
        coo.y = self.n * np.sin(N * self.two_r_n)
        with np.errstate(divide="ignore", invalid="ignore"):
            coo.x = self.m * np.sin(M * self.two_r_m) * np.cos(N) / np.cos(N * self.two_r_n)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        N0, e1 = aasin(y * self.rn)
        coo.set_err(e1, -19)
        N = self.hn * N0
        with np.errstate(divide="ignore", invalid="ignore"):
            M0, e2 = aasin(x * self.rm * np.cos(N * self.two_r_n) / np.cos(N))
        coo.set_err(e2, -19)
        M = self.hm * M0
        xp = 2.0 * np.sin(M)
        with np.errstate(divide="ignore", invalid="ignore"):
            yp = 2.0 * np.sin(N) * np.cos(M * self.two_r_m) / np.cos(M)
        Az = np.arctan2(xp, yp) - self.theta
        cAz = np.cos(Az)
        z0, e3 = aasin(0.5 * np.hypot(xp, yp))
        coo.set_err(e3, -19)
        z = 2.0 * z0
        sz = np.sin(z)
        cz = np.cos(z)
        phi, e4 = aasin(self.sp0 * cz + self.cp0 * sz * cAz)
        coo.set_err(e4, -19)
        coo.y = phi
        coo.x = np.arctan2(sz * np.sin(Az), self.cp0 * cz - self.sp0 * sz * cAz)


@register
class ObTran(Operation):
    """General Oblique Transformation (ob_tran.cpp): spherical rotation
    to a new pole/equator, then the linked projection's raw kernel."""

    name = "ob_tran"
    need_ellps = True
    TOLC = 1e-10

    def setup(self) -> None:
        from ..core.errors import (
            ERR_LAT_0_OR_ALPHA_EQ_90,
            ERR_LAT_1_OR_2_ZERO_OR_90,
            ERR_NO_ROTATION_PROJ,
            ERR_FAILED_TO_FIND_PROJ,
        )
        from ..core.factory import init_operation
        from ..core.params import Params
        from ..core.op import IO_RADIANS, IO_WHATEVER
        from ..mathx import adjlon as _adj

        p = self.params
        if not p.has("o_proj"):
            raise ProjError(ERR_NO_ROTATION_PROJ)
        # the rename scans for the first o_proj=VALUE entry (flags pass
        # through), mirroring ob_tran_target_params (ob_tran.cpp)
        o_proj = next((v for k, v in p.pairs if k == "o_proj" and v), None)
        if o_proj is None:
            raise ProjError(ERR_NO_ROTATION_PROJ)
        if o_proj == "ob_tran":
            raise ProjError(ERR_FAILED_TO_FIND_PROJ)
        link_pairs = [("proj", o_proj)] + [
            (k, v) for k, v in p.pairs if k not in ("proj", "o_proj")
        ]
        self.link = init_operation(Params(link_pairs), cs2cs_emulation=False)

        if p.has("o_alpha"):
            lamc = p.rad("o_lon_c", 0.0)
            phic = p.rad("o_lat_c", 0.0)
            alpha = p.rad("o_alpha", 0.0)
            if abs(abs(phic) - M_HALFPI) <= self.TOLC:
                raise ProjError(ERR_LAT_0_OR_ALPHA_EQ_90)
            self.lamp = lamc + math.atan2(-math.cos(alpha), -math.sin(alpha) * math.sin(phic))
            phip = math.asin(max(-1, min(1, math.cos(phic) * math.sin(alpha))))
        elif p.has("o_lat_p"):
            self.lamp = p.rad("o_lon_p", 0.0)
            phip = p.rad("o_lat_p", 0.0)
        else:
            lam1 = p.rad("o_lon_1", 0.0)
            phi1 = p.rad("o_lat_1", 0.0)
            lam2 = p.rad("o_lon_2", 0.0)
            phi2 = p.rad("o_lat_2", 0.0)
            con = abs(phi1)
            if (
                abs(phi1 - phi2) <= self.TOLC or con <= self.TOLC
                or abs(con - M_HALFPI) <= self.TOLC
                or abs(abs(phi2) - M_HALFPI) <= self.TOLC
            ):
                raise ProjError(ERR_LAT_1_OR_2_ZERO_OR_90)
            self.lamp = math.atan2(
                math.cos(phi1) * math.sin(phi2) * math.cos(lam1)
                - math.sin(phi1) * math.cos(phi2) * math.cos(lam2),
                math.sin(phi1) * math.cos(phi2) * math.sin(lam2)
                - math.cos(phi1) * math.sin(phi2) * math.sin(lam1),
            )
            phip = math.atan(-math.cos(self.lamp - lam1) / math.tan(phi1))
        self.oblique = abs(phip) > self.TOLC
        self.cphip = math.cos(phip)
        self.sphip = math.sin(phip)
        if self.link.eff_right() == IO_RADIANS:
            self.right = IO_WHATEVER

    @property
    def has_inverse(self) -> bool:
        return self.link.has_inverse

    def _check_link_2d(self, coo: Coords) -> bool:
        # linked op without a 2D interface → EINVAL per pj_fwd/pj_inv
        # dispatch on a null P->fwd/P->inv (fwd.cpp/inv.cpp)
        if not getattr(self.link, "has_2d_interface", True):
            coo.set_err(np.isfinite(coo.x), 22)
            return False
        return True

    def _fwd(self, coo: Coords) -> None:
        from ..mathx import adjlon as _adj

        if not self._check_link_2d(coo):
            return
        lam, phi = coo.x, coo.y
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        if self.oblique:
            sinphi = np.sin(phi)
            nlam = _adj(
                np.arctan2(cosphi * np.sin(lam),
                           self.sphip * cosphi * coslam + self.cphip * sinphi)
                + self.lamp
            )
            nphi, err = aasin(self.sphip * sinphi - self.cphip * cosphi * coslam)
        else:
            nlam = _adj(np.arctan2(cosphi * np.sin(lam), np.sin(phi)) + self.lamp)
            nphi, err = aasin(-cosphi * coslam)
        coo.set_err(err, -19)
        coo.x, coo.y = nlam, nphi
        self.link._fwd(coo)

    def _inv(self, coo: Coords) -> None:
        if not self._check_link_2d(coo):
            return
        self.link._inv(coo)
        lam, phi = coo.x, coo.y
        ok = np.isfinite(lam)
        cosphi = np.cos(phi)
        if self.oblique:
            lam2 = lam - self.lamp
            coslam = np.cos(lam2)
            sinphi = np.sin(phi)
            nphi, err = aasin(self.sphip * sinphi + self.cphip * cosphi * coslam)
            nlam = np.arctan2(cosphi * np.sin(lam2),
                              self.sphip * cosphi * coslam - self.cphip * sinphi)
        else:
            t = lam - self.lamp
            nlam = np.arctan2(cosphi * np.sin(t), -np.sin(phi))
            nphi, err = aasin(cosphi * np.cos(t))
        coo.set_err(ok & err, -19)
        coo.x = np.where(ok, nlam, lam)
        coo.y = np.where(ok, nphi, phi)


@register
class Goode(_Sph):
    """Goode Homolosine (goode.cpp): sinu below 40°44'11.8", moll above."""

    name = "goode"
    Y_COR = 0.05280
    PHI_LIM = 0.71093078197902358062

    def setup(self) -> None:
        super().setup()
        from ..core.factory import init_operation
        from ..core.params import Params

        a = repr(self.ell.a)
        self.sinu = init_operation(Params.parse(f"+proj=sinu +a={a} +es=0"), cs2cs_emulation=False)
        self.moll = init_operation(Params.parse(f"+proj=moll +a={a} +es=0"), cs2cs_emulation=False)

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        lo = np.abs(phi) <= self.PHI_LIM
        cs = Coords(lam.copy(), phi.copy())
        self.sinu._fwd(cs)
        cm = Coords(lam.copy(), phi.copy())
        self.moll._fwd(cm)
        ym = cm.y - np.where(phi >= 0.0, self.Y_COR, -self.Y_COR)
        coo.x = np.where(lo, cs.x, cm.x)
        coo.y = np.where(lo, cs.y, ym)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        lo = np.abs(y) <= self.PHI_LIM
        cs = Coords(x.copy(), y.copy())
        self.sinu._inv(cs)
        ym = y + np.where(y >= 0.0, self.Y_COR, -self.Y_COR)
        cm = Coords(x.copy(), ym)
        self.moll._inv(cm)
        coo.x = np.where(lo, cs.x, cm.x)
        coo.y = np.where(lo, cs.y, cm.y)


@register
class Hatano(_Sph):
    name = "hatano"
    CN, CSz = 2.67595, 2.43763
    RCN, RCS = 0.37369906014686373063, 0.41023453108141924738
    FYCN, FYCS = 1.75859, 1.93052
    RYCN, RYCS = 0.56863737426006061674, 0.51799515156538134803
    FXC, RXC = 0.85, 1.17647058823529411764

    def _fwd(self, coo: Coords) -> None:
        lam, phi0 = coo.x, coo.y
        c = np.sin(phi0) * np.where(phi0 < 0.0, self.CSz, self.CN)
        phi = phi0.copy()
        active = np.isfinite(phi)
        for _ in range(20):
            if not np.any(active):
                break
            p = phi[active]
            th1 = (p + np.sin(p) - c[active]) / (1.0 + np.cos(p))
            phi[active] = p - th1
            done = np.abs(th1) < 1e-7
            idx = np.flatnonzero(active)
            active[idx[done]] = False
        phi = phi * 0.5
        coo.x = self.FXC * lam * np.cos(phi)
        coo.y = np.sin(phi) * np.where(phi < 0.0, self.FYCS, self.FYCN)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        th = y * np.where(y < 0.0, self.RYCS, self.RYCN)
        over = np.abs(th) > 1.0
        coo.set_err(np.abs(th) > 1.000001, ERR_TOLERANCE_CONDITION)
        th = np.where(over, np.where(th > 0, M_HALFPI, -M_HALFPI),
                      np.arcsin(np.clip(th, -1, 1)))
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = self.RXC * x / np.cos(th)
        th = th + th
        phi = (th + np.sin(th)) * np.where(y < 0.0, self.RCS, self.RCN)
        over2 = np.abs(phi) > 1.0
        coo.set_err(np.abs(phi) > 1.000001, ERR_TOLERANCE_CONDITION)
        phi = np.where(over2, np.where(phi > 0, M_HALFPI, -M_HALFPI),
                       np.arcsin(np.clip(phi, -1, 1)))
        coo.x, coo.y = lam, phi
