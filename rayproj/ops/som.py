"""Space Oblique Mercator family: lsat (LANDSAT) and misrsom (MISR).

Math re-derived from /root/reference/src/projections/lsat.cpp and
misrsom.cpp: Fourier coefficients via the seraz0 31-point Simpson sums,
forward with the nested satellite-track iteration (outer ≤3 passes over
the start quadrant, inner ≤50/51-step fixed point), inverse via the
lamdp fixed point — vectorized with per-lane masks.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import DEG_TO_RAD, M_FORTPI, M_HALFPI, M_PI
from ..core.errors import (
    ERR_INVALID_X_OR_Y,
    ERR_LSAT_NOT_IN_RANGE,
    ERR_NON_CONVERGENT,
    ERR_PATH_NOT_IN_RANGE,
    ProjError,
)
from ..core.op import Coords, Operation
from . import register

TOL = 1e-7
M_TWOPI = 2 * M_PI
M_PI_HALFPI = M_PI + M_HALFPI
M_TWOPI_HALFPI = M_TWOPI + M_HALFPI


class _SomBase(Operation):
    need_ellps = True
    INNER_INCLUSIVE = False  # lsat iterates l=50..0 (51), misrsom 50..1
    DENOM_ERR = ERR_NON_CONVERGENT

    def _setup_common(self, alf: float, p22: float, rlm: float) -> None:
        es, one_es, rone_es = self.ell.es, self.ell.one_es, self.ell.rone_es
        self.p22 = p22
        self.sa = math.sin(alf)
        self.ca = math.cos(alf)
        if abs(self.ca) < 1e-9:
            self.ca = 1e-9
        esc = es * self.ca * self.ca
        ess = es * self.sa * self.sa
        w = (1.0 - esc) * rone_es
        self.w = w * w - 1.0
        self.q = ess * rone_es
        self.t = ess * (2.0 - es) * rone_es * rone_es
        self.u = esc * rone_es
        self.xj = one_es ** 3
        self.rlm = rlm
        self.rlm2 = rlm + M_TWOPI
        self.a2 = self.a4 = self.b = self.c1 = self.c3 = 0.0
        self._seraz0(0.0, 1.0)
        lam = 9.0
        while lam <= 81.0001:
            self._seraz0(lam, 4.0)
            lam += 18.0
        lam = 18.0
        while lam <= 72.0001:
            self._seraz0(lam, 2.0)
            lam += 18.0
        self._seraz0(90.0, 1.0)
        self.a2 /= 30.0
        self.a4 /= 60.0
        self.b /= 30.0
        self.c1 /= 15.0
        self.c3 /= 45.0

    def _seraz0(self, lam, mult):
        lam *= DEG_TO_RAD
        sd = math.sin(lam)
        sdsq = sd * sd
        s = self.p22 * self.sa * math.cos(lam) * math.sqrt(
            (1.0 + self.t * sdsq) / ((1.0 + self.w * sdsq) * (1.0 + self.q * sdsq)))
        d1 = 1.0 + self.q * sdsq
        h = math.sqrt((1.0 + self.q * sdsq) / (1.0 + self.w * sdsq)) * (
            (1.0 + self.w * sdsq) / (d1 * d1) - self.p22 * self.ca)
        sq = math.sqrt(self.xj * self.xj + s * s)
        fc = mult * (h * self.xj - s * s) / sq
        self.b += fc
        self.a2 += fc * math.cos(lam + lam)
        self.a4 += fc * math.cos(lam * 4.0)
        fc = mult * s * (h + self.xj) / sq
        self.c1 += fc * math.cos(lam)
        self.c3 += fc * math.cos(lam * 3.0)

    def _s_of(self, lamdp):
        sd = np.sin(lamdp)
        sdsq = sd * sd
        return self.p22 * self.sa * np.cos(lamdp) * np.sqrt(
            (1.0 + self.t * sdsq)
            / ((1.0 + self.w * sdsq) * (1.0 + self.q * sdsq)))

    def _fwd(self, coo: Coords) -> None:
        one_es, es = self.ell.one_es, self.ell.es
        lam = coo.x
        phi = np.clip(coo.y, -M_HALFPI, M_HALFPI)
        n = len(lam)
        lampp = np.where(phi >= 0.0, M_HALFPI, M_PI_HALFPI)
        tanphi = np.tan(phi)
        lamdp = np.zeros(n)
        lamt = np.zeros(n)
        failed = np.zeros(n, dtype=bool)
        outer_active = np.isfinite(lam) & np.isfinite(phi)
        # The reference's l-counter semantics differ per variant:
        # lsat runs l=50..0 (51 passes); "!l" (failure) only when the
        # tolerance hits exactly on the l==0 pass — exhausting the loop
        # leaves l==-1, which is truthy, i.e. SUCCESS with the last
        # iterate. misrsom runs l=50..1 (50 passes); exhaustion leaves
        # l==0 → failure, any convergence → success.
        for _outer in range(3):
            if not np.any(outer_active):
                break
            oa = outer_active
            sav = lampp[oa].copy()
            lamtp = lam[oa] + self.p22 * lampp[oa]
            cl = np.cos(lamtp)
            fac = np.where(cl < 0, lampp[oa] + np.sin(lampp[oa]) * M_HALFPI,
                           lampp[oa] - np.sin(lampp[oa]) * M_HALFPI)
            m = int(np.count_nonzero(oa))
            sub_active = np.ones(m, dtype=bool)
            done_last_pass = np.zeros(m, dtype=bool)
            done_any = np.zeros(m, dtype=bool)
            ld = np.zeros(m)
            lt = np.zeros(m)
            n_inner = 51 if self.INNER_INCLUSIVE else 50
            lam_oa = lam[oa]
            tan_oa = tanphi[oa]
            for li in range(n_inner):
                if not np.any(sub_active):
                    break
                lt_a = lam_oa[sub_active] + self.p22 * sav[sub_active]
                c = np.cos(lt_a)
                lt_a = np.where(np.abs(c) < TOL, lt_a - TOL, lt_a)
                xlam = (one_es * tan_oa[sub_active] * self.sa
                        + np.sin(lt_a) * self.ca) / c
                ld_a = np.arctan(xlam) + fac[sub_active]
                lt[sub_active] = lt_a
                ld[sub_active] = ld_a
                done = np.abs(np.abs(sav[sub_active]) - np.abs(ld_a)) < TOL
                idx = np.flatnonzero(sub_active)
                done_any[idx[done]] = True
                if li == n_inner - 1:
                    done_last_pass[idx[done]] = True
                sav[sub_active] = np.where(done, sav[sub_active], ld_a)
                rem = sub_active.copy()
                rem[idx[done]] = False
                sub_active = rem
            if self.INNER_INCLUSIVE:  # lsat
                fail_now = done_last_pass  # converged exactly at l==0
            else:  # misrsom: never converged
                fail_now = ~done_any
            lamdp[oa] = ld
            lamt[oa] = lt
            in_band = (ld > self.rlm) & (ld < self.rlm2)
            stop = fail_now | in_band | (_outer == 2)
            tmp = failed[oa]
            tmp[fail_now] = True
            failed[oa] = tmp
            new_lampp = np.where(ld <= self.rlm, M_TWOPI_HALFPI,
                                 np.where(ld >= self.rlm2, M_HALFPI, lampp[oa]))
            lampp[oa] = new_lampp
            rem = outer_active.copy()
            rem[np.flatnonzero(oa)[stop]] = False
            outer_active = rem
        bad = failed & np.isfinite(lam)
        sp = np.sin(phi)
        phidp = np.arcsin(np.clip(
            (one_es * self.ca * sp - self.sa * np.cos(phi) * np.sin(lamt))
            / np.sqrt(1.0 - es * sp * sp), -1.0, 1.0))
        tanph = np.log(np.tan(M_FORTPI + 0.5 * phidp))
        s = self._s_of(lamdp)
        d = np.sqrt(self.xj * self.xj + s * s)
        x = (self.b * lamdp + self.a2 * np.sin(2.0 * lamdp)
             + self.a4 * np.sin(lamdp * 4.0) - tanph * s / d)
        y = (self.c1 * np.sin(lamdp) + self.c3 * np.sin(lamdp * 3.0)
             + tanph * self.xj / d)
        coo.x = np.where(bad, np.inf, x)
        coo.y = np.where(bad, np.inf, y)

    def _inv(self, coo: Coords) -> None:
        one_es, es, rone_es = self.ell.one_es, self.ell.es, self.ell.rone_es
        X, Y = coo.x, coo.y
        lamdp = X / self.b
        s = self._s_of(lamdp)
        active = np.isfinite(X) & np.isfinite(Y)
        for _ in range(50):
            if not np.any(active):
                break
            sav = lamdp[active]
            sa_ = self._s_of(sav)
            s[active] = sa_
            ld = (X[active] + Y[active] * sa_ / self.xj
                  - self.a2 * np.sin(2.0 * sav) - self.a4 * np.sin(sav * 4.0)
                  - sa_ / self.xj * (self.c1 * np.sin(sav)
                                     + self.c3 * np.sin(sav * 3.0)))
            ld = ld / self.b
            lamdp[active] = ld
            done = np.abs(ld - sav) < TOL
            idx = np.flatnonzero(active)
            rem = active.copy()
            rem[idx[done]] = False
            active = rem
        sl = np.sin(lamdp)
        fac = np.exp(np.sqrt(1.0 + s * s / self.xj / self.xj)
                     * (Y - self.c1 * sl - self.c3 * np.sin(lamdp * 3.0)))
        phidp = 2.0 * (np.arctan(fac) - M_FORTPI)
        dd = sl * sl
        lamdp = np.where(np.abs(np.cos(lamdp)) < TOL, lamdp - TOL, lamdp)
        spp = np.sin(phidp)
        sppsq = spp * spp
        denom = 1.0 - sppsq * (1.0 + self.u)
        bad = (denom == 0.0) & np.isfinite(X)
        coo.set_err(bad, self.DENOM_ERR)
        with np.errstate(divide="ignore", invalid="ignore"):
            lamt = np.arctan(
                ((1.0 - sppsq * rone_es) * np.tan(lamdp) * self.ca
                 - spp * self.sa * np.sqrt(np.maximum(
                     (1.0 + self.q * dd) * (1.0 - sppsq) - sppsq * self.u, 0.0))
                 / np.cos(lamdp)) / np.where(denom != 0, denom, 1.0))
        sl_sign = np.where(lamt >= 0.0, 1.0, -1.0)
        scl = np.where(np.cos(lamdp) >= 0.0, 1.0, -1.0)
        lamt = lamt - M_HALFPI * (1.0 - scl) * sl_sign
        lam = lamt - self.p22 * lamdp
        if abs(self.sa) < TOL:
            phi = np.arcsin(np.clip(
                spp / np.sqrt(one_es * one_es + es * sppsq), -1.0, 1.0))
        else:
            phi = np.arctan((np.tan(lamdp) * np.cos(lamt)
                             - self.ca * np.sin(lamt)) / (one_es * self.sa))
        coo.x = np.where(bad, np.inf, lam)
        coo.y = np.where(bad, np.inf, phi)


@register
class Lsat(_SomBase):
    name = "lsat"
    INNER_INCLUSIVE = True
    DENOM_ERR = ERR_INVALID_X_OR_Y

    def setup(self) -> None:
        land = self.params.int_("lsat", 0)
        if land <= 0 or land > 5:
            raise ProjError(ERR_LSAT_NOT_IN_RANGE, "lsat: lsat not in 1..5")
        path = self.params.int_("path", 0)
        if path <= 0 or path > (251 if land <= 3 else 233):
            raise ProjError(ERR_PATH_NOT_IN_RANGE, "lsat: path out of range")
        if land <= 3:
            self.lam0 = DEG_TO_RAD * 128.87 - M_TWOPI / 251.0 * path
            p22 = 103.2669323
            alf = DEG_TO_RAD * 99.092
        else:
            self.lam0 = DEG_TO_RAD * 129.3 - M_TWOPI / 233.0 * path
            p22 = 98.8841202
            alf = DEG_TO_RAD * 98.2
        rlm = M_PI * (1.0 / 248.0 + 0.5161290322580645)
        self._setup_common(alf, p22 / 1440.0, rlm)


@register
class Misrsom(_SomBase):
    name = "misrsom"
    INNER_INCLUSIVE = False
    DENOM_ERR = ERR_NON_CONVERGENT

    def setup(self) -> None:
        path = self.params.int_("path", 0)
        if path <= 0 or path > 233:
            raise ProjError(ERR_PATH_NOT_IN_RANGE, "misrsom: path out of range")
        self.lam0 = DEG_TO_RAD * 129.3056 - M_TWOPI / 233.0 * path
        self._setup_common(98.30382 * DEG_TO_RAD, 98.88 / 1440.0, 0.0)
