"""Modified (oblated) stereographic family: mil_os, lee_os, gs48, alsk,
gs50 (mod_ster.cpp) — conformal stereographic base warped by a complex
polynomial (zpoly1.cpp), inverse via complex Newton.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import DEG_TO_RAD, M_HALFPI
from ..core.ellps import Ellipsoid
from ..core.errors import ERR_TOLERANCE_CONDITION
from ..core.op import Coords, Operation
from . import register

EPSLN = 1e-10


def zpoly1(z: np.ndarray, C: list[complex]) -> np.ndarray:
    """pj_zpoly1: z·(C₁ + C₂z + … + Cₙzⁿ⁻¹) — coefficients C_1..C_n."""
    a = np.full(z.shape, C[-1], dtype=np.complex128)
    for c in C[-2::-1]:
        a = c + z * a
    return z * a


def zpolyd1(z: np.ndarray, C: list[complex]):
    """pj_zpolyd1: (value, derivative)."""
    a = np.full(z.shape, C[-1], dtype=np.complex128)
    b = a.copy()
    first = True
    for c in C[-2::-1]:
        if first:
            first = False
        else:
            b = a + z * b
        a = c + z * a
    b = a + z * b
    return z * a, b


class _ModSterBase(Operation):
    need_ellps = True
    ZCOEFF_E: list[complex] | None = None  # fixed-ellipsoid coefficients
    ZCOEFF_S: list[complex] = []
    FIXED_A_SPHERE: float | None = None
    FIXED_A_ELL: float | None = None
    FIXED_ES: float | None = None
    LAM0_DEG = 0.0
    PHI0_DEG = 0.0

    def setup(self) -> None:
        self.lam0 = DEG_TO_RAD * self.LAM0_DEG
        self.phi0 = DEG_TO_RAD * self.PHI0_DEG
        if self.ZCOEFF_E is not None and self.ell.es != 0.0:
            self.zcoeff = self.ZCOEFF_E
            self.ell = Ellipsoid(a=self.FIXED_A_ELL, es=self.FIXED_ES).derive()
        else:
            self.zcoeff = self.ZCOEFF_S
            if self.ZCOEFF_E is not None or self.FIXED_A_SPHERE is not None:
                a = self.FIXED_A_SPHERE
                if a is not None:
                    self.ell = Ellipsoid(a=a, es=0.0).derive()
                else:
                    self.ell = Ellipsoid(a=self.ell.a, es=0.0).derive()
            else:
                self.ell = Ellipsoid(a=self.ell.a, es=0.0).derive()
        esphi = self.ell.e * math.sin(self.phi0)
        if self.ell.es != 0.0:
            chio = 2.0 * math.atan(math.tan((M_HALFPI + self.phi0) * 0.5)
                                   * ((1.0 - esphi) / (1.0 + esphi)) ** (self.ell.e * 0.5)) - M_HALFPI
        else:
            chio = self.phi0
        self.schio = math.sin(chio)
        self.cchio = math.cos(chio)

    def _fwd(self, coo: Coords) -> None:
        e = self.ell.e
        lam, phi = coo.x, coo.y
        sinlon, coslon = np.sin(lam), np.cos(lam)
        esphi = e * np.sin(phi)
        chi = 2.0 * np.arctan(np.tan((M_HALFPI + phi) * 0.5)
                              * ((1.0 - esphi) / (1.0 + esphi)) ** (e * 0.5)) - M_HALFPI
        schi, cchi = np.sin(chi), np.cos(chi)
        denom = 1.0 + self.schio * schi + self.cchio * cchi * coslon
        err = denom == 0
        coo.set_err(err, ERR_TOLERANCE_CONDITION)
        with np.errstate(divide="ignore", invalid="ignore"):
            s = 2.0 / np.where(err, 1.0, denom)
        p = (s * cchi * sinlon) + 1j * (s * (self.cchio * schi - self.schio * cchi * coslon))
        p = zpoly1(p, self.zcoeff)
        coo.x = np.where(err, np.inf, p.real)
        coo.y = np.where(err, np.inf, p.imag)

    def _inv(self, coo: Coords) -> None:
        e = self.ell.e
        X, Y = coo.x, coo.y
        target = X + 1j * Y
        p = target.astype(np.complex128)
        active = np.isfinite(X) & np.isfinite(Y)
        conv = np.zeros_like(active)
        for _ in range(20):
            if not np.any(active):
                break
            fxy, fpxy = zpolyd1(p[active], self.zcoeff)
            fxy = fxy - target[active]
            den = fpxy.real ** 2 + fpxy.imag ** 2
            dpr = -(fxy.real * fpxy.real + fxy.imag * fpxy.imag) / den
            dpi = -(fxy.imag * fpxy.real - fxy.real * fpxy.imag) / den
            pn = p[active] + (dpr + 1j * dpi)
            p[active] = pn
            done = (np.abs(dpr) + np.abs(dpi)) <= EPSLN
            idx = np.flatnonzero(active)
            conv[idx[done]] = True
            active[idx[done]] = False
        rh = np.abs(p)
        z = 2.0 * np.arctan(0.5 * rh)
        sinz, cosz = np.sin(z), np.cos(z)
        origin = np.abs(rh) <= EPSLN
        with np.errstate(divide="ignore", invalid="ignore"):
            chi = np.arcsin(np.clip(
                cosz * self.schio + p.imag * sinz * self.cchio / np.where(rh == 0, 1.0, rh),
                -1.0, 1.0))
        phi = chi.copy()
        ph_active = conv & ~origin & np.isfinite(chi)
        ph_conv = ~ph_active
        for _ in range(20):
            if not np.any(ph_active):
                break
            esphi = e * np.sin(phi[ph_active])
            dphi = (2.0 * np.arctan(np.tan((M_HALFPI + chi[ph_active]) * 0.5)
                                    * ((1.0 + esphi) / (1.0 - esphi)) ** (e * 0.5))
                    - M_HALFPI - phi[ph_active])
            phi[ph_active] = phi[ph_active] + dphi
            done = np.abs(dphi) <= EPSLN
            idx = np.flatnonzero(ph_active)
            ph_conv[idx[done]] = True
            ph_active[idx[done]] = False
        ok = conv & ph_conv
        lam = np.arctan2(p.real * sinz,
                         rh * self.cchio * cosz - p.imag * self.schio * sinz)
        lam = np.where(origin, 0.0, lam)
        phi = np.where(origin, self.phi0, phi)
        coo.set_err(~ok & np.isfinite(X), ERR_TOLERANCE_CONDITION)
        coo.x = np.where(ok, lam, np.inf)
        coo.y = np.where(ok, phi, np.inf)


@register
class MilOs(_ModSterBase):
    """Miller Oblated Stereographic (mod_ster.cpp:120-140)."""

    name = "mil_os"
    ZCOEFF_S = [0.924500 + 0j, 0j, 0.019430 + 0j]
    LAM0_DEG = 20.0
    PHI0_DEG = 18.0


@register
class LeeOs(_ModSterBase):
    """Lee Oblated Stereographic (mod_ster.cpp:142-162)."""

    name = "lee_os"
    ZCOEFF_S = [0.721316 + 0j, 0j, -0.0088162 - 0.00617325j]
    LAM0_DEG = -165.0
    PHI0_DEG = -10.0


@register
class Gs48(_ModSterBase):
    """48-state US oblated stereographic (mod_ster.cpp:164-188)."""

    name = "gs48"
    ZCOEFF_S = [0.98879 + 0j, 0j, -0.050909 + 0j, 0j, 0.075528 + 0j]
    FIXED_A_SPHERE = 6370997.0
    LAM0_DEG = -96.0
    PHI0_DEG = 39.0


@register
class Alsk(_ModSterBase):
    """Alaska oblated stereographic (mod_ster.cpp:190-224)."""

    name = "alsk"
    ZCOEFF_E = [0.9945303 + 0j, 0.0052083 - 0.0027404j, 0.0072721 + 0.0048181j,
                -0.0151089 - 0.1932526j, 0.0642675 - 0.1381226j,
                0.3582802 - 0.2884586j]
    ZCOEFF_S = [0.9972523 + 0j, 0.0052513 - 0.0041175j, 0.0074606 + 0.0048125j,
                -0.0153783 - 0.1968253j, 0.0636871 - 0.1408027j,
                0.3660976 - 0.2937382j]
    FIXED_A_ELL = 6378206.4
    FIXED_ES = 0.00676866
    FIXED_A_SPHERE = 6370997.0
    LAM0_DEG = -152.0
    PHI0_DEG = 64.0


@register
class Gs50(_ModSterBase):
    """50-state US oblated stereographic (mod_ster.cpp:226-268)."""

    name = "gs50"
    ZCOEFF_E = [0.9827497 + 0j, 0.0210669 + 0.0053804j, -0.1031415 - 0.0571664j,
                -0.0323337 - 0.0322847j, 0.0502303 + 0.1211983j,
                0.0251805 + 0.0895678j, -0.0012315 - 0.1416121j,
                0.0072202 - 0.1317091j, -0.0194029 + 0.0759677j,
                -0.0210072 + 0.0834037j]
    ZCOEFF_S = [0.9842990 + 0j, 0.0211642 + 0.0037608j, -0.1036018 - 0.0575102j,
                -0.0329095 - 0.0320119j, 0.0499471 + 0.1223335j,
                0.0260460 + 0.0899805j, 0.0007388 - 0.1435792j,
                0.0075848 - 0.1334108j, -0.0216473 + 0.0776645j,
                -0.0225161 + 0.0853673j]
    FIXED_A_ELL = 6378206.4
    FIXED_ES = 0.00676866
    FIXED_A_SPHERE = 6370997.0
    LAM0_DEG = -120.0
    PHI0_DEG = 45.0
