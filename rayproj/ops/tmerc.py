"""Transverse Mercator (tmerc / etmerc / utm).

Two algorithms, re-derived from /root/reference/src/projections/tmerc.cpp:
  * Evenden/Snyder "approx" — 8th-order meridional-distance series
    (fwd :76-116, inv :163-193; sphere variants :118-161, :195-214)
  * Poder/Engsager "exact"  — 6th-order complex Clenshaw summation in
    Gauss-Schreiber space (helpers :267-331, fwd :334-415, inv :419-489,
    coefficient setup :491-570)
AUTO picks exact when |lon − lon0| > 3° (:574-591); default algorithm is
poder_engsager (data/proj.ini:24). utm: zone → lam0, k0=0.9996,
x0=500000, y0=0/1e7 south (:726-763). Vectorized: the fixed-order
Clenshaw recurrences unroll to elementwise NumPy; AUTO becomes a
per-row mask blending the two kernels' outputs.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import DEG_TO_RAD, M_HALFPI, M_PI
from ..core.errors import (
    ERR_ELLIPSOID_USE_REQUIRED,
    ERR_INVALID_ARG,
    ERR_INVALID_UTM_ZONE,
    ERR_INVALID_X_OR_Y,
    ERR_LAT_OR_LON_EXCEED_LIMIT,
    ERR_TOLERANCE_CONDITION,
    ProjError,
)
from ..core.op import Coords, Operation
from ..mathx import enfn, inv_mlfn, mlfn
from . import register

FC1 = 1.0
FC2 = 0.5
FC3 = 0.16666666666666666666
FC4 = 0.08333333333333333333
FC5 = 0.05
FC6 = 0.03333333333333333333
FC7 = 0.02380952380952380952
FC8 = 0.01785714285714285714

EPS10 = 1e-10
ORDER = 6


def _gatg(p: np.ndarray, B, cos_2B, sin_2B):
    """Clenshaw summation of a sine series: B + sum p[i] sin(2(i+1)B)."""
    two_cos = 2 * cos_2B
    h2 = 0.0
    h1 = p[ORDER - 1]
    h = h1
    for i in range(ORDER - 2, -1, -1):
        h = -h2 + two_cos * h1 + p[i]
        h2 = h1
        h1 = h
    return B + h * sin_2B


def _clens(a: np.ndarray, arg_r):
    """Real Clenshaw summation."""
    cos_arg = np.cos(arg_r)
    r = 2 * cos_arg
    hr1 = 0.0
    hr = a[ORDER - 1]
    for i in range(ORDER - 2, -1, -1):
        hr2 = hr1
        hr1 = hr
        hr = -hr2 + r * hr1 + a[i]
    return np.sin(arg_r) * hr


def _clenS(a: np.ndarray, sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i):
    """Complex Clenshaw summation; returns (R, I)."""
    r = 2 * cos_arg_r * cosh_arg_i
    i_ = -2 * sin_arg_r * sinh_arg_i
    hi1 = hr1 = hi = 0.0
    hr = a[ORDER - 1]
    for k in range(ORDER - 2, -1, -1):
        hr2 = hr1
        hi2 = hi1
        hr1 = hr
        hi1 = hi
        hr = -hr2 + r * hr1 - i_ * hi1 + a[k]
        hi = -hi2 + i_ * hr1 + r * hi1
    rr = sin_arg_r * cosh_arg_i
    ii = cos_arg_r * sinh_arg_i
    return rr * hr - ii * hi, rr * hi + ii * hr


class _ExactCoefs:
    """Poder/Engsager coefficient block (tmerc.cpp:491-570)."""

    def __init__(self, n: float, k0: float, phi0: float):
        cgb = np.zeros(6)
        cbg = np.zeros(6)
        np_ = n
        cgb[0] = n * (2 + n * (-2 / 3.0 + n * (-2 + n * (116 / 45.0 + n * (26 / 45.0 + n * (-2854 / 675.0))))))
        cbg[0] = n * (-2 + n * (2 / 3.0 + n * (4 / 3.0 + n * (-82 / 45.0 + n * (32 / 45.0 + n * (4642 / 4725.0))))))
        np_ *= n
        cgb[1] = np_ * (7 / 3.0 + n * (-8 / 5.0 + n * (-227 / 45.0 + n * (2704 / 315.0 + n * (2323 / 945.0)))))
        cbg[1] = np_ * (5 / 3.0 + n * (-16 / 15.0 + n * (-13 / 9.0 + n * (904 / 315.0 + n * (-1522 / 945.0)))))
        np_ *= n
        cgb[2] = np_ * (56 / 15.0 + n * (-136 / 35.0 + n * (-1262 / 105.0 + n * (73814 / 2835.0))))
        cbg[2] = np_ * (-26 / 15.0 + n * (34 / 21.0 + n * (8 / 5.0 + n * (-12686 / 2835.0))))
        np_ *= n
        cgb[3] = np_ * (4279 / 630.0 + n * (-332 / 35.0 + n * (-399572 / 14175.0)))
        cbg[3] = np_ * (1237 / 630.0 + n * (-12 / 5.0 + n * (-24832 / 14175.0)))
        np_ *= n
        cgb[4] = np_ * (4174 / 315.0 + n * (-144838 / 6237.0))
        cbg[4] = np_ * (-734 / 315.0 + n * (109598 / 31185.0))
        np_ *= n
        cgb[5] = np_ * (601676 / 22275.0)
        cbg[5] = np_ * (444337 / 155925.0)
        self.cgb, self.cbg = cgb, cbg

        np2 = n * n
        self.Qn = k0 / (1 + n) * (1 + np2 * (1 / 4.0 + np2 * (1 / 64.0 + np2 / 256.0)))
        utg = np.zeros(6)
        gtu = np.zeros(6)
        utg[0] = n * (-0.5 + n * (2 / 3.0 + n * (-37 / 96.0 + n * (1 / 360.0 + n * (81 / 512.0 + n * (-96199 / 604800.0))))))
        gtu[0] = n * (0.5 + n * (-2 / 3.0 + n * (5 / 16.0 + n * (41 / 180.0 + n * (-127 / 288.0 + n * (7891 / 37800.0))))))
        utg[1] = np2 * (-1 / 48.0 + n * (-1 / 15.0 + n * (437 / 1440.0 + n * (-46 / 105.0 + n * (1118711 / 3870720.0)))))
        gtu[1] = np2 * (13 / 48.0 + n * (-3 / 5.0 + n * (557 / 1440.0 + n * (281 / 630.0 + n * (-1983433 / 1935360.0)))))
        np3 = np2 * n
        utg[2] = np3 * (-17 / 480.0 + n * (37 / 840.0 + n * (209 / 4480.0 + n * (-5569 / 90720.0))))
        gtu[2] = np3 * (61 / 240.0 + n * (-103 / 140.0 + n * (15061 / 26880.0 + n * (167603 / 181440.0))))
        np4 = np3 * n
        utg[3] = np4 * (-4397 / 161280.0 + n * (11 / 504.0 + n * (830251 / 7257600.0)))
        gtu[3] = np4 * (49561 / 161280.0 + n * (-179 / 168.0 + n * (6601661 / 7257600.0)))
        np5 = np4 * n
        utg[4] = np5 * (-4583 / 161280.0 + n * (108847 / 3991680.0))
        gtu[4] = np5 * (34729 / 80640.0 + n * (-3418889 / 1995840.0))
        np6 = np5 * n
        utg[5] = np6 * (-20648693 / 638668800.0)
        gtu[5] = np6 * (212378941 / 319334400.0)
        self.utg, self.gtu = utg, gtu

        Z = _gatg(cbg, phi0, math.cos(2 * phi0), math.sin(2 * phi0))
        self.Zb = -self.Qn * (Z + _clens(gtu, 2 * Z))


@register
class Tmerc(Operation):
    name = "tmerc"
    default_algo = None  # None → resolve from params / poder_engsager default

    def setup(self) -> None:
        algo = self.default_algo
        if self.params.bool_("approx"):
            algo = "evenden_snyder"
        elif self.params.str_("algo"):
            algo = self.params.str_("algo")
            if algo not in ("evenden_snyder", "poder_engsager", "auto"):
                raise ProjError(ERR_INVALID_ARG, f"algo={algo}")
        if algo is None:
            algo = "poder_engsager"  # proj.ini default (data/proj.ini:24)
        if algo == "auto" and (
            self.ell.es > 0.1 or self.phi0 != 0 or abs(self.k0 - 1) > 0.01
        ):
            algo = "poder_engsager"
        if self.ell.es == 0:
            algo = "evenden_snyder"
        self.algo = algo

        if algo in ("evenden_snyder", "auto"):
            self._setup_approx()
        if algo in ("poder_engsager", "auto"):
            self.exact = _ExactCoefs(self.ell.n, self.k0, self.phi0)

    def _setup_approx(self) -> None:
        if self.ell.es != 0.0:
            self.en = enfn(self.ell.es)
            self.ml0 = float(
                mlfn(
                    np.array([self.phi0]),
                    np.array([math.sin(self.phi0)]),
                    np.array([math.cos(self.phi0)]),
                    self.en,
                )[0]
            )
            self.esp = self.ell.es / (1.0 - self.ell.es)
        else:
            self.esp = self.k0
            self.ml0 = 0.5 * self.esp

    # ---- kernels ---------------------------------------------------------
    def _fwd(self, coo: Coords) -> None:
        if self.algo == "poder_engsager":
            x, y, bad = self._exact_fwd(coo.x, coo.y)
            coo.set_err(bad, ERR_TOLERANCE_CONDITION)
        elif self.algo == "evenden_snyder":
            x, y = self._approx_fwd(coo)
        else:  # auto: per-row blend (tmerc.cpp:574-580)
            use_exact = np.abs(coo.x) > 3 * DEG_TO_RAD
            xa, ya = self._approx_fwd(coo)
            xe, ye, bad = self._exact_fwd(coo.x, coo.y)
            coo.set_err(use_exact & bad, ERR_TOLERANCE_CONDITION)
            x = np.where(use_exact, xe, xa)
            y = np.where(use_exact, ye, ya)
        coo.x, coo.y = x, y

    def _inv(self, coo: Coords) -> None:
        if self.algo == "poder_engsager":
            lam, phi, bad = self._exact_inv(coo.x, coo.y)
            coo.set_err(bad, ERR_INVALID_X_OR_Y)
        elif self.algo == "evenden_snyder":
            lam, phi = self._approx_inv(coo)
        else:  # auto (tmerc.cpp:583-591)
            use_exact = np.abs(coo.x) > 0.053 - 0.022 * coo.y * coo.y
            la, pa = self._approx_inv(coo)
            le, pe, bad = self._exact_inv(coo.x, coo.y)
            coo.set_err(use_exact & bad, ERR_INVALID_X_OR_Y)
            lam = np.where(use_exact, le, la)
            phi = np.where(use_exact, pe, pa)
        coo.x, coo.y = lam, phi

    # ---- Evenden/Snyder (tmerc.cpp:76-214) -------------------------------
    def _approx_fwd(self, coo: Coords):
        lam, phi = coo.x, coo.y
        out_of_range = (lam < -M_HALFPI) | (lam > M_HALFPI)
        coo.set_err(out_of_range, ERR_LAT_OR_LON_EXCEED_LIMIT)
        if self.ell.es != 0.0:
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            t = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
            t = t * t
            al = cosphi * lam
            als = al * al
            al = al / np.sqrt(1.0 - self.ell.es * sinphi * sinphi)
            n = self.esp * cosphi * cosphi
            x = self.k0 * al * (
                FC1
                + FC3 * als * (1.0 - t + n
                + FC5 * als * (5.0 + t * (t - 18.0) + n * (14.0 - 58.0 * t)
                + FC7 * als * (61.0 + t * (t * (179.0 - t) - 479.0))))
            )
            y = self.k0 * (
                mlfn(phi, sinphi, cosphi, self.en) - self.ml0
                + sinphi * al * lam * FC2 * (
                    1.0
                    + FC4 * als * (5.0 - t + n * (9.0 + 4.0 * n)
                    + FC6 * als * (61.0 + t * (t - 58.0) + n * (270.0 - 330 * t)
                    + FC8 * als * (1385.0 + t * (t * (543.0 - t) - 3111.0))))
                )
            )
        else:
            cosphi = np.cos(phi)
            b = cosphi * np.sin(lam)
            coo.set_err(np.abs(np.abs(b) - 1.0) <= EPS10, ERR_TOLERANCE_CONDITION)
            x = self.ml0 * np.log((1.0 + b) / (1.0 - b))
            yy = cosphi * np.cos(lam) / np.sqrt(1.0 - b * b)
            ab = np.abs(yy)
            over = (ab - 1.0) > EPS10
            coo.set_err((ab >= 1.0) & over, ERR_TOLERANCE_CONDITION)
            yy = np.where(ab >= 1.0, 0.0, np.arccos(np.clip(yy, -1.0, 1.0)))
            yy = np.where(phi < 0.0, -yy, yy)
            y = self.esp * (yy - self.phi0)
        x = np.where(out_of_range, np.inf, x)
        y = np.where(out_of_range, np.inf, y)
        return x, y

    def _approx_inv(self, coo: Coords):
        x, y = coo.x, coo.y
        if self.ell.es != 0.0:
            phi, nonconv = inv_mlfn(self.ml0 + y / self.k0, self.ell.es, self.en)
            coo.set_err(nonconv, -17)
            at_pole = np.abs(phi) >= M_HALFPI
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            t = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
            n = self.esp * cosphi * cosphi
            con = 1.0 - self.ell.es * sinphi * sinphi
            d = x * np.sqrt(con) / self.k0
            con_t = con * t
            t = t * t
            ds = d * d
            phi_out = phi - (con_t * ds / (1.0 - self.ell.es)) * FC2 * (
                1.0
                - ds * FC4 * (5.0 + t * (3.0 - 9.0 * n) + n * (1.0 - 4 * n)
                - ds * FC6 * (61.0 + t * (90.0 - 252.0 * n + 45.0 * t) + 46.0 * n
                - ds * FC8 * (1385.0 + t * (3633.0 + t * (4095.0 + 1575.0 * t)))))
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                lam_out = d * (
                    FC1
                    - ds * FC3 * (1.0 + 2.0 * t + n
                    - ds * FC5 * (5.0 + t * (28.0 + 24.0 * t + 8.0 * n) + 6.0 * n
                    - ds * FC7 * (61.0 + t * (662.0 + t * (1320.0 + 720.0 * t)))))
                ) / cosphi
            phi_out = np.where(at_pole, np.where(y < 0.0, -M_HALFPI, M_HALFPI), phi_out)
            lam_out = np.where(at_pole, 0.0, lam_out)
            return lam_out, phi_out
        h = np.exp(x / self.esp)
        coo.set_err(h == 0, ERR_INVALID_X_OR_Y)
        g = 0.5 * (h - 1.0 / h)
        h2 = np.cos(self.phi0 + y / self.esp)
        phi = np.arcsin(np.sqrt(np.clip((1.0 - h2 * h2) / (1.0 + g * g), 0.0, 1.0)))
        phi = np.where((y < 0.0) & (-phi + self.phi0 < 0.0), -phi, phi)
        lam = np.where((g != 0.0) | (h2 != 0.0), np.arctan2(g, h2), 0.0)
        return lam, phi

    # ---- Poder/Engsager (tmerc.cpp:334-489) ------------------------------
    def _exact_fwd(self, lam, phi):
        Q = self.exact
        Cn = _gatg(Q.cbg, phi, np.cos(2 * phi), np.sin(2 * phi))
        sin_Cn = np.sin(Cn)
        cos_Cn = np.cos(Cn)
        sin_Ce = np.sin(lam)
        cos_Ce = np.cos(lam)
        cos_Cn_cos_Ce = cos_Cn * cos_Ce
        Cn = np.arctan2(sin_Cn, cos_Cn_cos_Ce)
        inv_denom = 1.0 / np.hypot(sin_Cn, cos_Cn_cos_Ce)
        tan_Ce = sin_Ce * cos_Cn * inv_denom
        Ce = np.arcsinh(tan_Ce)
        two_inv = 2 * inv_denom
        two_inv_sq = two_inv * inv_denom
        tmp_r = cos_Cn_cos_Ce * two_inv_sq
        sin_arg_r = sin_Cn * tmp_r
        cos_arg_r = cos_Cn_cos_Ce * tmp_r - 1
        sinh_arg_i = tan_Ce * two_inv
        cosh_arg_i = two_inv_sq - 1
        dCn, dCe = _clenS(Q.gtu, sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i)
        Cn = Cn + dCn
        Ce = Ce + dCe
        bad = ~(np.abs(Ce) <= 2.623395162778)
        y = np.where(bad, np.inf, Q.Qn * Cn + Q.Zb)
        x = np.where(bad, np.inf, Q.Qn * Ce)
        return x, y, bad

    def _exact_inv(self, x, y):
        Q = self.exact
        Cn = (y - Q.Zb) / Q.Qn
        Ce = x / Q.Qn
        bad = ~(np.abs(Ce) <= 2.623395162778)
        sin_arg_r = np.sin(2 * Cn)
        cos_arg_r = np.cos(2 * Cn)
        exp_2_Ce = np.exp(2 * np.where(bad, 0.0, Ce))
        half_inv = 0.5 / exp_2_Ce
        sinh_arg_i = 0.5 * exp_2_Ce - half_inv
        cosh_arg_i = 0.5 * exp_2_Ce + half_inv
        dCn, dCe = _clenS(Q.utg, sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i)
        Cn = Cn + dCn
        Ce = Ce + dCe
        sin_Cn = np.sin(Cn)
        cos_Cn = np.cos(Cn)
        sinhCe = np.sinh(Ce)
        Ce = np.arctan2(sinhCe, cos_Cn)
        modulus_Ce = np.hypot(sinhCe, cos_Cn)
        Cn = np.arctan2(sin_Cn, modulus_Ce)
        tmp = 2 * modulus_Ce / (sinhCe * sinhCe + 1)
        sin_2_Cn = sin_Cn * tmp
        cos_2_Cn = tmp * modulus_Ce - 1.0
        phi = _gatg(Q.cgb, Cn, cos_2_Cn, sin_2_Cn)
        lam = Ce
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), bad


@register
class Etmerc(Tmerc):
    name = "etmerc"
    default_algo = "poder_engsager"

    def setup(self) -> None:
        if self.ell.es == 0.0:
            raise ProjError(ERR_ELLIPSOID_USE_REQUIRED, "etmerc")
        super().setup()


@register
class Utm(Tmerc):
    name = "utm"

    def setup(self) -> None:
        if self.ell.es == 0.0:
            raise ProjError(ERR_ELLIPSOID_USE_REQUIRED, "utm")
        if self.lam0 < -1000.0 or self.lam0 > 1000.0:
            raise ProjError(ERR_INVALID_UTM_ZONE)
        self.y0 = 10000000.0 if self.params.bool_("south") else 0.0
        self.x0 = 500000.0
        if self.params.has("zone"):
            zone = self.params.int_("zone")
            if 0 < zone <= 60:
                zone -= 1
            else:
                raise ProjError(ERR_INVALID_UTM_ZONE)
        else:
            lam0w = self.lam0
            lam0w = math.atan2(math.sin(lam0w), math.cos(lam0w))  # adjlon
            zone = int(round(math.floor((lam0w + M_PI) * 30.0 / M_PI)))
            zone = min(max(zone, 0), 59)
        self.lam0 = (zone + 0.5) * M_PI / 30.0 - M_PI
        self.k0 = 0.9996
        self.phi0 = 0.0
        super().setup()
