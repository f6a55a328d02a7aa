"""Adams square projections: guyou, peirce_q, adams_hemi, adams_ws1/2.

Math re-derived from /root/reference/src/projections/adams.cpp:
elliptic integral via 7-term Chebyshev evaluation (ell_int_5, :40-63),
the shared a/b angle construction per mode (:66-133), and the
adams_ws2 inverse via the generic Jacobian-free Newton
(generic_inverse.cpp:44-114) — vectorized with masked updates.
"""

from __future__ import annotations

import numpy as np

from ..core.constants import M_HALFPI, M_PI
from ..core.errors import ERR_TOLERANCE_CONDITION
from ..core.op import Coords, Operation
from ..mathx import aacos, aasin
from .pseudocyl import _spherify
from . import register

TOL = 1e-9
RSQRT2 = 0.7071067811865475244008443620
M_2_PI = 2.0 / M_PI

_C0 = 2.19174570831038
_C = np.array([
    -8.58691003636495e-07,
    2.02692115653689e-07,
    3.12960480765314e-05,
    5.30394739921063e-05,
    -0.0012804644680613,
    -0.00575574836830288,
    0.0914203033408211,
])


def ell_int_5(phi: np.ndarray) -> np.ndarray:
    """Elliptic integral of the first kind at k = 1/√2 (Chebyshev sum)."""
    y = phi * M_2_PI
    y = 2.0 * y * y - 1.0
    y2 = 2.0 * y
    d1 = np.zeros_like(phi)
    d2 = np.zeros_like(phi)
    for c in _C:
        temp = d1
        d1 = y2 * d1 - d2 + c
        d2 = temp
    return phi * (y * d1 - d2 + 0.5 * _C0)


class _AdamsBase(Operation):
    need_ellps = False
    mode = ""

    def setup(self) -> None:
        _spherify(self)

    def _fwd_arrays(self, lam: np.ndarray, phi: np.ndarray):
        """Returns (x, y, err_mask). Mirrors adams_forward per mode."""
        err = np.zeros(lam.shape, dtype=bool)
        special = np.zeros(lam.shape, dtype=bool)
        spec_x = np.zeros_like(lam)
        spec_y = np.zeros_like(lam)
        if self.mode == "guyou":
            err |= (np.abs(lam) - TOL) > M_HALFPI
            at_pole = np.abs(np.abs(phi) - M_HALFPI) < TOL
            special = at_pole & ~err
            spec_y = np.where(phi < 0, -1.85407, 1.85407)
            sl = np.sin(lam)
            sp = np.sin(phi)
            cp = np.cos(phi)
            a, e1 = aacos((cp * sl - sp) * RSQRT2)
            b, e2 = aacos((cp * sl + sp) * RSQRT2)
            sm = lam < 0.0
            sn = phi < 0.0
        elif self.mode == "peirce_q":
            err |= phi < -TOL
            sl = np.sin(lam)
            cl = np.cos(lam)
            cp = np.cos(phi)
            a, e1 = aacos(cp * (sl + cl) * RSQRT2)
            b, e2 = aacos(cp * (sl - cl) * RSQRT2)
            sm = sl < 0.0
            sn = cl > 0.0
        elif self.mode == "adams_hemi":
            sp = np.sin(phi)
            err |= (np.abs(lam) - TOL) > M_HALFPI
            av = np.cos(phi) * np.sin(lam)
            sm = (sp + av) < 0.0
            sn = (sp - av) < 0.0
            a, e1 = aacos(av)
            b = M_HALFPI - phi
            e2 = np.zeros_like(err)
        elif self.mode == "adams_ws1":
            sp = np.tan(0.5 * phi)
            asn, _ = aasin(sp)
            bv = np.cos(asn) * np.sin(0.5 * lam)
            a, e1 = aacos((bv - sp) * RSQRT2)
            b, e2 = aacos((bv + sp) * RSQRT2)
            sm = lam < 0.0
            sn = phi < 0.0
        else:  # adams_ws2
            spp = np.tan(0.5 * phi)
            asn, _ = aasin(spp)
            av = np.cos(asn) * np.sin(0.5 * lam)
            sm = (spp + av) < 0.0
            sn = (spp - av) < 0.0
            b, e1 = aacos(spp)
            a, e2 = aacos(av)
        m, _ = aasin(np.sqrt(1.0 + np.minimum(0.0, np.cos(a + b))))
        m = np.where(sm, -m, m)
        n, _ = aasin(np.sqrt(np.abs(1.0 - np.maximum(0.0, np.cos(a - b)))))
        n = np.where(sn, -n, n)
        x = ell_int_5(m)
        y = ell_int_5(n)
        if self.mode in ("adams_hemi", "adams_ws2"):
            x, y = RSQRT2 * (x - y), RSQRT2 * (x + y)
        x = np.where(special, spec_x, x)
        y = np.where(special, spec_y, y)
        x = np.where(err, np.inf, x)
        y = np.where(err, np.inf, y)
        return x, y, err

    def _fwd(self, coo: Coords) -> None:
        x, y, err = self._fwd_arrays(coo.x, coo.y)
        coo.set_err(err, ERR_TOLERANCE_CONDITION)
        coo.x, coo.y = x, y


@register
class Guyou(_AdamsBase):
    name = "guyou"
    mode = "guyou"


@register
class PeirceQ(_AdamsBase):
    name = "peirce_q"
    mode = "peirce_q"


@register
class AdamsHemi(_AdamsBase):
    name = "adams_hemi"
    mode = "adams_hemi"


@register
class AdamsWs1(_AdamsBase):
    name = "adams_ws1"
    mode = "adams_ws1"


@register
class AdamsWs2(_AdamsBase):
    name = "adams_ws2"
    mode = "adams_ws2"

    def _inv(self, coo: Coords) -> None:
        """Vectorized generic 2D Newton (generic_inverse.cpp:44-114)."""
        from ._geninv import generic_inverse_2d

        X, Y = coo.x, coo.y
        phi0 = np.clip(Y / 2.62181347, -1.0, 1.0) * M_HALFPI
        with np.errstate(divide="ignore", invalid="ignore"):
            lam0 = np.where(
                np.abs(phi0) >= M_HALFPI,
                0.0,
                np.clip(X / 2.62205760 / np.cos(phi0), -1.0, 1.0) * M_PI,
            )
        lam, phi, converged = generic_inverse_2d(
            lambda la, pa: self._fwd_arrays(la, pa)[:2], X, Y, lam0, phi0)
        # Analytic fallback for lanes the reference-style loop leaves
        # unconverged (near-pole/corner points where the ±0.3-clamped
        # first step lands on a domain clamp and the sqrt-singular edge
        # derivative ping-pongs the iterate). Points with no solution
        # (|x±y| beyond the elliptic-integral range) stay unconverged →
        # non_convergent, matching the reference's expected failure.
        retry = ~converged & np.isfinite(X)
        if np.any(retry):
            rl, rp, rok = self._analytic_inverse(X[retry], Y[retry])
            lam[retry] = np.where(rok, rl, lam[retry])
            phi[retry] = np.where(rok, rp, phi[retry])
            tmp = converged[retry]
            tmp[rok] = True
            converged[retry] = tmp
        coo.set_err(~converged & np.isfinite(X), -53)
        coo.x, coo.y = lam, phi

    @staticmethod
    def _ell_int_5_inverse(target: np.ndarray):
        """Invert ell_int_5 (≈ F(φ, 1/√2), strictly increasing) by Newton
        with the analytic derivative 1/√(1−sin²φ/2). Returns (φ, ok)."""
        ell_max = float(ell_int_5(np.array([M_HALFPI]))[0])
        ok = np.abs(target) <= ell_max * (1 + 1e-13) + 1e-13
        t = np.clip(target / ell_max, -1.0, 1.0) * M_HALFPI
        for _ in range(30):
            s = np.sin(t)
            resid = ell_int_5(t) - target
            if np.all(np.abs(resid[ok]) < 1e-15):
                break
            t = np.clip(t - resid * np.sqrt(1.0 - 0.5 * s * s), -M_HALFPI, M_HALFPI)
        return t, ok

    def _analytic_inverse(self, X, Y):
        """Exact inverse of the ws2 forward: ξ=F(m), η=F(n) recover m,n;
        with u=tan(φ/2), v=√(1−u²)·sin(λ/2) the forward gives
        sin²m = 1+uv−w, sin²n = 1−uv−w, w=√(1−u²)√(1−v²), and
        sign(m)=sign(u+v), sign(n)=sign(u−v) — solvable in closed form."""
        xi = RSQRT2 * (Y + X)
        eta = RSQRT2 * (Y - X)
        m, okm = self._ell_int_5_inverse(xi)
        n, okn = self._ell_int_5_inverse(eta)
        ok = okm & okn
        sin_m = np.sin(m)
        sin_n = np.sin(n)
        P = sin_m * sin_m
        Q = sin_n * sin_n
        uv = (P - Q) / 2.0
        w = 1.0 - (P + Q) / 2.0
        sum_sq = np.maximum(1.0 + uv * uv - w * w, 0.0)  # u² + v²
        s = np.sqrt(np.maximum(sum_sq + 2.0 * uv, 0.0)) * np.sign(m)
        d = np.sqrt(np.maximum(sum_sq - 2.0 * uv, 0.0)) * np.sign(n)
        u = np.clip((s + d) / 2.0, -1.0, 1.0)
        v = (s - d) / 2.0
        phi = 2.0 * np.arctan(u)
        denom = np.sqrt(np.maximum(1.0 - u * u, 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_half_lam = np.where(denom > 1e-12, v / denom, 0.0)
        lam = 2.0 * np.arcsin(np.clip(sin_half_lam, -1.0, 1.0))
        # verify: the closed form must reproduce the input to round-off
        fx, fy, _ = self._fwd_arrays(lam, phi)
        ok &= (np.abs(fx - X) < 1e-9) & (np.abs(fy - Y) < 1e-9)
        return lam, phi, ok
