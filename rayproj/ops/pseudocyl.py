"""Pseudocylindrical projections: moll/wag4/wag5, sinu/gn_sinu/eck6/mbtfps.

Math re-derived from /root/reference/src/projections/{moll,gn_sinu}.cpp.
Sphere-only families force es=0 (the reference stomps P->es in setup);
per-point Newton loops become masked fixed iterations.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import M_HALFPI, M_PI, M_TWOPI
from ..core.ellps import Ellipsoid
from ..core.errors import ERR_INVALID_M_OR_N, ERR_TOLERANCE_CONDITION, ProjError
from ..core.op import Coords, Operation
from ..mathx import aasin, enfn, inv_mlfn, mlfn
from . import register

EPS10 = 1e-10


def _spherify(op: Operation) -> None:
    """Reference setup does P->es = 0 keeping a (e.g. moll.cpp setup)."""
    if op.ell.es != 0.0:
        op.ell = Ellipsoid(a=op.ell.a, es=0.0).derive()


@register
class Moll(Operation):
    """Mollweide family (moll.cpp); C_x/C_y/C_p from the setup angle."""

    name = "moll"
    MAX_ITER = 10
    LOOP_TOL = 1e-7

    def _coefs(self) -> tuple[float, float, float]:
        p = M_HALFPI
        p2 = p + p
        sp = math.sin(p)
        r = math.sqrt(M_TWOPI * sp / (p2 + math.sin(p2)))
        return 2.0 * r / M_PI, r / sp, p2 + math.sin(p2)

    def setup(self) -> None:
        _spherify(self)
        self.C_x, self.C_y, self.C_p = self._coefs()

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y.copy()
        k = self.C_p * np.sin(phi)
        active = np.isfinite(phi)
        n_left = np.full(phi.shape, self.MAX_ITER, dtype=np.int32)
        for _ in range(self.MAX_ITER):
            if not np.any(active):
                break
            p = phi[active]
            V = (p + np.sin(p) - k[active]) / (1.0 + np.cos(p))
            phi[active] = p - V
            n_left[active] -= 1
            done = np.abs(V) < self.LOOP_TOL
            idx = np.flatnonzero(active)
            active[idx[done]] = False
        exhausted = (n_left <= 0) & np.isfinite(phi)
        # moll.cpp:36-40: exhausted lanes clamp to ±π/2, others halve
        phi = np.where(exhausted, np.where(phi < 0.0, -M_HALFPI, M_HALFPI), phi * 0.5)
        coo.x = self.C_x * lam * np.cos(phi)
        coo.y = self.C_y * np.sin(phi)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        phi, err = aasin(y / self.C_y)
        coo.set_err(err, -19)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = x / (self.C_x * np.cos(phi))
        inside = np.abs(lam) < M_PI
        phi2 = phi + phi
        phi_out, err2 = aasin((phi2 + np.sin(phi2)) / self.C_p)
        coo.set_err(inside & err2, -19)
        coo.x = np.where(inside, lam, np.inf)
        coo.y = np.where(inside, phi_out, np.inf)


@register
class Wag4(Moll):
    name = "wag4"

    def _coefs(self):
        p = M_PI / 3.0
        p2 = p + p
        sp = math.sin(p)
        r = math.sqrt(M_TWOPI * sp / (p2 + math.sin(p2)))
        return 2.0 * r / M_PI, r / sp, p2 + math.sin(p2)


@register
class Wag5(Moll):
    name = "wag5"

    def _coefs(self):
        return 0.90977, 1.65014, 3.00896


class _GnSinuBase(Operation):
    """General sinusoidal series (gn_sinu.cpp)."""

    MAX_ITER = 8
    LOOP_TOL = 1e-7
    m = 0.0
    n = 1.0

    def _sphere_setup(self) -> None:
        _spherify(self)
        self.C_y = math.sqrt((self.m + 1.0) / self.n)
        self.C_x = self.C_y / (self.m + 1.0)

    def setup(self) -> None:
        self._sphere_setup()

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y.copy()
        if self.m == 0.0:
            if self.n != 1.0:
                phi, err = aasin(self.n * np.sin(phi))
                coo.set_err(err, -19)
        else:
            k = self.n * np.sin(phi)
            active = np.isfinite(phi)
            n_left = np.full(phi.shape, self.MAX_ITER, dtype=np.int32)
            for _ in range(self.MAX_ITER):
                if not np.any(active):
                    break
                p = phi[active]
                V = (self.m * p + np.sin(p) - k[active]) / (self.m + np.cos(p))
                phi[active] = p - V
                n_left[active] -= 1
                done = np.abs(V) < self.LOOP_TOL
                idx = np.flatnonzero(active)
                active[idx[done]] = False
            coo.set_err((n_left <= 0) & np.isfinite(phi), ERR_TOLERANCE_CONDITION)
        coo.x = self.C_x * lam * (self.m + np.cos(phi))
        coo.y = self.C_y * phi

    def _inv(self, coo: Coords) -> None:
        x = coo.x
        y = coo.y / self.C_y
        if self.m != 0.0:
            phi, err = aasin((self.m * y + np.sin(y)) / self.n)
            coo.set_err(err, -19)
        elif self.n != 1.0:
            phi, err = aasin(np.sin(y) / self.n)
            coo.set_err(err, -19)
        else:
            phi = y
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = x / (self.C_x * (self.m + np.cos(y)))
        coo.x, coo.y = lam, phi


@register
class Sinu(_GnSinuBase):
    name = "sinu"

    def setup(self) -> None:
        if self.ell.es != 0.0:
            self.en = enfn(self.ell.es)
            self.ellipsoidal = True
        else:
            self.ellipsoidal = False
            self.n = 1.0
            self.m = 0.0
            self._sphere_setup()

    def _fwd(self, coo: Coords) -> None:
        if not self.ellipsoidal:
            return super()._fwd(coo)
        lam, phi = coo.x, coo.y
        s = np.sin(phi)
        c = np.cos(phi)
        coo.y = mlfn(phi, s, c, self.en)
        coo.x = lam * c / np.sqrt(1.0 - self.ell.es * s * s)

    def _inv(self, coo: Coords) -> None:
        if not self.ellipsoidal:
            return super()._inv(coo)
        x, y = coo.x, coo.y
        phi, nonconv = inv_mlfn(y, self.ell.es, self.en)
        coo.set_err(nonconv, -17)
        s = np.abs(phi)
        interior = s < M_HALFPI
        edge = (s - EPS10) < M_HALFPI
        coo.set_err(~interior & ~edge, ERR_TOLERANCE_CONDITION)
        sp = np.sin(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = x * np.sqrt(1.0 - self.ell.es * sp * sp) / np.cos(phi)
        coo.x = np.where(interior, lam, np.where(edge, 0.0, np.inf))
        coo.y = phi


@register
class Eck6(_GnSinuBase):
    name = "eck6"
    m = 1.0
    n = 2.570796326794896619231321691


@register
class Mbtfps(_GnSinuBase):
    name = "mbtfps"
    m = 0.5
    n = 1.785398163397448309615660845


@register
class GnSinu(_GnSinuBase):
    name = "gn_sinu"

    def setup(self) -> None:
        if self.params.has("n") and self.params.has("m"):
            self.n = self.params.float_("n")
            self.m = self.params.float_("m")
            if self.n <= 0 or self.m < 0:
                raise ProjError(ERR_INVALID_M_OR_N)
        else:
            raise ProjError(ERR_INVALID_M_OR_N)
        self._sphere_setup()


class _SphereOnly(Operation):
    """Base for sphere-only pseudocylindricals (reference sets es=0)."""

    need_ellps = True

    def setup(self) -> None:
        _spherify(self)


@register
class Eck1(_SphereOnly):
    """Eckert I (eck1.cpp)."""

    name = "eck1"
    FC = 0.92131773192356127802
    RP = 0.31830988618379067154

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        coo.x = self.FC * lam * (1.0 - self.RP * np.abs(phi))
        coo.y = self.FC * phi

    def _inv(self, coo: Coords) -> None:
        phi = coo.y / self.FC
        coo.x = coo.x / (self.FC * (1.0 - self.RP * np.abs(phi)))
        coo.y = phi


@register
class Eck2(_SphereOnly):
    """Eckert II (eck2.cpp)."""

    name = "eck2"
    FXC = 0.46065886596178063902
    FYC = 1.44720250911653531871

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        t = np.sqrt(4.0 - 3.0 * np.sin(np.abs(phi)))
        coo.x = self.FXC * lam * t
        y = self.FYC * (2.0 - t)
        coo.y = np.where(phi < 0.0, -y, y)

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        t = 2.0 - np.abs(y) / self.FYC
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = x / (self.FXC * t)
        phi = (4.0 - t * t) / 3.0
        over = np.abs(phi) >= 1.0
        coo.set_err(np.abs(phi) > 1.0000001, ERR_TOLERANCE_CONDITION)
        phi = np.where(
            over, np.where(phi < 0.0, -M_HALFPI, M_HALFPI),
            np.arcsin(np.clip(phi, -1.0, 1.0)),
        )
        coo.x = lam
        coo.y = np.where(y < 0, -phi, phi)


class _Eck3Base(_SphereOnly):
    """Eckert III family (eck3.cpp): x = C_x·λ·(A + √(1−B·φ²))."""

    C_x = C_y = A = B = 0.0

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        coo.y = self.C_y * phi
        coo.x = self.C_x * lam * (self.A + np.sqrt(np.maximum(1.0 - self.B * phi * phi, 0.0)))

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        phi = y / self.C_y
        denom = self.C_x * (self.A + np.sqrt(np.maximum(1.0 - self.B * phi * phi, 0.0)))
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(denom == 0.0, np.inf, x / denom)
        coo.x, coo.y = lam, phi


@register
class Eck3(_Eck3Base):
    name = "eck3"
    C_x = 0.42223820031577120149
    C_y = 0.84447640063154240298
    A = 1.0
    B = 0.4052847345693510857755


@register
class Kav7(_Eck3Base):
    name = "kav7"
    C_x = 0.8660254037844
    C_y = 1.0
    A = 0.0
    B = 0.30396355092701331433


@register
class Wag6(_Eck3Base):
    name = "wag6"
    C_x = 0.94745
    C_y = 0.94745
    A = 0.0
    B = 0.30396355092701331433


@register
class Putp1(_Eck3Base):
    name = "putp1"
    C_x = 1.89490
    C_y = 0.94745
    A = -0.5
    B = 0.30396355092701331433


@register
class Eck4(_SphereOnly):
    """Eckert IV (eck4.cpp): per-point Newton, masked."""

    name = "eck4"
    C_x = 0.42223820031577120149
    C_y = 1.32650042817700232218
    RC_y = 0.75386330736002178205
    C_p = 3.57079632679489661922
    RC_p = 0.28004957675577868795
    NITER = 6

    def _fwd(self, coo: Coords) -> None:
        lam, phi0 = coo.x, coo.y
        p = self.C_p * np.sin(phi0)
        V = phi0 * phi0
        phi = phi0 * (0.895168 + V * (0.0218849 + V * 0.00826809))
        active = np.isfinite(phi)
        n_left = np.full(phi.shape, self.NITER, dtype=np.int32)
        for _ in range(self.NITER):
            if not np.any(active):
                break
            pp = phi[active]
            c = np.cos(pp)
            s = np.sin(pp)
            V = (pp + s * (c + 2.0) - p[active]) / (1.0 + c * (c + 2.0) - s * s)
            phi[active] = pp - V
            n_left[active] -= 1
            done = np.abs(V) < 1e-7
            idx = np.flatnonzero(active)
            active[idx[done]] = False
        exhausted = (n_left <= 0) & np.isfinite(phi)
        coo.x = np.where(exhausted, self.C_x * lam, self.C_x * lam * (1.0 + np.cos(phi)))
        coo.y = np.where(
            exhausted, np.where(phi < 0.0, -self.C_y, self.C_y), self.C_y * np.sin(phi)
        )

    def _inv(self, coo: Coords) -> None:
        x, y = coo.x, coo.y
        phi, err = aasin(y * self.RC_y)
        coo.set_err(err, -19)
        c = np.cos(phi)
        coo.x = x / (self.C_x * (1.0 + c))
        phi2, err2 = aasin((phi + np.sin(phi) * (c + 2.0)) * self.RC_p)
        coo.set_err(err2, -19)
        coo.y = phi2


@register
class Eck5(_SphereOnly):
    """Eckert V (eck5.cpp)."""

    name = "eck5"
    XF = 0.44101277172455148219
    RXF = 2.26750802723822639137
    YF = 0.88202554344910296438
    RYF = 1.13375401361911319568

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        coo.x = self.XF * (1.0 + np.cos(phi)) * lam
        coo.y = self.YF * phi

    def _inv(self, coo: Coords) -> None:
        phi = self.RYF * coo.y
        coo.x = self.RXF * coo.x / (1.0 + np.cos(phi))
        coo.y = phi
