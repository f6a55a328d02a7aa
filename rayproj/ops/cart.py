"""Geodetic ↔ geocentric cartesian conversion (+ the geocent marker op).

Math re-derived from /root/reference/src/conversions/cart.cpp:
fwd :132-147 (N = a/√(1−es·sin²φ); X=(N+h)cosφcosλ …); inv :150-215
(Bowring-style direct solution with polar guard via geocentric radius).
geocent marker per /root/reference/src/conversions/geocent.cpp.
"""

from __future__ import annotations

import numpy as np

from ..core.constants import M_HALFPI
from ..core.op import IO_CARTESIAN, IO_RADIANS, Coords, Operation
from . import register


@register
class Cart(Operation):
    name = "cart"
    need_ellps = True

    def setup(self) -> None:
        self.left = IO_RADIANS
        self.right = IO_CARTESIAN

    def _fwd(self, coo: Coords) -> None:
        a, es = self.ell.a, self.ell.es
        lam, phi, h = coo.x, coo.y, coo.z
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        N = a / np.sqrt(1 - es * sinphi * sinphi) if es != 0 else np.full_like(phi, a)
        coo.x = (N + h) * cosphi * np.cos(lam)
        coo.y = (N + h) * cosphi * np.sin(lam)
        coo.z = (N * (1 - es) + h) * sinphi

    def _inv(self, coo: Coords) -> None:
        a, b, es, e2s = self.ell.a, self.ell.b, self.ell.es, self.ell.e2s
        X, Y, Z = coo.x, coo.y, coo.z
        p = np.hypot(X, Y)
        y_theta = Z * a
        x_theta = p * b
        norm = np.hypot(y_theta, x_theta)
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.where(norm == 0, 1.0, x_theta / norm)
            s = np.where(norm == 0, 0.0, y_theta / norm)
        y_phi = Z + e2s * b * s * s * s
        x_phi = p - es * a * c * c * c
        norm_phi = np.hypot(y_phi, x_phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            cosphi = np.where(norm_phi == 0, 1.0, x_phi / norm_phi)
            sinphi = np.where(norm_phi == 0, 0.0, y_phi / norm_phi)
        degenerate = x_phi <= 0
        with np.errstate(divide="ignore", invalid="ignore"):
            phi = np.where(
                degenerate,
                np.where(Z >= 0, M_HALFPI, -M_HALFPI),
                np.arctan(y_phi / x_phi),
            )
        cosphi = np.where(degenerate, 0.0, cosphi)
        sinphi = np.where(degenerate, np.where(Z >= 0, 1.0, -1.0), sinphi)
        lam = np.arctan2(Y, X)
        near_pole = cosphi < 1e-6
        # geocentric radius fallback poleward of 89.99994°
        r = np.hypot(a * a * cosphi, b * b * sinphi) / np.hypot(a * cosphi, b * sinphi)
        N = a / np.sqrt(1 - es * sinphi * sinphi) if es != 0 else np.full_like(phi, a)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(near_pole, np.abs(Z) - r, p / cosphi - N)
        coo.x, coo.y, coo.z = lam, phi, z


@register
class Geocent(Operation):
    """Identity marker: angular in, cartesian out — the actual
    conversion happens in fwd_finalize/inv_prepare via the embedded
    cart helper (geocent.cpp:36-62 + fwd.cpp:111-118)."""

    name = "geocent"
    need_ellps = False

    def setup(self) -> None:
        self.is_geocent = True
        self.x0 = 0.0
        self.y0 = 0.0
        self.left = IO_RADIANS
        self.right = IO_CARTESIAN

    def _fwd(self, coo: Coords) -> None:
        pass

    def _inv(self, coo: Coords) -> None:
        pass
