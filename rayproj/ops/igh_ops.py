"""Interrupted Goode Homolosine (igh.cpp) and its oceanic variant
(igh_o.cpp): 12 sub-zones of spherical sinusoidal (|φ| below
40°44'11.8") and Mollweide (above), each with its own lon_0/x0/y0.
Zone selection is vectorized; each zone's kernel runs on its masked
subset.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import DEG_TO_RAD
from ..core.op import Coords, Operation
from . import register

PHI_BOUNDARY = (40 + 44 / 60.0 + 11.8 / 3600.0) * DEG_TO_RAD
EPSLN = 1e-10

D = {n: n * DEG_TO_RAD for n in
     (10, 20, 30, 40, 50, 60, 80, 90, 100, 110, 130, 140, 150, 160, 180)}


class _Zone:
    """One sub-projection: a spherical moll/sinu kernel + offsets."""

    def __init__(self, kind: str, x0: float, y0: float, lam0: float):
        from ..core.factory import create_operation

        self.kind = kind
        self.x0 = x0
        self.y0 = y0
        self.lam0 = lam0
        self.op = create_operation(f"+proj={kind} +R=1")

    def fwd(self, lam, phi):
        c = Coords(lam - self.lam0, phi.copy())
        self.op._fwd(c)
        return c.x + self.x0, c.y + self.y0

    def inv(self, x, y):
        c = Coords(x - self.x0, y - self.y0)
        self.op._inv(c)
        return c.x + self.lam0, c.y


class _IghBase(Operation):
    need_ellps = False

    def _zone_fwd(self, lam, phi):
        raise NotImplementedError

    def _zone_inv(self, x, y):
        raise NotImplementedError

    def _ok_range(self, z, lam, phi):
        raise NotImplementedError

    def setup(self) -> None:
        from .pseudocyl import _spherify

        _spherify(self)
        self._build_zones()

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        z = self._zone_fwd(lam, phi)
        x = np.full_like(lam, np.nan)
        y = np.full_like(lam, np.nan)
        for zi in range(1, 13):
            mask = z == zi
            if not np.any(mask):
                continue
            zone = self.zones[zi - 1]
            x[mask], y[mask] = zone.fwd(lam[mask], phi[mask])
        coo.x, coo.y = x, y

    def _inv(self, coo: Coords) -> None:
        X, Y = coo.x, coo.y
        z = self._zone_inv(X, Y)
        lam = np.full_like(X, np.inf)
        phi = np.full_like(X, np.inf)
        bad = z == 0
        for zi in range(1, 13):
            mask = z == zi
            if not np.any(mask):
                continue
            zone = self.zones[zi - 1]
            la, pa = zone.inv(X[mask], Y[mask])
            ok = self._ok_range(zi, la, pa)
            lam[mask] = np.where(ok, la, np.inf)
            phi[mask] = np.where(ok, pa, np.inf)
            sub_bad = np.zeros(len(ok), dtype=bool)
            sub_bad[~ok] = True
            idx = np.flatnonzero(mask)
            bad[idx[~ok]] = True
        coo.set_err(bad & np.isfinite(X), -15)
        coo.x, coo.y = lam, phi


@register
class Igh(_IghBase):
    name = "igh"

    def _build_zones(self) -> None:
        d = D
        self.zones = [None] * 12
        for n, kind, x0, y0, l0 in (
            (3, "sinu", -d[100], 0, -d[100]), (4, "sinu", d[30], 0, d[30]),
            (5, "sinu", -d[160], 0, -d[160]), (6, "sinu", -d[60], 0, -d[60]),
            (7, "sinu", d[20], 0, d[20]), (8, "sinu", d[140], 0, d[140]),
            (1, "moll", -d[100], 0, -d[100]),
        ):
            self.zones[n - 1] = _Zone(kind, x0, y0, l0)
        lp = np.array([PHI_BOUNDARY])
        z0 = np.array([0.0])
        _, y1 = self.zones[0].fwd(z0 + self.zones[0].lam0, lp)
        _, y3 = self.zones[2].fwd(z0 + self.zones[2].lam0, lp)
        self.dy0 = float(y3[0] - y1[0])
        self.zones[0].y0 = self.dy0
        for n, x0, y0, l0 in (
            (2, d[30], self.dy0, d[30]), (9, -d[160], -self.dy0, -d[160]),
            (10, -d[60], -self.dy0, -d[60]), (11, d[20], -self.dy0, d[20]),
            (12, d[140], -self.dy0, d[140]),
        ):
            self.zones[n - 1] = _Zone("moll", x0, y0, l0)

    def _zone_fwd(self, lam, phi):
        d = D
        z = np.where(
            phi >= PHI_BOUNDARY, np.where(lam <= -d[40], 1, 2),
            np.where(
                phi >= 0, np.where(lam <= -d[40], 3, 4),
                np.where(
                    phi >= -PHI_BOUNDARY,
                    np.where(lam <= -d[100], 5,
                             np.where(lam <= -d[20], 6,
                                      np.where(lam <= d[80], 7, 8))),
                    np.where(lam <= -d[100], 9,
                             np.where(lam <= -d[20], 10,
                                      np.where(lam <= d[80], 11, 12))))))
        return z

    def _zone_inv(self, x, y):
        d = D
        y90 = self.dy0 + math.sqrt(2.0)
        z = np.where(
            y >= PHI_BOUNDARY, np.where(x <= -d[40], 1, 2),
            np.where(
                y >= 0, np.where(x <= -d[40], 3, 4),
                np.where(
                    y >= -PHI_BOUNDARY,
                    np.where(x <= -d[100], 5,
                             np.where(x <= -d[20], 6,
                                      np.where(x <= d[80], 7, 8))),
                    np.where(x <= -d[100], 9,
                             np.where(x <= -d[20], 10,
                                      np.where(x <= d[80], 11, 12))))))
        z = np.where((y > y90 + EPSLN) | (y < -y90 + EPSLN), 0, z)
        return z

    def _ok_range(self, z, lam, phi):
        d = D
        e = EPSLN
        if z == 1:
            return ((lam >= -d[180] - e) & (lam <= -d[40] + e)) | (
                (lam >= -d[40] - e) & (lam <= -d[10] + e)
                & (phi >= d[60] - e) & (phi <= d[90] + e))
        if z == 2:
            return ((lam >= -d[40] - e) & (lam <= d[180] + e)) | (
                (lam >= -d[180] - e) & (lam <= -d[160] + e)
                & (phi >= d[50] - e) & (phi <= d[90] + e)) | (
                (lam >= -d[50] - e) & (lam <= -d[40] + e)
                & (phi >= d[60] - e) & (phi <= d[90] + e))
        lo_hi = {3: (-d[180], -d[40]), 4: (-d[40], d[180]),
                 5: (-d[180], -d[100]), 6: (-d[100], -d[20]),
                 7: (-d[20], d[80]), 8: (d[80], d[180]),
                 9: (-d[180], -d[100]), 10: (-d[100], -d[20]),
                 11: (-d[20], d[80]), 12: (d[80], d[180])}[z]
        return (lam >= lo_hi[0] - e) & (lam <= lo_hi[1] + e)


@register
class IghO(_IghBase):
    name = "igh_o"

    def _build_zones(self) -> None:
        d = D
        self.zones = [None] * 12
        for n, x0, l0 in ((4, -d[140], -d[140]), (5, -d[10], -d[10]),
                          (6, d[130], d[130]), (7, -d[110], -d[110]),
                          (8, d[20], d[20]), (9, d[150], d[150])):
            self.zones[n - 1] = _Zone("sinu", x0, 0, l0)
        self.zones[0] = _Zone("moll", -d[140], 0, -d[140])
        lp = np.array([PHI_BOUNDARY])
        z0 = np.array([0.0])
        _, y1 = self.zones[0].fwd(z0 + self.zones[0].lam0, lp)
        _, y4 = self.zones[3].fwd(z0 + self.zones[3].lam0, lp)
        self.dy0 = float(y4[0] - y1[0])
        self.zones[0].y0 = self.dy0
        for n, x0, y0, l0 in (
            (2, -d[10], self.dy0, -d[10]), (3, d[130], self.dy0, d[130]),
            (10, -d[110], -self.dy0, -d[110]), (11, d[20], -self.dy0, d[20]),
            (12, d[150], -self.dy0, d[150]),
        ):
            self.zones[n - 1] = _Zone("moll", x0, y0, l0)

    def _zone_fwd(self, lam, phi):
        d = D
        return np.where(
            phi >= PHI_BOUNDARY,
            np.where(lam <= -d[90], 1, np.where(lam >= d[60], 3, 2)),
            np.where(
                phi >= 0,
                np.where(lam <= -d[90], 4, np.where(lam >= d[60], 6, 5)),
                np.where(
                    phi >= -PHI_BOUNDARY,
                    np.where(lam <= -d[60], 7, np.where(lam >= d[90], 9, 8)),
                    np.where(lam <= -d[60], 10, np.where(lam >= d[90], 12, 11)))))

    def _zone_inv(self, x, y):
        d = D
        y90 = self.dy0 + math.sqrt(2.0)
        z = np.where(
            y >= PHI_BOUNDARY,
            np.where(x <= -d[90], 1, np.where(x >= d[60], 3, 2)),
            np.where(
                y >= 0,
                np.where(x <= -d[90], 4, np.where(x >= d[60], 6, 5)),
                np.where(
                    y >= -PHI_BOUNDARY,
                    np.where(x <= -d[60], 7, np.where(x >= d[90], 9, 8)),
                    np.where(x <= -d[60], 10, np.where(x >= d[90], 12, 11)))))
        z = np.where((y > y90 + EPSLN) | (y < -y90 + EPSLN), 0, z)
        return z

    def _ok_range(self, z, lam, phi):
        d = D
        e = EPSLN
        if z == 1:
            return ((lam >= -d[180] - e) & (lam <= -d[90] + e)) | (
                (lam >= d[160] - e) & (lam <= d[180] + e)
                & (phi >= d[50] - e) & (phi <= d[90] + e))
        if z == 3:
            return ((lam >= d[60] - e) & (lam <= d[180] + e)) | (
                (lam >= -d[180] - e) & (lam <= -d[160] + e)
                & (phi >= d[50] - e) & (phi <= d[90] + e))
        if z == 11:
            return ((lam >= -d[60] - e) & (lam <= d[90] + e)) | (
                (lam >= d[90] - e) & (lam <= d[100] + e)
                & (phi >= -d[90] - e) & (phi <= -d[40] + e))
        lo_hi = {2: (-d[90], d[60]), 4: (-d[180], -d[90]), 5: (-d[90], d[60]),
                 6: (d[60], d[180]), 7: (-d[180], -d[60]), 8: (-d[60], d[90]),
                 9: (d[90], d[180]), 10: (-d[180], -d[60]),
                 12: (d[90], d[180])}[z]
        return (lam >= lo_hi[0] - e) & (lam <= lo_hi[1] + e)
