"""Molodensky approximate datum shift (standard + abridged).

Math per /root/reference/src/transformations/molodensky.cpp:50-165:
delta-phi/lam/h from dx,dy,dz,da,df via the curvature radii; inverse =
forward with the deltas subtracted (:178-192). Vectorized elementwise.
"""

from __future__ import annotations

import numpy as np

from ..core.constants import M_HALFPI
from ..core.errors import ERR_MISSING_ARGS, ERR_NO_ARGS, ERR_TOLERANCE_CONDITION, ProjError
from ..core.op import IO_RADIANS, Coords, Operation
from . import register


def _rn(a: float, es: float, phi: np.ndarray) -> np.ndarray:
    if es == 0:
        return np.full_like(phi, a)
    s = np.sin(phi)
    return a / np.sqrt(1 - es * s * s)


def _rm(a: float, es: float, phi: np.ndarray) -> np.ndarray:
    if es == 0:
        return np.full_like(phi, a)
    s = np.sin(phi)
    out = (a * (1 - es)) / np.power(1 - es * s * s, 1.5)
    out = np.where(phi == 0, a * (1 - es), out)
    out = np.where(np.abs(phi) == M_HALFPI, a / np.sqrt(1 - es), out)
    return out


@register
class Molodensky(Operation):
    name = "molodensky"
    need_ellps = True

    def setup(self) -> None:
        p = self.params
        self.left = IO_RADIANS
        self.right = IO_RADIANS
        count = 0
        vals = {}
        for key in ("dx", "dy", "dz", "da", "df"):
            if p.has(key):
                count += 1
                vals[key] = p.float_(key)
            else:
                vals[key] = 0.0
        if count == 0:
            raise ProjError(ERR_NO_ARGS, "molodensky")
        if count != 5:
            raise ProjError(ERR_MISSING_ARGS, "molodensky needs dx dy dz da df")
        self.dx, self.dy, self.dz = vals["dx"], vals["dy"], vals["dz"]
        self.da, self.df = vals["da"], vals["df"]
        self.abridged = p.bool_("abridged", False)

    def _deltas(self, lam, phi, z, err_cb):
        a, es, f = self.ell.a, self.ell.es, self.ell.f
        slam = np.sin(lam)
        clam = np.cos(lam)
        sphi = np.sin(phi)
        cphi = np.cos(phi)
        dx, dy, dz, da, df = self.dx, self.dy, self.dz, self.da, self.df
        if self.abridged:
            adffda = a * df + f * da
            rho = _rm(a, es, phi)
            dphi = (-dx * sphi * clam - dy * sphi * slam + dz * cphi
                    + adffda * np.sin(2 * phi)) / rho
            dlam_denom = _rn(a, es, phi) * cphi
            err_cb(dlam_denom == 0.0)
            with np.errstate(divide="ignore", invalid="ignore"):
                dlam = (-dx * slam + dy * clam) / dlam_denom
            dh = (dx * cphi * clam + dy * cphi * slam + dz * sphi - da
                  + adffda * sphi * sphi)
        else:
            rho = _rm(a, es, phi)
            nu = _rn(a, es, phi)
            dphi = (
                (-dx * sphi * clam) - (dy * sphi * slam) + (dz * cphi)
                + ((nu * es * sphi * cphi * da) / a)
                + (sphi * cphi * (rho / (1 - f) + nu * (1 - f)) * df)
            )
            dphi_denom = rho + z
            err_cb(dphi_denom == 0.0)
            with np.errstate(divide="ignore", invalid="ignore"):
                dphi = dphi / dphi_denom
            dlam_denom = (nu + z) * cphi
            err_cb(dlam_denom == 0.0)
            with np.errstate(divide="ignore", invalid="ignore"):
                dlam = (-dx * slam + dy * clam) / dlam_denom
            dh = (dx * cphi * clam + dy * cphi * slam + dz * sphi
                  - (a / nu) * da + nu * (1 - f) * sphi * sphi * df)
        return dlam, dphi, dh

    def _fwd(self, coo: Coords) -> None:
        dlam, dphi, dh = self._deltas(
            coo.x, coo.y, coo.z, lambda m: coo.set_err(m, ERR_TOLERANCE_CONDITION)
        )
        coo.x = coo.x + dlam
        coo.y = coo.y + dphi
        coo.z = coo.z + dh

    def _inv(self, coo: Coords) -> None:
        dlam, dphi, dh = self._deltas(
            coo.x, coo.y, coo.z, lambda m: coo.set_err(m, ERR_TOLERANCE_CONDITION)
        )
        coo.x = coo.x - dlam
        coo.y = coo.y - dphi
        coo.z = coo.z - dh
