"""HEALPix / rHEALPix projections (healpix.cpp), vectorized.

Semantics re-derived from /root/reference/src/projections/healpix.cpp:
healpix_sphere forward/inverse (:249-305), polar-cap reassembly
combine_caps/get_cap (:354-500), image-boundary test pnpoly/in_image
(:121-222), authalic-latitude conversion and the authalic-radius
substitution a ← a·√(qp/2) (:615-672).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import M_FORTPI, M_HALFPI, M_PI
from ..core.errors import ERR_AXIS, ERR_INVALID_X_OR_Y, ProjError
from ..core.op import Coords, Operation
from ..mathx import authlat, authset, qsfn
from . import register

EPS = 1e-15

# IDENT, R1(+90), R2(+180), R3(+270), then the inverses (healpix.cpp:42-51)
ROT = np.array([
    [[1, 0], [0, 1]],
    [[0, -1], [1, 0]],
    [[-1, 0], [0, -1]],
    [[0, 1], [-1, 0]],
    [[0, 1], [-1, 0]],
    [[-1, 0], [0, -1]],
    [[0, -1], [1, 0]],
], dtype=np.float64)


def _rot_index(idx):
    """get_rotate_index for an integer array in [-3, 3]."""
    return np.where(idx >= 0, idx, 3 - idx)


def healpix_sphere(lam, phi):
    phi0 = math.asin(2.0 / 3.0)
    equat = np.abs(phi) <= phi0
    x_eq = lam
    y_eq = 3 * M_PI / 8 * np.sin(phi)
    sigma = np.sqrt(np.maximum(3 * (1 - np.abs(np.sin(phi))), 0.0))
    cn = np.floor(2 * lam / M_PI + 2)
    cn = np.where(cn >= 4, 3.0, cn)
    lamc = -3 * M_FORTPI + M_HALFPI * cn
    x_po = lamc + (lam - lamc) * sigma
    y_po = np.sign(phi) * M_FORTPI * (2 - sigma)
    return np.where(equat, x_eq, x_po), np.where(equat, y_eq, y_po)


def healpix_sphere_inverse(x, y):
    y0 = M_FORTPI
    equat = np.abs(y) <= y0
    polar = (~equat) & (np.abs(y) < M_HALFPI)
    lam_eq = x
    phi_eq = np.arcsin(np.clip(8 * y / (3 * M_PI), -1, 1))
    cn = np.floor(2 * x / M_PI + 2)
    cn = np.where(cn >= 4, 3.0, cn)
    xc = -3 * M_FORTPI + M_HALFPI * cn
    tau = 2.0 - 4 * np.abs(y) / M_PI
    with np.errstate(divide="ignore", invalid="ignore"):
        lam_po = xc + (x - xc) / np.where(tau != 0, tau, 1.0)
    phi_po = np.sign(y) * np.arcsin(np.clip(1.0 - tau * tau / 3.0, -1, 1))
    lam = np.where(equat, lam_eq, np.where(polar, lam_po, -M_PI))
    phi = np.where(equat, phi_eq, np.where(polar, phi_po, np.sign(y) * M_HALFPI))
    return lam, phi


def _pnpoly(verts, x, y):
    """Vectorized pnpoly (healpix.cpp:121-157)."""
    inside = np.zeros(x.shape, dtype=bool)
    on_vertex = np.zeros(x.shape, dtype=bool)
    for vx, vy in verts:
        on_vertex |= (x == vx) & (y == vy)
    counter = np.zeros(x.shape, dtype=np.int64)
    p1 = verts[0]
    for i in range(1, len(verts)):
        p2 = verts[i % len(verts)]
        if p1[1] != p2[1]:
            cond = ((y > min(p1[1], p2[1])) & (y <= max(p1[1], p2[1]))
                    & (x <= max(p1[0], p2[0])))
            xinters = (y - p1[1]) * (p2[0] - p1[0]) / (p2[1] - p1[1]) + p1[0]
            hit = cond & ((p1[0] == p2[0]) | (x <= xinters))
            counter += hit.astype(np.int64)
        p1 = p2
    inside = (counter % 2) == 1
    return inside | on_vertex


def in_image(x, y, proj, north_square, south_square):
    if proj == 0:
        verts = [
            (-M_PI - EPS, M_FORTPI), (-3 * M_FORTPI, M_HALFPI + EPS),
            (-M_HALFPI, M_FORTPI + EPS), (-M_FORTPI, M_HALFPI + EPS),
            (0.0, M_FORTPI + EPS), (M_FORTPI, M_HALFPI + EPS),
            (M_HALFPI, M_FORTPI + EPS), (3 * M_FORTPI, M_HALFPI + EPS),
            (M_PI + EPS, M_FORTPI), (M_PI + EPS, -M_FORTPI),
            (3 * M_FORTPI, -M_HALFPI - EPS), (M_HALFPI, -M_FORTPI - EPS),
            (M_FORTPI, -M_HALFPI - EPS), (0.0, -M_FORTPI - EPS),
            (-M_FORTPI, -M_HALFPI - EPS), (-M_HALFPI, -M_FORTPI - EPS),
            (-3 * M_FORTPI, -M_HALFPI - EPS), (-M_PI - EPS, -M_FORTPI),
            (-M_PI - EPS, M_FORTPI),
        ]
    else:
        ns, ss = north_square, south_square
        verts = [
            (-M_PI - EPS, M_FORTPI + EPS),
            (-M_PI + ns * M_HALFPI - EPS, M_FORTPI + EPS),
            (-M_PI + ns * M_HALFPI - EPS, 3 * M_FORTPI + EPS),
            (-M_PI + (ns + 1.0) * M_HALFPI + EPS, 3 * M_FORTPI + EPS),
            (-M_PI + (ns + 1.0) * M_HALFPI + EPS, M_FORTPI + EPS),
            (M_PI + EPS, M_FORTPI + EPS),
            (M_PI + EPS, -M_FORTPI - EPS),
            (-M_PI + (ss + 1.0) * M_HALFPI + EPS, -M_FORTPI - EPS),
            (-M_PI + (ss + 1.0) * M_HALFPI + EPS, -3 * M_FORTPI - EPS),
            (-M_PI + ss * M_HALFPI - EPS, -3 * M_FORTPI - EPS),
            (-M_PI + ss * M_HALFPI - EPS, -M_FORTPI - EPS),
            (-M_PI - EPS, -M_FORTPI - EPS),
        ]
    return _pnpoly(verts, x, y)


def combine_caps(x, y, north_square, south_square, inverse):
    """Vectorized combine_caps + get_cap (healpix.cpp:354-500)."""
    north = y > M_FORTPI
    south = y < -M_FORTPI
    polar = north | south
    out_x = x.copy()
    out_y = y.copy()
    if not np.any(polar):
        return out_x, out_y
    c_sign = np.where(north, 1.0, -1.0)
    if not inverse:
        # get_cap forward: cap from the x quadrant
        cn = np.where(x < -M_HALFPI, 0,
                      np.where(x < 0, 1, np.where(x < M_HALFPI, 2, 3)))
        cap_x = -3 * M_FORTPI + cn * M_HALFPI
        cap_y = c_sign * M_HALFPI
        pole = np.where(north, north_square, south_square)
        ridx = _rot_index(np.where(north, cn - pole, -(cn - pole)))
        a_x = -3 * M_FORTPI + pole * M_HALFPI
    else:
        pole = np.where(north, north_square, south_square)
        cap_x = -3 * M_FORTPI + pole * M_HALFPI
        cap_y = c_sign * M_HALFPI
        xs = x - pole * M_HALFPI  # shifted x used for cap determination
        cn = np.where(north, north_square, south_square).astype(np.int64)
        n1 = (y >= -xs - M_FORTPI - EPS) & (y < xs + 5 * M_FORTPI - EPS)
        n2 = (y > -xs - M_FORTPI + EPS) & (y >= xs + 5 * M_FORTPI - EPS)
        n3 = (y <= -xs - M_FORTPI + EPS) & (y > xs + 5 * M_FORTPI + EPS)
        cn = np.where(north & n1, (north_square + 1) % 4, cn)
        cn = np.where(north & ~n1 & n2, (north_square + 2) % 4, cn)
        cn = np.where(north & ~n1 & ~n2 & n3, (north_square + 3) % 4, cn)
        s1 = (y <= xs + M_FORTPI + EPS) & (y > -xs - 5 * M_FORTPI + EPS)
        s2 = (y < xs + M_FORTPI - EPS) & (y <= -xs - 5 * M_FORTPI + EPS)
        s3 = (y >= xs + M_FORTPI - EPS) & (y < -xs - 5 * M_FORTPI - EPS)
        cn = np.where(south & s1, (south_square + 1) % 4, cn)
        cn = np.where(south & ~s1 & s2, (south_square + 2) % 4, cn)
        cn = np.where(south & ~s1 & ~s2 & s3, (south_square + 3) % 4, cn)
        ridx = _rot_index(np.where(north, -(cn - pole), cn - pole))
        a_x = -3 * M_FORTPI + cn * M_HALFPI
    R = ROT[np.asarray(ridx, dtype=np.int64)]  # (n, 2, 2)
    vx = x - cap_x
    vy = y - cap_y
    rx = R[:, 0, 0] * vx + R[:, 0, 1] * vy
    ry = R[:, 1, 0] * vx + R[:, 1, 1] * vy
    nx = rx + a_x
    ny = ry + c_sign * M_HALFPI
    out_x = np.where(polar, nx, out_x)
    out_y = np.where(polar, ny, out_y)
    return out_x, out_y


class _HealpixBase(Operation):
    need_ellps = True

    def _setup_ell(self) -> None:
        if self.ell.es != 0.0:
            self.apa = authset(self.ell.es)
            self.qp = float(qsfn(np.array([1.0]), self.ell.e, self.ell.one_es)[0])
            # P->a ← authalic radius (healpix.cpp:634); our kernels stay
            # unitless, so fold the factor into the kernel in/outputs
            self.ra_factor = math.sqrt(0.5 * self.qp)
        else:
            self.ra_factor = 1.0

    def _auth_fwd(self, phi):
        q = qsfn(np.sin(phi), self.ell.e, 1.0 - self.ell.es)
        ratio = np.clip(q / self.qp, -1.0, 1.0)
        return np.arcsin(ratio)

    def _auth_inv(self, phi):
        return authlat(phi, self.apa)


@register
class Healpix(_HealpixBase):
    name = "healpix"

    def setup(self) -> None:
        self._setup_ell()
        self.rot_xy = self.params.float_("rot_xy", 0.0) * (M_PI / 180.0)

    def _rotate(self, x, y, angle):
        ca, sa = math.cos(angle), math.sin(angle)
        return x * ca - y * sa, y * ca + x * sa

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        if self.ell.es != 0.0:
            phi = self._auth_fwd(phi)
        x, y = healpix_sphere(lam, phi)
        x, y = self._rotate(x, y, -self.rot_xy)
        coo.x = x * self.ra_factor
        coo.y = y * self.ra_factor

    def _inv(self, coo: Coords) -> None:
        x = coo.x / self.ra_factor
        y = coo.y / self.ra_factor
        x, y = self._rotate(x, y, self.rot_xy)
        bad = ~in_image(x, y, 0, 0, 0) & np.isfinite(x)
        coo.set_err(bad, ERR_INVALID_X_OR_Y)
        lam, phi = healpix_sphere_inverse(x, y)
        if self.ell.es != 0.0:
            phi = self._auth_inv(phi)
        coo.x = np.where(bad, np.inf, lam)
        coo.y = np.where(bad, np.inf, phi)


@register
class Rhealpix(_HealpixBase):
    name = "rhealpix"

    def setup(self) -> None:
        self._setup_ell()
        self.north_square = self.params.int_("north_square", 0)
        self.south_square = self.params.int_("south_square", 0)
        if not 0 <= self.north_square <= 3:
            raise ProjError(ERR_AXIS, "rhealpix: north_square out of range")
        if not 0 <= self.south_square <= 3:
            raise ProjError(ERR_AXIS, "rhealpix: south_square out of range")

    def _fwd(self, coo: Coords) -> None:
        lam, phi = coo.x, coo.y
        if self.ell.es != 0.0:
            phi = self._auth_fwd(phi)
        x, y = healpix_sphere(lam, phi)
        x, y = combine_caps(x, y, self.north_square, self.south_square, False)
        coo.x = x * self.ra_factor
        coo.y = y * self.ra_factor

    def _inv(self, coo: Coords) -> None:
        x = coo.x / self.ra_factor
        y = coo.y / self.ra_factor
        bad = ~in_image(x, y, 1, self.north_square, self.south_square) & np.isfinite(x)
        coo.set_err(bad, ERR_INVALID_X_OR_Y)
        x, y = combine_caps(x, y, self.north_square, self.south_square, True)
        lam, phi = healpix_sphere_inverse(x, y)
        if self.ell.es != 0.0:
            phi = self._auth_inv(phi)
        coo.x = np.where(bad, np.inf, lam)
        coo.y = np.where(bad, np.inf, phi)
