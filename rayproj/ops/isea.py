"""ISEA — Icosahedral Snyder Equal Area (forward only).

Semantics per /root/reference/src/projections/isea.cpp (Nathan
Wagner's public-domain implementation of Snyder 1992): a coordinate
rotation putting the icosahedron's standard orientation pole at the
north pole (snyder_ctran, mpawm p31), the Snyder equal-area forward
onto the 20 icosahedron faces (isea.cpp:319-488, Snyder eqs 5-12
with the 60° azimuth-multiple trick), then one of four output
addressings: plane (unfolded icosahedron), q2di, q2dd, or global hex
coordinates (aperture-3/4 hex binning, isea.cpp:581-1002).

The per-triangle search is vectorized as ≤20 masked passes (first
matching face wins, matching the reference's loop order); the hex
binning is vectorized int64 arithmetic with the reference's int32
overflow guards turned into per-lane error codes.
"""

from __future__ import annotations

import numpy as np

from ..core.errors import ERR_ELLIPSOIDAL_UNSUPPORTED, ERR_NON_CONVERGENT, ProjError
from ..core.op import Coords, Operation
from . import register

DEG36 = 0.62831853071795864768
DEG72 = 1.25663706143591729537
DEG90 = np.pi / 2
DEG108 = 1.88495559215387594306
DEG120 = 2.09439510239319549229
DEG144 = 2.51327412287183459075
DEG180 = np.pi

ISEA_SCALE = 0.8301572857837594396028083  # sqrt(5)/pi
V_LAT = 0.46364760899944494524
E_RAD = 0.91843818702186776133
F_RAD = 0.18871053072122403508
TABLE_G = 0.6615845383
TABLE_H = 0.1909830056
ISEA_STD_LAT = 1.01722196792335072101
ISEA_STD_LON = 0.19634954084936207740
RPRIME = 0.91038328153090290025
DBL_EPS = np.finfo(np.float64).eps
INT_MAX = 2 ** 31 - 1

# icosahedron vertices (isea.cpp:203-216)
_VERTEX = np.array(
    [
        [0.0, DEG90], [DEG180, V_LAT], [-DEG108, V_LAT], [-DEG36, V_LAT],
        [DEG36, V_LAT], [DEG108, V_LAT], [-DEG144, -V_LAT], [-DEG72, -V_LAT],
        [0.0, -V_LAT], [DEG72, -V_LAT], [DEG144, -V_LAT], [0.0, -DEG90],
    ]
)
_TRI_V1 = [0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10, 2, 3, 4, 5, 1, 11, 11, 11, 11, 11]
# triangle centers (isea.cpp:223-245), index 1..20
_TRI_CENTER = np.array(
    [
        [0.0, 0.0],
        [-DEG144, E_RAD], [-DEG72, E_RAD], [0.0, E_RAD], [DEG72, E_RAD], [DEG144, E_RAD],
        [-DEG144, F_RAD], [-DEG72, F_RAD], [0.0, F_RAD], [DEG72, F_RAD], [DEG144, F_RAD],
        [-DEG108, -F_RAD], [-DEG36, -F_RAD], [DEG36, -F_RAD], [DEG108, -F_RAD],
        [DEG180, -F_RAD],
        [-DEG108, -E_RAD], [-DEG36, -E_RAD], [DEG36, -E_RAD], [DEG108, -E_RAD],
        [DEG180, -E_RAD],
    ]
)
# snyder icosahedron constants (isea.cpp:193-201, degrees)
_C_G = np.deg2rad(37.37736814)
_C_BIGG = np.deg2rad(36.0)
_C_THETA = np.deg2rad(30.0)


def _az_adjustment(tri: int) -> float:
    v = _VERTEX[_TRI_V1[tri]]
    c = _TRI_CENTER[tri]
    return np.arctan2(
        np.cos(v[1]) * np.sin(v[0] - c[0]),
        np.cos(c[1]) * np.sin(v[1]) - np.sin(c[1]) * np.cos(v[1]) * np.cos(v[0] - c[0]),
    )


_AZ_ADJ = np.array([0.0] + [_az_adjustment(i) for i in range(1, 21)])


def _triangle_xy(tri):
    """Unfolded-plane triangle centers (isea.cpp:265-297); tri array."""
    t = (tri - 1) % 20
    x = TABLE_G * ((t % 5) - 2) * 2.0
    x = np.where(t > 9, x + TABLE_G, x)
    row = t // 5
    y = np.choose(row, [5.0 * TABLE_H, TABLE_H, -TABLE_H, -5.0 * TABLE_H])
    return x * RPRIME, y * RPRIME


def _ctran(o_lat, o_lon, o_az, lon, lat):
    """isea_ctran (isea.cpp:509-577): rotate so the orientation pole
    becomes the north pole."""
    np_lon = o_lon + np.pi
    alpha, beta = o_lat, np_lon
    sin_phip = np.sin(alpha) * np.sin(lat) - np.cos(alpha) * np.cos(lat) * np.cos(lon - beta)
    lp_b = np.arctan2(
        np.cos(lat) * np.sin(lon - beta),
        np.sin(alpha) * np.cos(lat) * np.cos(lon - beta) + np.cos(alpha) * np.sin(lat),
    )
    lambdap = lp_b + beta
    lambdap = np.mod(lambdap + np.pi, 2 * np.pi) - np.pi
    phip = np.arcsin(np.clip(sin_phip, -1.0, 1.0))
    lambdap = lambdap - (np.pi - o_az + o_lon) + np.pi
    lambdap = np.mod(lambdap + np.pi, 2 * np.pi) - np.pi
    return lambdap, phip


def _snyder_forward(lon, lat):
    """isea_snyder_forward (isea.cpp:319-488), vectorized over the
    batch with a masked pass per face. Returns (x, y, tri, bad)."""
    n = len(lon)
    x = np.zeros(n)
    y = np.zeros(n)
    tri = np.zeros(n, dtype=np.int64)
    unassigned = np.ones(n, dtype=bool)
    cot_theta = 1.0 / np.tan(_C_THETA)
    tan_g = np.tan(_C_G)
    sin_G, cos_G = np.sin(_C_BIGG), np.cos(_C_BIGG)
    for i in range(1, 21):
        if not unassigned.any():
            break
        clon, clat = _TRI_CENTER[i]
        idx = np.nonzero(unassigned)[0]
        ll_lon, ll_lat = lon[idx], lat[idx]
        z = np.arccos(
            np.clip(
                np.sin(clat) * np.sin(ll_lat)
                + np.cos(clat) * np.cos(ll_lat) * np.cos(ll_lon - clon),
                -1.0, 1.0,
            )
        )
        cand = z <= _C_G + 0.000005
        if not cand.any():
            continue
        Az = np.arctan2(
            np.cos(ll_lat) * np.sin(ll_lon - clon),
            np.cos(clat) * np.sin(ll_lat)
            - np.sin(clat) * np.cos(ll_lat) * np.cos(ll_lon - clon),
        )
        Az = Az - _AZ_ADJ[i]
        Az = np.where(Az < 0.0, Az + 2.0 * np.pi, Az)
        mult = np.zeros(len(idx), dtype=np.int64)
        for _ in range(4):  # Az ∈ [0, 2π): at most 3 adjustments
            m = Az < 0.0
            Az = np.where(m, Az + DEG120, Az)
            mult = np.where(m, mult - 1, mult)
            m2 = Az > DEG120 + DBL_EPS
            Az = np.where(m2, Az - DEG120, Az)
            mult = np.where(m2, mult + 1, mult)
        q = np.arctan2(tan_g, np.cos(Az) + np.sin(Az) * cot_theta)
        ok = cand & (z <= q + 0.000005)
        if not ok.any():
            continue
        H = np.arccos(
            np.clip(np.sin(Az) * sin_G * np.cos(_C_G) - np.cos(Az) * cos_G, -1.0, 1.0)
        )
        Ag = Az + _C_BIGG + H - DEG180
        Azprime = np.arctan2(2.0 * Ag, RPRIME * RPRIME * tan_g * tan_g - 2.0 * Ag * cot_theta)
        dprime = RPRIME * tan_g / (np.cos(Azprime) + np.sin(Azprime) * cot_theta)
        with np.errstate(divide="ignore", invalid="ignore"):
            f = dprime / (2.0 * RPRIME * np.sin(q / 2.0))
        rho = 2.0 * RPRIME * f * np.sin(z / 2.0)
        Azprime = Azprime + DEG120 * mult
        sel = idx[ok]
        x[sel] = (rho * np.sin(Azprime))[ok]
        y[sel] = (rho * np.cos(Azprime))[ok]
        tri[sel] = i
        unassigned[sel] = False
    return x, y, tri, unassigned


def _rotate(x, y, degrees):
    rad = -np.deg2rad(degrees)
    c, s = np.cos(rad), np.sin(rad)
    return x * c + y * s, -x * s + y * c


def _hexbin2(width, x, y):
    """hexbin2 (isea.cpp:83-135): nearest hex center in axial coords.
    Returns (i, j, overflow_mask)."""
    x = x / np.cos(np.pi / 6)
    y = y - x / 2.0
    x = x / width
    y = y / width
    z = -x - y
    rx = np.floor(x + 0.5)
    ry = np.floor(y + 0.5)
    rz = np.floor(z + 0.5)
    ix = rx.astype(np.int64)
    iy = ry.astype(np.int64)
    iz = rz.astype(np.int64)
    bad = (np.abs(rx + ry) > INT_MAX) | (np.abs(rx + ry + rz) > INT_MAX)
    s = ix + iy + iz
    adx = np.abs(rx - x)
    ady = np.abs(ry - y)
    adz = np.abs(rz - z)
    fix_x = (s != 0) & (adx >= ady) & (adx >= adz)
    fix_y = (s != 0) & ~fix_x & (ady >= adx) & (ady >= adz)
    fix_z = (s != 0) & ~fix_x & ~fix_y
    ix = np.where(fix_x, ix - s, ix)
    iy = np.where(fix_y, iy - s, iy)
    iz = np.where(fix_z, iz - s, iz)
    # hex_xy (isea.cpp:58-67) with iso input
    hx = ix
    hy = np.where(hx >= 0, -iy - (hx + 1) // 2, -iy - hx // 2)
    return hx, hy, bad


def _hex_iso(hx, hy):
    """hex_iso (isea.cpp:69-81): xy → iso (x, y, z) cube coords."""
    yy = np.where(hx >= 0, -hy - (hx + 1) // 2, -hy - hx // 2)
    return hx, yy, -hx - yy


@register
class Isea(Operation):
    name = "isea"
    need_ellps = True

    def setup(self) -> None:
        p = self.params
        # defaults (isea_grid_init + PROJECTION body)
        self.o_lat = ISEA_STD_LAT
        self.o_lon = ISEA_STD_LON
        self.o_az = 0.0
        self.radius = 1.0
        self.output = "plane"
        orient = p.str_("orient")
        if orient is not None:
            if orient == "isea":
                self.o_lat, self.o_lon, self.o_az = ISEA_STD_LAT, ISEA_STD_LON, 0.0
            elif orient == "pole":
                self.o_lat, self.o_lon, self.o_az = np.pi / 2.0, 0.0, 0.0
            else:
                raise ProjError(ERR_ELLIPSOIDAL_UNSUPPORTED, f"isea: bad orient {orient}")
        if p.has("azi"):
            self.o_az = p.rad("azi")
        if p.has("lon_0"):
            self.o_lon = p.rad("lon_0")
        if p.has("lat_0"):
            self.o_lat = p.rad("lat_0")
        mode = p.str_("mode")
        if mode is not None:
            if mode not in ("plane", "di", "dd", "hex"):
                raise ProjError(ERR_ELLIPSOIDAL_UNSUPPORTED, f"isea: bad mode {mode}")
            self.output = mode
        if p.has("rescale"):
            self.radius = ISEA_SCALE
        self.resolution = p.int_("resolution", 4)
        self.aperture = p.int_("aperture", 3)
        # the generic finalize applies lam0 itself; isea's own lon_0 is
        # the grid orientation, not a false-easting shift
        self.lam0 = 0.0

    # -- output addressing -------------------------------------------------

    def _ptdd(self, tri, x, y):
        """isea_ptdd (isea.cpp:670-683): triangle → quad 2D coords."""
        downtri = ((tri - 1) // 5) % 2 == 1
        quad = (tri - 1) % 5 + ((tri - 1) // 10) * 5 + 1
        xr, yr = _rotate(x, y, np.where(downtri, 240.0, 60.0))
        xr = np.where(downtri, xr + 0.5, xr)
        yr = np.where(downtri, yr + 0.86602540378443864672, yr)
        return quad, xr, yr

    def _dddi(self, quad, x, y):
        """isea_dddi (+ ap3odd) (isea.cpp:685-840): quad dd → d,i hex
        indices. Returns (quad, d, i, bad)."""
        if self.aperture == 3 and self.resolution % 2 != 0:
            sidelength_d = (2.0 ** self.resolution + 1.0) / 2.0
            hexwidth = np.cos(np.pi / 6.0) / sidelength_d
            maxcoord = np.int64(round(sidelength_d * 2.0))
            hx, hy, bad = _hexbin2(hexwidth, x, y)
            hx, hy, hz = _hex_iso(hx, hy)
            d = hx - hz
            i = hx + hy + hy
            north = (quad <= 5)
            # ordered exclusive cases, north quads (isea.cpp:718-735)
            c_np = north & (d == 0) & (i == maxcoord)
            c_ur = north & ~c_np & (i == maxcoord)
            c_lr = north & ~c_np & ~c_ur & (d == maxcoord)
            # south quads (isea.cpp:736-754)
            c_sp = ~north & (i == 0) & (d == maxcoord)
            c_lr2 = ~north & ~c_sp & (d == maxcoord)
            c_ur2 = ~north & ~c_sp & ~c_lr2 & (i == maxcoord)
            new_quad = quad.copy()
            new_d = d.copy()
            new_i = i.copy()
            new_quad = np.where(c_np, 0, new_quad)
            new_d = np.where(c_np, 0, new_d)
            new_i = np.where(c_np, 0, new_i)
            q_ur = np.where(quad + 1 == 6, 1, quad + 1)
            new_quad = np.where(c_ur, q_ur, new_quad)
            new_i = np.where(c_ur, maxcoord - d, new_i)
            new_d = np.where(c_ur, 0, new_d)
            new_quad = np.where(c_lr, quad + 5, new_quad)
            new_d = np.where(c_lr, 0, new_d)
            new_quad = np.where(c_sp, 11, new_quad)
            new_d = np.where(c_sp, 0, new_d)
            new_i = np.where(c_sp, 0, new_i)
            q_lr2 = np.where(quad + 1 == 11, 6, quad + 1)
            new_quad = np.where(c_lr2, q_lr2, new_quad)
            new_d = np.where(c_lr2, maxcoord - i, new_d)
            new_i = np.where(c_lr2, 0, new_i)
            new_quad = np.where(c_ur2, (quad - 4) % 5, new_quad)
            new_i = np.where(c_ur2, 0, new_i)
            return new_quad, new_d, new_i, bad
        # aperture^ated even path (isea.cpp:763-840)
        if self.aperture > 0:
            sidelength_d = float(self.aperture) ** (self.resolution / 2.0)
            if abs(sidelength_d) > INT_MAX:
                raise ProjError(ERR_NON_CONVERGENT, "isea: integer overflow")
            sidelength = np.int64(round(sidelength_d))
        else:
            sidelength = np.int64(self.resolution)
        if sidelength == 0:
            raise ProjError(ERR_NON_CONVERGENT, "isea: division by zero")
        hexwidth = 1.0 / float(sidelength)
        xr, yr = _rotate(x, y, -30.0)
        hx, hy, bad = _hexbin2(hexwidth, xr, yr)
        hx, hy, hz = _hex_iso(hx, hy)
        north = (quad <= 5)
        c_np = north & (hx == 0) & (hz == -sidelength)
        c_z = north & ~c_np & (hz == -sidelength)
        c_x = north & ~c_np & ~c_z & (hx == sidelength)
        c_sp = ~north & (hz == 0) & (hx == sidelength)
        c_x2 = ~north & ~c_sp & (hx == sidelength)
        c_y2 = ~north & ~c_sp & ~c_x2 & (hy == -sidelength)
        nq = quad.copy()
        nx, ny, nz = hx.copy(), hy.copy(), hz.copy()
        nq = np.where(c_np, 0, nq)
        nx = np.where(c_np, 0, nx)
        ny = np.where(c_np, 0, ny)
        nz = np.where(c_np, 0, nz)
        q_z = np.where(quad + 1 == 6, 1, quad + 1)
        nq = np.where(c_z, q_z, nq)
        ny = np.where(c_z, sidelength - hx, ny)
        nz = np.where(c_z, hx - sidelength, nz)
        nx = np.where(c_z, 0, nx)
        nq = np.where(c_x, quad + 5, nq)
        ny = np.where(c_x, -hz, ny)
        nx = np.where(c_x, 0, nx)
        nq = np.where(c_sp, 11, nq)
        nx = np.where(c_sp, 0, nx)
        ny = np.where(c_sp, 0, ny)
        nz = np.where(c_sp, 0, nz)
        q_x2 = np.where(quad + 1 == 11, 6, quad + 1)
        nq = np.where(c_x2, q_x2, nq)
        nx2val = hy + sidelength
        nx = np.where(c_x2, nx2val, nx)
        ny = np.where(c_x2, 0, ny)
        nz = np.where(c_x2, -nx2val, nz)
        nq = np.where(c_y2, quad - 4, nq)
        ny = np.where(c_y2, 0, ny)
        nz = np.where(c_y2, -hx, nz)
        return nq, nx, -nz, bad

    def _fwd(self, coo: Coords) -> None:
        lon, lat = _ctran(self.o_lat, self.o_lon, self.o_az, coo.x, coo.y)
        x, y, tri, bad = _snyder_forward(lon, lat)
        x *= self.radius
        y *= self.radius
        if self.output == "plane":
            downtri = ((tri - 1) // 5) % 2 == 1
            xr, yr = _rotate(x, y, np.where(downtri, 180.0, 0.0))
            tcx, tcy = _triangle_xy(np.maximum(tri, 1))
            coo.set_err(bad, ERR_NON_CONVERGENT)
            coo.x = xr + tcx * self.radius
            coo.y = yr + tcy * self.radius
            return
        # isea standard triangle normalization (isea.cpp:968-972)
        x = x / self.radius * ISEA_SCALE + 0.5
        y = y / self.radius * ISEA_SCALE + 2.0 * 0.14433756729740644112
        quad, xq, yq = self._ptdd(tri, x, y)
        if self.output == "dd":
            coo.set_err(bad, ERR_NON_CONVERGENT)
            coo.x, coo.y = xq, yq
            return
        quad2, d, i, bad2 = self._dddi(quad, xq, yq)
        bad = bad | bad2
        if self.output == "di":
            coo.set_err(bad, ERR_NON_CONVERGENT)
            coo.x = d.astype(np.float64)
            coo.y = i.astype(np.float64)
            return
        # hex (isea.cpp:890-908): 16*d + quad packing with int32 guard
        shift_bad = (d < -(2 ** 27)) | (d > INT_MAX >> 4)
        bad = bad | shift_bad
        coo.set_err(bad, ERR_NON_CONVERGENT)
        coo.x = (d * 16 + quad2).astype(np.float64)
        coo.y = i.astype(np.float64)
