"""Engine extensions beyond the reference's pj_list (SURVEY.md §2.9):
operators required to construct EPSG methods the reference's 176-entry
operator table cannot express, closing the proj.db full-registry
construct rate. Names follow modern public PROJ where one exists
(mod_krovak, topocentric); the zoned transverse-Mercator umbrella
(EPSG method 9824) has no public proj-string operator anywhere and is
engine-named ``tmzoned``.

Math sources (all public):
- Krovak Modified (EPSG methods 1042/1043): EPSG Guidance Note 7-2
  §3.2.3 — Krovak then a bivariate polynomial correction about
  (X0, Y0) = (1089000, 654000) with the published C1..C10 constants.
- Geocentric/topocentric (EPSG 9836) and Geographic/topocentric
  (EPSG 9837): EPSG Guidance Note 7-2 §2.2.3/2.2.4 rotation about the
  topocentric origin.
- Transverse Mercator Zoned Grid System (EPSG 9824): zone from
  longitude, zone number prefixed to the easting (EPSG 7-2 §3.5.2).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.errors import ERR_MISSING_ARGS, ProjError
from ..core.op import IO_CARTESIAN, IO_PROJECTED, IO_RADIANS, Coords, Operation
from . import register
from .cart import Cart
from .conic_misc import Krovak

# EPSG Guidance 7-2 Krovak Modified constants (exact published decimals)
_MK_X0 = 1089000.0
_MK_Y0 = 654000.0
_MK_C = (
    2.946529277e-02, 2.515965696e-02, 1.193845912e-07, -4.668270147e-07,
    9.233980362e-12, 1.523735715e-12, 1.696780024e-18, 4.408314235e-18,
    -8.331083518e-24, -3.689471323e-24,
)


def _mk_dxdy(Xp, Yp):
    """EPSG 7-2 §3.2.3 polynomial correction; Xp = southing, Yp =
    westing (both relative to the grid, before false offsets)."""
    c1, c2, c3, c4, c5, c6, c7, c8, c9, c10 = _MK_C
    Xr = Xp - _MK_X0
    Yr = Yp - _MK_Y0
    Xr2 = Xr * Xr
    Yr2 = Yr * Yr
    dX = (c1 + c3 * Xr - c4 * Yr - 2 * c6 * Xr * Yr + c5 * (Xr2 - Yr2)
          + c7 * Xr * (Xr2 - 3 * Yr2) - c8 * Yr * (3 * Xr2 - Yr2)
          + 4 * c9 * Xr * Yr * (Xr2 - Yr2)
          + c10 * (Xr2 * Xr2 + Yr2 * Yr2 - 6 * Xr2 * Yr2))
    dY = (c2 + c3 * Yr + c4 * Xr + 2 * c5 * Xr * Yr + c6 * (Xr2 - Yr2)
          + c8 * Xr * (Xr2 - 3 * Yr2) + c7 * Yr * (3 * Xr2 - Yr2)
          - 4 * c10 * Xr * Yr * (Xr2 - Yr2)
          + c9 * (Xr2 * Xr2 + Yr2 * Yr2 - 6 * Xr2 * Yr2))
    return dX, dY


@register
class ModKrovak(Krovak):
    """Krovak Modified (EPSG 1042/1043): Krovak plus the S-JTSK/05
    polynomial distortion correction. The base class emits
    (x, y) = czech * (westing, southing); the correction applies in the
    positive southing/westing frame and is SUBTRACTED forward. The
    inverse applies one correction evaluation (EPSG 7-2: the correction
    gradient is ~1e-7, one step is exact to sub-micrometre) before the
    base Krovak inverse."""

    name = "mod_krovak"

    def _fwd(self, coo: Coords) -> None:
        super()._fwd(coo)
        # the kernel works in unit-ellipsoid scale (finalize multiplies
        # by a); the EPSG polynomial is defined in metres
        a = self.ell.a
        cz = self.czech
        S = coo.y * cz * a
        W = coo.x * cz * a
        dX, dY = _mk_dxdy(S, W)
        coo.y = ((S - dX) / a) * cz
        coo.x = ((W - dY) / a) * cz

    def _inv(self, coo: Coords) -> None:
        a = self.ell.a
        cz = self.czech
        S = coo.y * cz * a
        W = coo.x * cz * a
        dX, dY = _mk_dxdy(S, W)
        coo.y = ((S + dX) / a) * cz
        coo.x = ((W + dY) / a) * cz
        super()._inv(coo)


@register
class Topocentric(Operation):
    """Topocentric conversion (EPSG 9836; modern PROJ's +proj=topocentric):
    cartesian geocentric -> (U, V, W) about a topocentric origin given
    either geocentric (+X_0/+Y_0/+Z_0) or geographic
    (+lon_0/+lat_0/+h_0). Composes after +proj=cart for the
    geographic/topocentric method (EPSG 9837)."""

    name = "topocentric"
    need_ellps = True

    def setup(self) -> None:
        p = self.params
        self.left = IO_CARTESIAN
        self.right = IO_CARTESIAN
        if p.has("X_0") or p.has("Y_0") or p.has("Z_0"):
            self.ox = p.float_("X_0", 0.0)
            self.oy = p.float_("Y_0", 0.0)
            self.oz = p.float_("Z_0", 0.0)
            geo = Coords(np.array([self.ox]), np.array([self.oy]),
                         np.array([self.oz]))
            Cart._inv(self, geo)  # only uses self.ell
            lam0 = float(geo.x[0])
            phi0 = float(geo.y[0])
        else:
            # degrees were converted to radians by Params for lon_0/lat_0
            lam0 = self.lam0
            phi0 = self.phi0
            h0 = p.float_("h_0", 0.0)
            org = Coords(np.array([lam0]), np.array([phi0]), np.array([h0]))
            Cart._fwd(self, org)
            self.ox = float(org.x[0])
            self.oy = float(org.y[0])
            self.oz = float(org.z[0])
        self.sl, self.cl = math.sin(lam0), math.cos(lam0)
        self.sp, self.cp = math.sin(phi0), math.cos(phi0)
        # topocentric output carries no angular/x0 finalize machinery
        self.skip_fwd_finalize = True
        self.skip_inv_prepare = True

    def _fwd(self, coo: Coords) -> None:
        dx = coo.x - self.ox
        dy = coo.y - self.oy
        dz = coo.z - self.oz
        u = -self.sl * dx + self.cl * dy
        v = (-self.sp * self.cl * dx - self.sp * self.sl * dy
             + self.cp * dz)
        w = (self.cp * self.cl * dx + self.cp * self.sl * dy
             + self.sp * dz)
        coo.x, coo.y, coo.z = u, v, w

    def _inv(self, coo: Coords) -> None:
        u, v, w = coo.x, coo.y, coo.z
        coo.x = self.ox + (-self.sl * u - self.sp * self.cl * v
                           + self.cp * self.cl * w)
        coo.y = self.oy + (self.cl * u - self.sp * self.sl * v
                           + self.cp * self.sl * w)
        coo.z = self.oz + (self.cp * v + self.sp * w)


@register
class TmercZoned(Operation):
    """Transverse Mercator Zoned Grid System (EPSG method 9824, e.g.
    EPSG:32600/32700 umbrella UTM codes): per-point zone from
    longitude, standard TM within the zone, zone number prefixed to
    the easting (zone * 10^6 + easting). Engine extension — neither
    the reference nor public PROJ expose a proj-string operator for
    this method. Parameters: +lon_i (initial longitude, degrees;
    default -180), +zw (zone width, degrees; default 6), plus the
    usual +k_0/+x_0/+y_0."""

    name = "tmzoned"
    need_ellps = True

    def setup(self) -> None:
        p = self.params
        self.left = IO_RADIANS
        self.right = IO_PROJECTED
        self.lon_i = p.float_("lon_i", -180.0)
        self.zw = p.float_("zw", 6.0)
        if self.zw <= 0:
            raise ProjError(ERR_MISSING_ARGS, "tmzoned: +zw must be > 0")
        self.nzones = max(1, int(round(360.0 / self.zw)))
        self._zone_ops: dict = {}
        # the zone prefix makes x_0 per-zone; neutralize generic finalize
        self._k0 = self.k0
        self._x0 = self.x0
        self._y0 = self.y0
        self.x0 = 0.0
        self.y0 = 0.0

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_zone_ops"] = {}
        return state

    def _zone_op(self, zone: int):
        op = self._zone_ops.get(zone)
        if op is None:
            from ..core.factory import create_operation

            lon0 = self.lon_i + (zone - 0.5) * self.zw
            lat0 = self.phi0 * (180.0 / math.pi)
            ell = self.ell
            op = create_operation(
                f"+proj=tmerc +lat_0={lat0!r} +lon_0={lon0!r} "
                f"+k_0={self._k0!r} +x_0={self._x0!r} +y_0={self._y0!r} "
                f"+a={ell.a!r} +es={ell.es!r}"
            )
            self._zone_ops[zone] = op
        return op

    def _fwd(self, coo: Coords) -> None:
        from ..core.op import FWD

        lon_deg = coo.x * (180.0 / math.pi)
        # EPSG 9824: Z = INT((lon + 180 + W)/W) mod 60 — the zone
        # wraps at the antimeridian rather than clipping (lon=+180
        # belongs to zone 1, not zone nzones)
        zone = (np.floor((lon_deg - self.lon_i) / self.zw).astype(np.int64)
                % self.nzones) + 1
        x = np.empty_like(coo.x)
        y = np.empty_like(coo.y)
        for z in np.unique(zone):
            m = zone == z
            sub = Coords(coo.x[m], coo.y[m], coo.z[m],
                         coo.t[m] if coo.t is not None else None)
            self._zone_op(int(z)).trans(FWD, sub)
            x[m] = sub.x + float(z) * 1e6
            y[m] = sub.y
        coo.x, coo.y = x, y

    def _inv(self, coo: Coords) -> None:
        from ..core.op import INV

        zone = np.clip(np.floor(coo.x / 1e6).astype(np.int64), 1, self.nzones)
        x = np.empty_like(coo.x)
        y = np.empty_like(coo.y)
        for z in np.unique(zone):
            m = zone == z
            sub = Coords(coo.x[m] - float(z) * 1e6, coo.y[m], coo.z[m],
                         coo.t[m] if coo.t is not None else None)
            self._zone_op(int(z)).trans(INV, sub)
            x[m] = sub.x
            y[m] = sub.y
        coo.x, coo.y = x, y
