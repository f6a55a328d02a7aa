"""Datum-shift grid model + binary readers (NTv1 / CTable2 / NTv2 / GTX).

Re-derivation of the reference's grid layer (/root/reference/src/grids.cpp):
  * format auto-detection by magic bytes        (:2336-2378)
  * NTv1 reader  — 192-byte header, BE doubles, E→W rows, arc-seconds (:1565-1647)
  * CTable2      — "CTABLE V2", LE doubles at bytes 96..128, float32 pairs,
                   shifts already in radians (:1687-1760)
  * NTv2 (.gsb)  — 11×16-byte overview + subfile headers, 4 float32/node,
                   arc-seconds, E→W, subgrid hierarchy via SUB_NAME/PARENT
                   (:1851-1990)
  * GTX vertical — 40-byte BE header, float32 undulations (:174-280)
  * subgrid selection gridAt                    (:2400-2421)
  * bilinear interpolation w/ ±1e-5-cell edge snap (:2874-2944)
  * inverse fixed-point loop, ≤10 iters, tol 1e-12 (:2948-3054)
  * nodata-aware vertical interpolation          (:3141-3270)

Unlike the reference's on-demand file reads + LRU caches, grids here
load fully into NumPy arrays (a few MB) — exactly once per Ray actor —
and every lookup/interpolation is vectorized over the whole batch.
Shift arrays are normalized at load: radians, east-positive longitude.
"""

from __future__ import annotations

import math
import os
import struct
from dataclasses import dataclass, field

import numpy as np

from ..core.constants import DEG_TO_RAD, M_PI, M_TWOPI
from ..core.errors import ERR_FAILED_TO_LOAD_GRID, ProjError
from ..core.resources import find_file

SEC_TO_RAD = DEG_TO_RAD / 3600.0
REL_TOL = 1e-5  # REL_TOLERANCE_HGRIDSHIFT
MAX_ITER = 10
TOL = 1e-12


@dataclass
class HGrid:
    """One horizontal shift grid: 2 bands (lat, lon) in radians,
    lon shift east-positive (NT west-positive convention compensated)."""

    name: str
    west: float
    south: float
    east: float
    north: float
    res_x: float
    res_y: float
    lat_shift: np.ndarray  # (H, W) float64, radians
    lon_shift: np.ndarray  # (H, W) float64, radians, east-positive
    children: list = field(default_factory=list)
    is_null: bool = False
    # CTable2/NTv1/NTv2 store lon west-positive; we bake the negation in at
    # load, so the *raw* (uncompensated, grids.cpp:1756) value is −lon_shift.
    raw_flip: bool = False

    @property
    def width(self) -> int:
        return self.lat_shift.shape[1]

    @property
    def height(self) -> int:
        return self.lat_shift.shape[0]

    def epsilon(self) -> float:
        return (self.res_x + self.res_y) * REL_TOL

    def full_world_longitude(self) -> bool:
        # ExtentAndRes::fullWorldLongitude (grids.cpp:79-81)
        return self.east - self.west + self.res_x >= M_TWOPI - 1e-10

    def contains(self, lam: np.ndarray, phi: np.ndarray) -> np.ndarray:
        """Vectorized isPointInExtent (grids.cpp:1420-1435)."""
        eps = self.epsilon()
        ok_y = (phi + eps >= self.south) & (phi - eps <= self.north)
        if self.full_world_longitude():
            return ok_y
        x = np.where(lam + eps < self.west, lam + M_TWOPI, lam)
        x = np.where(x - eps > self.east, x - M_TWOPI, x)
        return ok_y & (x + eps >= self.west) & (x - eps <= self.east)


@dataclass
class VGrid:
    name: str
    west: float
    south: float
    east: float
    north: float
    res_x: float
    res_y: float
    values: np.ndarray  # (H, W) float32
    is_null: bool = False

    @property
    def width(self) -> int:
        return self.values.shape[1]

    @property
    def height(self) -> int:
        return self.values.shape[0]

    def epsilon(self) -> float:
        return 0.0

    def full_world_longitude(self) -> bool:
        return self.east - self.west + self.res_x >= M_TWOPI - 1e-10

    contains = HGrid.contains

    def is_nodata(self, vals: np.ndarray, multiplier: float) -> np.ndarray:
        nodata = getattr(self, "nodata", None)
        if nodata is not None:
            return (vals == np.float32(nodata)) | np.isnan(vals)
        # GTX heuristic (grids.cpp:276-280)
        v = vals * multiplier
        return (v > 1000) | (v < -1000) | (vals == np.float32(-88.88880))


# ---------------------------------------------------------------------------
# Readers
# ---------------------------------------------------------------------------


def open_hgrid_set(name: str) -> list[HGrid]:
    """Open a horizontal gridset file → ordered top-level grids
    (children nested). 'null' → the match-everything null grid."""
    if name == "null":
        z = np.zeros((3, 3))
        return [HGrid("null", -M_PI, -M_PI / 2, M_PI, M_PI / 2, M_PI, M_PI / 2, z, z, is_null=True)]
    path = find_file(name)
    if path is None:
        raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"grid {name!r} not found")
    with open(path, "rb") as f:
        data = f.read()
    if data[:9] == b"CTABLE V2":
        return [_read_ctable2(name, data)]
    if data[:8] == b"NUM_OREC":
        return _read_ntv2(name, data)
    if data[:2] in (b"II", b"MM"):
        from .tiffgrid import tiff_to_hgrids

        return tiff_to_hgrids(data, name)
    if len(data) >= 192 and struct.unpack(">i", data[8:12])[0] == 12:
        return [_read_ntv1(name, data)]
    raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"unrecognized grid format in {name!r}")


def _read_ctable2(name: str, data: bytes) -> HGrid:
    west, south, res_x, res_y = struct.unpack("<4d", data[96:128])
    width, height = struct.unpack("<2i", data[128:136])
    if width <= 0 or height <= 0:
        raise ProjError(ERR_FAILED_TO_LOAD_GRID, name)
    east = west + (width - 1) * res_x
    north = south + (height - 1) * res_x  # sic: the reference uses resX here
    vals = np.frombuffer(data, dtype="<f4", count=width * height * 2, offset=160)
    vals = vals.reshape(height, width, 2)
    # CTable2 stores (lonShift, latShift) pairs, radians, west-positive lon
    lon_shift = -vals[:, :, 0].astype(np.float64)
    lat_shift = vals[:, :, 1].astype(np.float64)
    return HGrid(name, west, south, east, north, res_x, res_y, lat_shift, lon_shift,
                 raw_flip=True)


def _read_ntv1(name: str, data: bytes) -> HGrid:
    south = struct.unpack(">d", data[24:32])[0] * DEG_TO_RAD
    north = struct.unpack(">d", data[40:48])[0] * DEG_TO_RAD
    east = -struct.unpack(">d", data[56:64])[0] * DEG_TO_RAD
    west = -struct.unpack(">d", data[72:80])[0] * DEG_TO_RAD
    res_y = struct.unpack(">d", data[88:96])[0] * DEG_TO_RAD
    res_x = struct.unpack(">d", data[104:112])[0] * DEG_TO_RAD
    cols = int(abs((east - west) / res_x + 0.5) + 1)
    rows = int(abs((north - south) / res_y + 0.5) + 1)
    vals = np.frombuffer(data, dtype=">f8", count=rows * cols * 2, offset=192)
    vals = vals.reshape(rows, cols, 2)
    # NTv1: (latShift, lonShift) doubles in arc-seconds, E→W column order
    lat_shift = vals[:, ::-1, 0] * SEC_TO_RAD
    lon_shift = -vals[:, ::-1, 1] * SEC_TO_RAD
    return HGrid(name, west, south, east, north, res_x, res_y, lat_shift, lon_shift,
                 raw_flip=True)


def _read_ntv2(name: str, data: bytes) -> list[HGrid]:
    if data[56:63] != b"SECONDS":
        raise ProjError(ERR_FAILED_TO_LOAD_GRID, "only GS_TYPE=SECONDS supported")
    le = data[8] == 11  # overview record count as LE byte
    bo = "<" if le else ">"
    num_subfiles = struct.unpack(bo + "i", data[40:44])[0]
    pos = 11 * 16
    top: list[HGrid] = []
    by_name: dict[str, HGrid] = {}
    parent_of: dict[str, str] = {}
    for _ in range(num_subfiles):
        header = data[pos:pos + 11 * 16]
        if header[:8] != b"SUB_NAME":
            raise ProjError(ERR_FAILED_TO_LOAD_GRID, name)
        grid_name = header[8:16].decode("ascii", "replace")
        parent = header[24:32].decode("ascii", "replace")
        def d(i):
            return struct.unpack(bo + "d", header[8 + 16 * i:16 + 16 * i])[0]
        south = d(4) * SEC_TO_RAD
        north = d(5) * SEC_TO_RAD
        east = -d(6) * SEC_TO_RAD
        west = -d(7) * SEC_TO_RAD
        res_y = d(8) * SEC_TO_RAD
        res_x = d(9) * SEC_TO_RAD
        gs_count = struct.unpack(bo + "i", header[8 + 16 * 10:12 + 16 * 10])[0]
        cols = int(abs((east - west) / res_x + 0.5) + 1)
        rows = int(abs((north - south) / res_y + 0.5) + 1)
        pos += 11 * 16
        vals = np.frombuffer(data, dtype=bo + "f4", count=gs_count * 4, offset=pos)
        vals = vals.reshape(rows, cols, 4)
        # NTv2: (latShift, lonShift, latErr, lonErr) float32 arc-seconds, E→W
        lat_shift = vals[:, ::-1, 0].astype(np.float64) * SEC_TO_RAD
        lon_shift = -vals[:, ::-1, 1].astype(np.float64) * SEC_TO_RAD
        g = HGrid(f"{name}, {grid_name}", west, south, east, north, res_x, res_y,
                  lat_shift, lon_shift, raw_flip=True)
        by_name[grid_name] = g
        parent_of[grid_name] = parent
        if parent in by_name:
            by_name[parent].children.append(g)
        else:
            top.append(g)
        pos += gs_count * 4 * 4
    return top


def open_vgrid_set(name: str) -> list[VGrid]:
    if name == "null":
        z = np.zeros((3, 3), dtype=np.float32)
        return [VGrid("null", -M_PI, -M_PI / 2, M_PI, M_PI / 2, M_PI, M_PI / 2, z, is_null=True)]
    path = find_file(name)
    if path is None:
        raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"grid {name!r} not found")
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] in (b"II", b"MM"):
        from .tiffgrid import tiff_to_vgrids

        return tiff_to_vgrids(data, name)
    # GTX: 40-byte big-endian header
    yorigin, xorigin, ystep, xstep = struct.unpack(">4d", data[0:32])
    rows, cols = struct.unpack(">2i", data[32:40])
    if not (-360 <= xorigin <= 360 and -90 <= yorigin <= 90):
        raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"bad gtx header in {name!r}")
    if xorigin >= 180.0:
        xorigin -= 360.0
    vals = np.frombuffer(data, dtype=">f4", count=rows * cols, offset=40).reshape(rows, cols)
    return [
        VGrid(
            name,
            xorigin * DEG_TO_RAD,
            yorigin * DEG_TO_RAD,
            (xorigin + xstep * (cols - 1)) * DEG_TO_RAD,
            (yorigin + ystep * (rows - 1)) * DEG_TO_RAD,
            xstep * DEG_TO_RAD,
            ystep * DEG_TO_RAD,
            vals.astype(np.float32),
        )
    ]


def parse_grid_list(spec: str, opener) -> list:
    """'+grids=a,@b,null' → flat ordered list of gridsets; @name may be
    missing (grids.cpp:2778-2798 @optional semantics)."""
    sets = []
    for tok in spec.split(","):
        tok = tok.strip()
        if not tok:
            continue
        optional = tok.startswith("@")
        if optional:
            tok = tok[1:]
        try:
            sets.append(opener(tok))
        except ProjError:
            if not optional:
                raise
    return sets


# ---------------------------------------------------------------------------
# Vectorized application
# ---------------------------------------------------------------------------


def assign_grids(gridsets: list[list[HGrid]], lam: np.ndarray, phi: np.ndarray):
    """Per-point grid selection (findGrid + gridAt recursion).
    Returns an int array of leaf-grid ids and the id→grid list."""
    n = len(lam)
    leaf_ids = np.full(n, -1, dtype=np.int64)
    leaves: list[HGrid] = []

    def descend(grid: HGrid, mask: np.ndarray) -> None:
        remaining = mask.copy()
        for child in getattr(grid, "children", ()):
            if not np.any(remaining):
                return
            inside = np.zeros(n, dtype=bool)
            inside[remaining] = child.contains(lam[remaining], phi[remaining])
            sub = remaining & inside
            if np.any(sub):
                descend(child, sub)
                remaining &= ~sub
        if np.any(remaining):
            leaves.append(grid)
            leaf_ids[remaining] = len(leaves) - 1

    unassigned = np.ones(n, dtype=bool)
    for gridset in gridsets:
        for grid in gridset:
            if not np.any(unassigned):
                break
            if grid.is_null:
                leaves.append(grid)
                leaf_ids[unassigned] = len(leaves) - 1
                unassigned[:] = False
                break
            inside = np.zeros(n, dtype=bool)
            inside[unassigned] = grid.contains(lam[unassigned], phi[unassigned])
            sub = unassigned & inside
            if np.any(sub):
                descend(grid, sub)
                unassigned &= ~sub
    return leaf_ids, leaves


def interpolate(grid: HGrid, tlam: np.ndarray, tphi: np.ndarray):
    """Vectorized pj_hgrid_interpolate over grid-origin-normalized
    coordinates. Returns (dlam, dphi) with NaN where out of grid."""
    gx = tlam / grid.res_x
    gy = tphi / grid.res_y
    ix = np.floor(gx)
    ix = np.where(np.isnan(ix), 0.0, ix).astype(np.int64)
    iy = np.floor(gy)
    iy = np.where(np.isnan(iy), 0.0, iy).astype(np.int64)
    fx = gx - ix
    fy = gy - iy

    snap = 10 * REL_TOL
    # western / southern edge snap
    west_snap = (ix == -1) & (fx > 1 - snap)
    ix = np.where(west_snap, 0, ix)
    fx = np.where(west_snap, 0.0, fx)
    east_snap = (ix + 1 == grid.width) & (fx < snap)
    ix = np.where(east_snap, ix - 1, ix)
    fx = np.where(east_snap, 1.0, fx)
    south_snap = (iy == -1) & (fy > 1 - snap)
    iy = np.where(south_snap, 0, iy)
    fy = np.where(south_snap, 0.0, fy)
    north_snap = (iy + 1 == grid.height) & (fy < snap)
    iy = np.where(north_snap, iy - 1, iy)
    fy = np.where(north_snap, 1.0, fy)

    valid = (ix >= 0) & (ix + 1 < grid.width) & (iy >= 0) & (iy + 1 < grid.height)
    ixc = np.clip(ix, 0, grid.width - 2)
    iyc = np.clip(iy, 0, grid.height - 2)

    m10 = fx * (1.0 - fy)
    m11 = fx * fy
    m01 = (1.0 - fx) * fy
    m00 = (1.0 - fx) * (1.0 - fy)
    lat = grid.lat_shift
    lon = grid.lon_shift
    dphi = (
        m00 * lat[iyc, ixc]
        + m10 * lat[iyc, ixc + 1]
        + m01 * lat[iyc + 1, ixc]
        + m11 * lat[iyc + 1, ixc + 1]
    )
    dlam = (
        m00 * lon[iyc, ixc]
        + m10 * lon[iyc, ixc + 1]
        + m01 * lon[iyc + 1, ixc]
        + m11 * lon[iyc + 1, ixc + 1]
    )
    dlam = np.where(valid, dlam, np.nan)
    dphi = np.where(valid, dphi, np.nan)
    return dlam, dphi


def _normalize_to_grid(grid: HGrid, lam: np.ndarray, phi: np.ndarray):
    eps = grid.epsilon()
    tl = lam - grid.west
    tl = np.where(tl + eps < 0, tl + M_TWOPI, tl)
    tl = np.where(tl - eps > grid.east - grid.west, tl - M_TWOPI, tl)
    return tl, phi - grid.south


def hgrid_apply(gridsets: list[list[HGrid]], lam: np.ndarray, phi: np.ndarray, forward: bool):
    """Vectorized pj_hgrid_apply. Returns (lam', phi', outside_mask)."""
    out_lam = np.full_like(lam, np.nan)
    out_phi = np.full_like(phi, np.nan)
    finite = np.isfinite(lam) & np.isfinite(phi)
    leaf_ids, leaves = assign_grids(gridsets, lam, phi)
    outside = (leaf_ids < 0) & finite
    for gid, grid in enumerate(leaves):
        mask = (leaf_ids == gid) & finite
        if not np.any(mask):
            continue
        if grid.is_null:
            out_lam[mask] = lam[mask]
            out_phi[mask] = phi[mask]
            continue
        gl, gp = lam[mask], phi[mask]
        tbl, tbp = _normalize_to_grid(grid, gl, gp)
        dl, dp = interpolate(grid, tbl, tbp)
        if forward:
            rl = gl + dl
            rp = gp + dp
        else:
            rl, rp = _hgrid_inverse(grid, gridsets, gl, gp, tbl, tbp, dl, dp)
        bad = ~np.isfinite(rl)
        outside[np.flatnonzero(mask)[bad]] = True
        out_lam[mask] = rl
        out_phi[mask] = rp
    return out_lam, out_phi, outside


def _hgrid_inverse(grid, gridsets, gl, gp, tbl, tbp, dl, dp):
    """Masked fixed-point inverse (grids.cpp:2948-3054): ≤10 iters,
    tol 1e-12 on the squared update. Lanes that walk off the grid keep
    their first approximation (the reference's edge behavior); the
    rare cross-grid switch is handled per-lane in scalar fallback."""
    tl = tbl - dl
    tp = tbp - dp
    n = len(gl)
    active = np.isfinite(tl)
    escaped = np.zeros(n, dtype=bool)
    nonconv = active.copy()
    for _ in range(MAX_ITER):
        if not np.any(active):
            break
        del_l, del_p = interpolate(grid, tl[active], tp[active])
        off = ~np.isfinite(del_l)
        idx = np.flatnonzero(active)
        if np.any(off):
            # walked outside this grid: keep current approximation
            escaped[idx[off]] = True
            nonconv[idx[off]] = False
            active[idx[off]] = False
            keep = ~off
            idx = idx[keep]
            del_l = del_l[keep]
            del_p = del_p[keep]
            if len(idx) == 0:
                continue
        dif_l = tl[idx] + del_l - tbl[idx]
        dif_p = tp[idx] + del_p - tbp[idx]
        tl[idx] -= dif_l
        tp[idx] -= dif_p
        done = dif_l * dif_l + dif_p * dif_p <= TOL * TOL
        nonconv[idx[done]] = False
        active[idx[done]] = False
    rl = _adjlon(tl + grid.west)
    rp = tp + grid.south
    rl = np.where(nonconv, np.nan, rl)
    rp = np.where(nonconv, np.nan, rp)
    # cross-grid switching fallback: lanes that escaped into another
    # grid's area get a scalar re-run against the full gridset list
    if np.any(escaped):
        for i in np.flatnonzero(escaped):
            lam_i = tl[i] + grid.west
            phi_i = tp[i] + grid.south
            ids, lvs = assign_grids(gridsets, np.array([lam_i]), np.array([phi_i]))
            if ids[0] >= 0 and lvs[ids[0]] is not grid and not lvs[ids[0]].is_null:
                g2 = lvs[ids[0]]
                tbl2, tbp2 = _normalize_to_grid(g2, np.array([gl[i]]), np.array([gp[i]]))
                l2 = np.array([lam_i - g2.west])
                p2 = np.array([phi_i - g2.south])
                for _ in range(MAX_ITER):
                    d2l, d2p = interpolate(g2, l2, p2)
                    if not np.isfinite(d2l[0]):
                        break
                    dif_l = l2 + d2l - tbl2
                    dif_p = p2 + d2p - tbp2
                    l2 -= dif_l
                    p2 -= dif_p
                    if dif_l[0] ** 2 + dif_p[0] ** 2 <= TOL * TOL:
                        break
                rl[i] = _adjlon(l2 + g2.west)[0]
                rp[i] = (p2 + g2.south)[0]
    return rl, rp


def _adjlon(lon):
    out = np.asarray(lon, dtype=np.float64).copy()
    need = np.abs(out) >= M_PI + 1e-12
    if np.any(need):
        v = out[need] + M_PI
        v -= M_TWOPI * np.floor(v / M_TWOPI)
        out[need] = v - M_PI
    return out


def vgrid_value(gridsets: list[list[VGrid]], lam: np.ndarray, phi: np.ndarray,
                multiplier: float):
    """Vectorized read_vgrid_value (grids.cpp:3141-3270).
    Returns (value*multiplier, outside_mask)."""
    n = len(lam)
    out = np.full(n, np.nan)
    finite = np.isfinite(lam) & np.isfinite(phi)
    leaf_ids, leaves = assign_grids(gridsets, lam, phi)
    outside = (leaf_ids < 0) & finite
    for gid, grid in enumerate(leaves):
        mask = (leaf_ids == gid) & finite
        if not np.any(mask):
            continue
        if grid.is_null:
            out[mask] = 0.0
            continue
        gl, gp = lam[mask], phi[mask]
        gx = (gl - grid.west) / grid.res_x
        if grid.full_world_longitude():
            w = grid.width
            gx = np.mod(np.mod(gx + w, w) + w, w)
        else:
            gx = np.where(gl < grid.west, (gl + M_TWOPI - grid.west) / grid.res_x, gx)
            gx = np.where(gl > grid.east, (gl - M_TWOPI - grid.west) / grid.res_x, gx)
        gy = (gp - grid.south) / grid.res_y
        ix = np.floor(gx).astype(np.int64)
        iy = np.floor(gy).astype(np.int64)
        bad = (ix < 0) | (ix >= grid.width) | (iy < 0) | (iy >= grid.height)
        ixc = np.clip(ix, 0, grid.width - 1)
        iyc = np.clip(iy, 0, grid.height - 1)
        fx = gx - ix
        fy = gy - iy
        ix2 = ixc + 1
        if grid.full_world_longitude():
            ix2 = np.where(ix2 >= grid.width, 0, ix2)
        else:
            ix2 = np.minimum(ix2, grid.width - 1)
        iy2 = np.minimum(iyc + 1, grid.height - 1)
        va = grid.values[iyc, ixc].astype(np.float64)
        vb = grid.values[iyc, ix2].astype(np.float64)
        vc = grid.values[iy2, ixc].astype(np.float64)
        vd = grid.values[iy2, ix2].astype(np.float64)
        wa = (1.0 - fx) * (1.0 - fy)
        wb = fx * (1.0 - fy)
        wc = (1.0 - fx) * fy
        wd = fx * fy
        na = grid.is_nodata(grid.values[iyc, ixc], multiplier)
        nb = grid.is_nodata(grid.values[iyc, ix2], multiplier)
        nc = grid.is_nodata(grid.values[iy2, ixc], multiplier)
        nd = grid.is_nodata(grid.values[iy2, ix2], multiplier)
        wa = np.where(na, 0.0, wa)
        wb = np.where(nb, 0.0, wb)
        wc = np.where(nc, 0.0, wc)
        wd = np.where(nd, 0.0, wd)
        total = wa + wb + wc + wd
        val = va * wa + vb * wb + vc * wc + vd * wd
        with np.errstate(divide="ignore", invalid="ignore"):
            val = np.where(total > 0, val / np.where(total > 0, total, 1.0), np.nan)
        val = np.where(bad, np.nan, val)
        out[mask] = val * multiplier
        outside[np.flatnonzero(mask)[~np.isfinite(val)]] = True
    return out, outside


# ---------------------------------------------------------------------------
# Raw-value lookups + generic (multi-sample) grids — deformation support
# ---------------------------------------------------------------------------


def hgrid_value(gridsets: list[list[HGrid]], lam: np.ndarray, phi: np.ndarray):
    """Vectorized pj_hgrid_value (grids.cpp:3095-3140): the *raw*
    interpolated grid values (no NT-convention lon negation) — used by
    deformation, where a ct2 grid stores velocities, not shifts.
    Returns (value_lam, value_phi, outside_mask)."""
    n = len(lam)
    vlam = np.full(n, np.nan)
    vphi = np.full(n, np.nan)
    finite = np.isfinite(lam) & np.isfinite(phi)
    leaf_ids, leaves = assign_grids(gridsets, lam, phi)
    outside = (leaf_ids < 0) & finite
    for gid, grid in enumerate(leaves):
        mask = (leaf_ids == gid) & finite
        if not np.any(mask):
            continue
        if grid.is_null:
            vlam[mask] = 0.0
            vphi[mask] = 0.0
            continue
        tl, tp = _normalize_to_grid(grid, lam[mask], phi[mask])
        dl, dp = interpolate(grid, tl, tp)
        if grid.raw_flip:
            dl = -dl
        bad = ~np.isfinite(dl)
        outside[np.flatnonzero(mask)[bad]] = True
        vlam[mask] = dl
        vphi[mask] = dp
    return vlam, vphi, outside


@dataclass
class GGrid:
    """Generic multi-sample grid (GenericShiftGrid, grids.cpp:1994-2120):
    N float samples per pixel with per-sample description/unit metadata —
    GeoTIFF-backed (velocity models, deformation)."""

    name: str
    west: float
    south: float
    east: float
    north: float
    res_x: float
    res_y: float
    samples: list  # list of (H, W) float32 arrays, south-first rows
    descs: list
    units: list
    children: list = field(default_factory=list)
    is_null: bool = False
    # dict[(sample, key)] = value; sample −1 = dataset-level
    # (GenericShiftGrid::metadataItem, grids.cpp:2006-2012)
    metadata: dict = field(default_factory=dict)

    @property
    def width(self) -> int:
        return self.samples[0].shape[1]

    @property
    def height(self) -> int:
        return self.samples[0].shape[0]

    def epsilon(self) -> float:
        return 0.0

    def metadata_item(self, key: str, sample: int = -1) -> str:
        return self.metadata.get((sample, key), "")

    full_world_longitude = HGrid.full_world_longitude
    contains = HGrid.contains


def open_generic_set(name: str) -> list:
    """pj_generic_grid_init file opener: GeoTIFF (or 'null')."""
    if name == "null":
        z = np.zeros((3, 3), dtype=np.float32)
        return [GGrid("null", -M_PI, -M_PI / 2, M_PI, M_PI / 2, M_PI, M_PI / 2,
                      [z, z, z], ["", "", ""], ["", "", ""], is_null=True)]
    path = find_file(name)
    if path is None:
        raise ProjError(ERR_FAILED_TO_LOAD_GRID, f"grid {name!r} not found")
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] in (b"II", b"MM"):
        from .tiffgrid import tiff_to_ggrids

        return tiff_to_ggrids(data, name)
    raise ProjError(ERR_FAILED_TO_LOAD_GRID,
                    f"{name!r}: generic grids must be GeoTIFF")


def generic_values_three(gridsets: list, lam: np.ndarray, phi: np.ndarray,
                         wanted=("east_velocity", "north_velocity", "up_velocity"),
                         expected_unit="millimetres per year"):
    """Vectorized pj_bilinear_interpolation_three_samples
    (grids.cpp:3365-3445) over pj_find_generic_grid leaf assignment.
    Sample indices resolve by description match, defaulting to 0/1/2.
    Returns (v1, v2, v3, outside_mask)."""
    n = len(lam)
    v1 = np.full(n, np.nan)
    v2 = np.full(n, np.nan)
    v3 = np.full(n, np.nan)
    finite = np.isfinite(lam) & np.isfinite(phi)
    leaf_ids, leaves = assign_grids(gridsets, lam, phi)
    outside = (leaf_ids < 0) & finite
    for gid, grid in enumerate(leaves):
        mask = (leaf_ids == gid) & finite
        if not np.any(mask):
            continue
        if grid.is_null:
            v1[mask] = 0.0
            v2[mask] = 0.0
            v3[mask] = 0.0
            continue
        if len(grid.samples) < 3:
            raise ProjError(ERR_FAILED_TO_LOAD_GRID,
                            f"{grid.name}: grid has not enough samples")
        idx = [0, 1, 2]
        for i, desc in enumerate(grid.descs):
            for w, want in enumerate(wanted):
                if desc == want:
                    idx[w] = i
        unit = grid.units[idx[0]]
        if unit and unit != expected_unit:
            raise ProjError(ERR_FAILED_TO_LOAD_GRID,
                            f"{grid.name}: only unit={expected_unit} handled")
        gl, gp = lam[mask], phi[mask]
        gx = (gl - grid.west) / grid.res_x
        gx = np.where(gl < grid.west, (gl + M_TWOPI - grid.west) / grid.res_x, gx)
        gx = np.where(gl > grid.east, (gl - M_TWOPI - grid.west) / grid.res_x, gx)
        gy = (gp - grid.south) / grid.res_y
        # truncation-toward-zero int cast as in the reference (:3397)
        ix = gx.astype(np.int64)
        iy = gy.astype(np.int64)
        fx = gx - ix
        fy = gy - iy
        ixc = np.clip(ix, 0, grid.width - 1)
        iyc = np.clip(iy, 0, grid.height - 1)
        ix2 = np.minimum(ixc + 1, grid.width - 1)
        iy2 = np.minimum(iyc + 1, grid.height - 1)
        m10 = fx * (1.0 - fy)
        m11 = fx * fy
        m01 = (1.0 - fx) * fy
        m00 = (1.0 - fx) * (1.0 - fy)
        for out, k in ((v1, idx[0]), (v2, idx[1]), (v3, idx[2])):
            s = grid.samples[k]
            val = (m00 * s[iyc, ixc] + m10 * s[iyc, ix2]
                   + m01 * s[iy2, ixc] + m11 * s[iy2, ix2])
            out[mask] = val
    return v1, v2, v3, outside


@dataclass
class GridInfo:
    """PJ_GRID_INFO (proj.h / 4D_api.cpp proj_grid_info): metadata for
    a named datum grid; empty filename/format 'missing' when the file
    is absent or not a recognized grid."""

    gridname: str = ""
    filename: str = ""
    format: str = "missing"
    n_lon: int = 0
    n_lat: int = 0
    cs_lon: float = 0.0
    cs_lat: float = 0.0
    lowerleft: tuple = (0.0, 0.0)
    upperright: tuple = (0.0, 0.0)


def _grid_format(path: str) -> str:
    with open(path, "rb") as f:
        head = f.read(192)
    if head[:2] in (b"II", b"MM"):
        return "gtiff"
    if head[:9] == b"CTABLE V2":
        return "ctable2"
    if head[:8] == b"NUM_OREC":
        return "ntv2"
    if len(head) >= 12 and struct.unpack(">i", head[8:12])[0] == 12:
        return "ntv1"
    return "gtx"


def grid_info(name: str) -> GridInfo:
    """proj_grid_info (4D_api.cpp:1647-1720): try vertical, then
    horizontal, then generic grid openers; report the first grid's
    size, cell size and bounds. Never raises — a missing or
    unrecognized file reports format='missing' with empty filename."""
    path = find_file(name)
    if path is None:
        return GridInfo(gridname=name)
    for opener in (open_vgrid_set, open_hgrid_set, open_generic_set):
        try:
            grids = opener(name)
        except Exception:
            continue
        if not grids:
            continue
        g = grids[0]
        return GridInfo(
            gridname=name,
            filename=path,
            format=_grid_format(path),
            n_lon=g.width,
            n_lat=g.height,
            cs_lon=g.res_x,
            cs_lat=g.res_y,
            lowerleft=(g.west, g.south),
            upperright=(g.east, g.north),
        )
    return GridInfo(gridname=name)
