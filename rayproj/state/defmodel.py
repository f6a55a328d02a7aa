"""Deformation-model master-file evaluator (+proj=defmodel).

Semantics re-derived from /root/reference/src/transformations/
defmodel.hpp / defmodel_impl.hpp / defmodel.cpp:
  * master-file JSON parsing + validation     (defmodel_impl.hpp:347-520)
  * ISO8601 → decimal year                    (:224-253)
  * time functions constant/velocity/step/reverse_step/piecewise/
    exponential                               (:560-710)
  * component bbox gating + grid lookup + bilinear / geocentric_bilinear
    interpolation, offset accumulation        (:820-1150)
  * ENU→geocentric application + degree/metre units (:1150-1220)
  * fixed-point inverse, ≤10 iters            (:1223-1260)

The evaluator is the stateful side input of the Ray stage: parsed JSON
+ velocity grids load once per worker (dropped from pickled state) and
every lookup is vectorized over the batch.
"""

from __future__ import annotations

import json

import numpy as np

from ..core.constants import DEG_TO_RAD, M_PI
from ..core.errors import ProjError
from .grids import GGrid, assign_grids, open_generic_set

M_TWOPI = 2.0 * M_PI

_MONTH_TABLE = (
    (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31),
    (31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31),
)


class ModelError(ValueError):
    pass


def iso8601_to_decimal_year(dt: str) -> float:
    """ISO8601ToDecimalYear (defmodel_impl.hpp:224-253)."""
    import re

    m = re.fullmatch(r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z", dt)
    if not m:
        raise ModelError(f"Wrong formatting / invalid date-time for {dt}")
    year, month, day, hour, minute, sec = (int(g) for g in m.groups())
    if (year < 1582 or not 1 <= month <= 12 or day < 1 or day > 31
            or hour >= 24 or minute >= 60 or sec >= 61):
        raise ModelError(f"Wrong formatting / invalid date-time for {dt}")
    leap = 1 if ((year % 4 == 0 and year % 100 != 0) or year % 400 == 0) else 0
    if day > _MONTH_TABLE[leap][month - 1]:
        raise ModelError(f"Wrong formatting / invalid date-time for {dt}")
    day_in_year = day - 1 + sum(_MONTH_TABLE[leap][:month - 1])
    denom = 86400.0 * (366 if leap else 365)
    return year + (day_in_year * 86400 + hour * 3600 + minute * 60 + sec) / denom


def _req_str(j: dict, key: str) -> str:
    if key not in j:
        raise ModelError(f'Missing "{key}" key')
    v = j[key]
    if not isinstance(v, str):
        raise ModelError(f'The value of "{key}" should be a string')
    return v


def _opt_str(j: dict, key: str) -> str:
    return _req_str(j, key) if key in j else ""


def _req_num(j: dict, key: str) -> float:
    if key not in j:
        raise ModelError(f'Missing "{key}" key')
    v = j[key]
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise ModelError(f'The value of "{key}" should be a number')
    return float(v)


def _obj(j: dict, key: str) -> dict:
    if key not in j:
        raise ModelError(f'Missing "{key}" key')
    v = j[key]
    if not isinstance(v, dict):
        raise ModelError(f'The value of "{key}" should be a object')
    return v


class SpatialExtent:
    def __init__(self, j: dict):
        if _req_str(j, "type") != "bbox":
            raise ModelError("unsupported type of extent")
        bbox = _obj(j, "parameters").get("bbox")
        if not isinstance(bbox, list) or len(bbox) != 4 or not all(
            isinstance(v, (int, float)) and not isinstance(v, bool) for v in bbox
        ):
            raise ModelError("bbox is not an array of 4 numeric elements")
        self.minx, self.miny, self.maxx, self.maxy = (float(v) for v in bbox)

    def normalized(self, is_geographic: bool):
        m = DEG_TO_RAD if is_geographic else 1.0
        return self.minx * m, self.miny * m, self.maxx * m, self.maxy * m


class TimeFunction:
    def evaluate(self, t: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class ConstantTF(TimeFunction):
    def evaluate(self, t):
        return np.ones_like(t)


class VelocityTF(TimeFunction):
    def __init__(self, ref: float):
        self.ref = ref

    def evaluate(self, t):
        return t - self.ref


class StepTF(TimeFunction):
    def __init__(self, epoch: float):
        self.epoch = epoch

    def evaluate(self, t):
        return np.where(t < self.epoch, 0.0, 1.0)


class ReverseStepTF(TimeFunction):
    def __init__(self, epoch: float):
        self.epoch = epoch

    def evaluate(self, t):
        return np.where(t < self.epoch, -1.0, 0.0)


class PiecewiseTF(TimeFunction):
    def __init__(self, before: str, after: str, model: list):
        if before not in ("zero", "constant", "linear"):
            raise ModelError("Unsupported value for before_first")
        if after not in ("zero", "constant", "linear"):
            raise ModelError("Unsupported value for afterLast")
        self.before = before
        self.after = after
        self.epochs = np.array([e for e, _ in model])
        self.factors = np.array([f for _, f in model])

    def evaluate(self, t):
        ep, fa = self.epochs, self.factors
        if len(ep) == 0:
            return np.zeros_like(t)
        out = np.interp(t, ep, fa)
        first, last = ep[0], ep[-1]
        if self.before == "zero":
            out = np.where(t < first, 0.0, out)
        elif self.before == "linear" and len(ep) > 1 and ep[0] != ep[1]:
            slope = (fa[1] - fa[0]) / (ep[1] - ep[0])
            out = np.where(t < first, fa[0] + slope * (t - first), out)
        else:
            out = np.where(t < first, fa[0], out)
        if self.after == "zero":
            # t == last also falls through to after_last in the reference
            out = np.where(t >= last, 0.0, out)
        elif self.after == "linear" and len(ep) > 1 and ep[-2] != ep[-1]:
            slope = (fa[-1] - fa[-2]) / (ep[-1] - ep[-2])
            out = np.where(t > last, fa[-1] + slope * (t - last), out)
        else:
            out = np.where(t > last, fa[-1], out)
        return out


class ExponentialTF(TimeFunction):
    def __init__(self, ref, end, tau, before, initial, final):
        if tau <= 0:
            raise ModelError("Invalid value for relaxation_constant")
        self.ref, self.end, self.tau = ref, end, tau
        self.before, self.initial, self.final = before, initial, final

    def evaluate(self, t):
        te = np.minimum(t, self.end) if self.end is not None else t
        val = self.initial + (self.final - self.initial) * (
            1.0 - np.exp(-(te - self.ref) / self.tau)
        )
        return np.where(t < self.ref, self.before, val)


_DISPLACEMENT = {"none": 0, "horizontal": 1, "vertical": 2, "3d": 3}


class Component:
    def __init__(self, j):
        if not isinstance(j, dict):
            raise ModelError("component is not an object")
        self.extent = SpatialExtent(_obj(j, "extent"))
        self.displacement_type = _req_str(j, "displacement_type")
        if self.displacement_type not in _DISPLACEMENT:
            raise ModelError("Unsupported value for displacement_type")
        self.displacement = _DISPLACEMENT[self.displacement_type]
        _req_str(j, "uncertainty_type")
        sm = _obj(j, "spatial_model")
        _req_str(sm, "type")
        self.interpolation_method = _req_str(sm, "interpolation_method")
        if self.interpolation_method not in ("bilinear", "geocentric_bilinear"):
            raise ModelError("Unsupported value for interpolation_method")
        self.filename = _req_str(sm, "filename")
        tf = _obj(j, "time_function")
        tftype = _req_str(tf, "type")
        pp = _obj(tf, "parameters") if tftype != "constant" else {}
        if tftype == "constant":
            self.time_function: TimeFunction = ConstantTF()
        elif tftype == "velocity":
            self.time_function = VelocityTF(
                iso8601_to_decimal_year(_req_str(pp, "reference_epoch")))
        elif tftype == "step":
            self.time_function = StepTF(
                iso8601_to_decimal_year(_req_str(pp, "step_epoch")))
        elif tftype == "reverse_step":
            self.time_function = ReverseStepTF(
                iso8601_to_decimal_year(_req_str(pp, "step_epoch")))
        elif tftype == "piecewise":
            model = pp.get("model")
            if not isinstance(model, list):
                raise ModelError('The value of "model" should be a array')
            tuples = []
            for elt in model:
                if not isinstance(elt, dict):
                    raise ModelError("model[] element is not an object")
                tuples.append((
                    iso8601_to_decimal_year(_req_str(elt, "epoch")),
                    _req_num(elt, "scale_factor"),
                ))
            self.time_function = PiecewiseTF(
                _req_str(pp, "before_first"), _req_str(pp, "after_last"), tuples)
        elif tftype == "exponential":
            end = _opt_str(pp, "end_epoch")
            self.time_function = ExponentialTF(
                iso8601_to_decimal_year(_req_str(pp, "reference_epoch")),
                iso8601_to_decimal_year(end) if end else None,
                _req_num(pp, "relaxation_constant"),
                _req_num(pp, "before_scale_factor"),
                _req_num(pp, "initial_scale_factor"),
                _req_num(pp, "final_scale_factor"),
            )
        else:
            raise ModelError(f"Unsupported type of time function: {tftype}")
        # runtime cache, filled lazily per worker
        self._gridsets = None
        self._sample_idx: dict = {}

    def gridsets(self):
        if self._gridsets is None:
            self._gridsets = [open_generic_set(self.filename)]
        return self._gridsets


_GEOGRAPHIC_EPSG = {"4326", "4258", "4269", "4267", "4283", "4167", "4either",
                    "4759", "4959", "9000", "4979"}


def _is_geographic_crs(crs: str, extent: SpatialExtent) -> bool:
    """The reference resolves the CRS via its EPSG database
    (defmodel.cpp:270-283, default true when unresolvable). Without a
    database: known geographic codes, else a degree-range bbox check."""
    up = crs.upper()
    if up in ("OGC:CRS84", "EPSG:4326"):
        return True
    if up.startswith("EPSG:") and up.split(":")[1] in _GEOGRAPHIC_EPSG:
        return True
    return (-360.0 <= extent.minx <= 360.0 and -360.0 <= extent.maxx <= 360.0
            and -90.0 <= extent.miny <= 90.0 and -90.0 <= extent.maxy <= 90.0)


class DefModel:
    def __init__(self, text: str, a: float, b: float):
        try:
            j = json.loads(text)
        except Exception as e:
            raise ModelError(str(e)) from None
        if not isinstance(j, dict):
            raise ModelError("Not an object")
        _req_str(j, "file_type")
        _req_str(j, "format_version")
        self.source_crs = _req_str(j, "source_crs")
        _req_str(j, "target_crs")
        self.definition_crs = _req_str(j, "definition_crs")
        if self.source_crs != self.definition_crs:
            raise ModelError("source_crs != definition_crs not currently supported")
        self.horizontal_offset_unit = _opt_str(j, "horizontal_offset_unit")
        if self.horizontal_offset_unit not in ("", "metre", "degree"):
            raise ModelError("Unsupported value for horizontal_offset_unit")
        if _opt_str(j, "vertical_offset_unit") not in ("", "metre"):
            raise ModelError("Unsupported value for vertical_offset_unit")
        self.horizontal_offset_method = _opt_str(j, "horizontal_offset_method")
        if self.horizontal_offset_method not in ("", "addition", "geocentric"):
            raise ModelError("Unsupported value for horizontal_offset_method")
        self.extent = SpatialExtent(_obj(j, "extent"))
        te = _obj(j, "time_extent")
        self.time_first = iso8601_to_decimal_year(_req_str(te, "first"))
        self.time_last = iso8601_to_decimal_year(_req_str(te, "last"))
        comps = j.get("components")
        if not isinstance(comps, list):
            raise ModelError('The value of "components" should be a array')
        self.components = [Component(c) for c in comps]
        for comp in self.components:
            if comp.displacement_type in ("horizontal", "3d"):
                if not self.horizontal_offset_unit:
                    raise ModelError("horizontal_offset_unit should be defined")
                if not self.horizontal_offset_method:
                    raise ModelError("horizontal_offset_method should be defined")
            if comp.displacement_type in ("vertical", "3d"):
                if not _opt_str(j, "vertical_offset_unit"):
                    raise ModelError("vertical_offset_unit should be defined")
            if (self.horizontal_offset_unit == "degree"
                    and comp.interpolation_method != "bilinear"):
                raise ModelError("degree unit requires bilinear interpolation")
        if (self.horizontal_offset_unit == "degree"
                and self.horizontal_offset_method not in ("", "addition")):
            raise ModelError("degree unit requires addition method")

        self.a = a
        self.b = b
        self.es = 1.0 - (b * b) / (a * a)
        self.is_degree = self.horizontal_offset_unit == "degree"
        self.is_addition = self.horizontal_offset_method == "addition"
        self.is_geographic = _is_geographic_crs(self.definition_crs, self.extent)
        if not self.is_geographic and self.is_degree:
            raise ModelError("projected definition_crs incompatible with degree unit")
        if not self.is_geographic and not self.is_addition:
            raise ModelError("projected definition_crs incompatible with geocentric method")
        if not self.is_geographic:
            for comp in self.components:
                if comp.interpolation_method != "bilinear":
                    raise ModelError(
                        "projected definition_crs incompatible with geocentric_bilinear")

    # -- sample-channel resolution (defmodel.cpp Grid::checkHorizontal /
    #    getZOffset) ---------------------------------------------------

    def _channels(self, grid: GGrid, vertical_only: bool):
        n = len(grid.samples)
        ix, iy, iz = 0, 1, 2
        if n == 1:
            iz = 0
        found_any = any(d for d in grid.descs)
        fx = fy = fz = False
        for i, d in enumerate(grid.descs):
            if d == "east_offset":
                ix, fx = i, True
            elif d == "north_offset":
                iy, fy = i, True
            elif d == "vertical_offset":
                iz, fz = i, True
        if vertical_only:
            if found_any and not fz:
                raise ModelError(f"{grid.name}: missing vertical_offset channel")
        else:
            if n < 2:
                raise ModelError(f"{grid.name}: not enough samples")
            if found_any and not (fx or fy):
                raise ModelError(f"{grid.name}: missing offset channels")
            expected = "degree" if self.is_degree else "metre"
            unit = grid.units[ix]
            if unit and unit != expected:
                raise ModelError(f"{grid.name}: only unit={expected} handled")
        if iz < n:
            unit = grid.units[iz]
            if unit and unit != "metre":
                raise ModelError(f"{grid.name}: only unit=metre handled for z")
        return ix, iy, iz

    # -- forward / inverse (defmodel_impl.hpp:820-1260) ----------------

    def forward(self, x, y, z, t, for_inverse=False):
        """Vectorized Evaluator::forward. Returns (x', y', z', ok)."""
        EPS = 1e-10 if self.is_geographic else 1e-5
        x = np.asarray(x, dtype=np.float64).copy()
        y = np.asarray(y, dtype=np.float64).copy()
        # outputs anchor to the ORIGINAL coordinates (x_out = x before any
        # wrap/clamp, defmodel_impl.hpp:828-830); wrapped/clamped values
        # are only for extent checks and grid lookups
        x_orig = x.copy()
        y_orig = y.copy()
        ok = np.isfinite(x) & np.isfinite(y)

        minx, miny, maxx, maxy = self.extent.normalized(self.is_geographic)
        if self.is_geographic:
            n_up = np.maximum(np.ceil((minx - EPS - x) / M_TWOPI), 0.0)
            x = x + n_up * M_TWOPI
            n_dn = np.maximum(np.ceil((x - maxx - EPS) / M_TWOPI), 0.0)
            x = x - n_dn * M_TWOPI
        margin = (0.1 * DEG_TO_RAD if self.is_geographic else 10000.0) \
            if for_inverse else 0.0
        x, y, inside = _bbox_check(x, y, minx, miny, maxx, maxy, EPS, margin)
        ok &= inside
        ok &= (t >= self.time_first) & (t <= self.time_last)

        dlam = np.zeros_like(x)
        dphi = np.zeros_like(x)
        de = np.zeros_like(x)
        dn = np.zeros_like(x)
        dz = np.zeros_like(x)
        sinphi = np.sin(y) if self.is_geographic else None
        cosphi = np.cos(y) if self.is_geographic else None

        for comp in self.components:
            if comp.displacement == 0:
                continue
            cminx, cminy, cmaxx, cmaxy = comp.extent.normalized(self.is_geographic)
            xg, yg, inside_c = _bbox_check(x, y, cminx, cminy, cmaxx, cmaxy, EPS, 0.0)
            xg = np.clip(xg, cminx, cmaxx)
            yg = np.clip(yg, cminy, cmaxy)
            tfactor = comp.time_function.evaluate(np.asarray(t, dtype=np.float64))
            lanes = ok & inside_c & (tfactor != 0.0)
            if not np.any(lanes):
                continue
            try:
                gsets = comp.gridsets()
            except Exception:
                # iface.open failure fails the point evaluation, it does
                # not throw (defmodel_impl.hpp:931-934 gridSet == nullptr
                # -> return false -> proj_coord_error)
                ok &= ~lanes
                continue
            leaf_ids, leaves = assign_grids(gsets, xg, yg)
            for gid, grid in enumerate(leaves):
                mask = lanes & (leaf_ids == gid)
                if not np.any(mask):
                    continue
                if grid.width < 2 or grid.height < 2:
                    ok &= ~mask
                    continue
                ix_d = (xg[mask] - grid.west) / grid.res_x
                iy_d = (yg[mask] - grid.south) / grid.res_y
                in_grid = ((ix_d >= -EPS) & (iy_d >= -EPS)
                           & (ix_d + 1 < grid.width + EPS)
                           & (iy_d + 1 < grid.height + EPS))
                ix0 = np.minimum(ix_d.astype(np.int64), grid.width - 2)
                iy0 = np.minimum(iy_d.astype(np.int64), grid.height - 2)
                fx_ = ix_d - ix0
                fy_ = iy_d - iy0
                m00 = (1 - fx_) * (1 - fy_)
                m10 = fx_ * (1 - fy_)
                m01 = (1 - fx_) * fy_
                m11 = fx_ * fy_
                tfac = tfactor[mask]
                sub = np.flatnonzero(mask)[in_grid]
                if len(sub) == 0:
                    continue
                sel = in_grid
                ix0, iy0 = ix0[sel], iy0[sel]
                m00, m10, m01, m11 = m00[sel], m10[sel], m01[sel], m11[sel]
                fx_ = fx_[sel]
                tfac = tfac[sel]
                ci = self._channels(grid, comp.displacement == 2)
                if comp.displacement in (2, 3):  # vertical or 3d
                    s = grid.samples[ci[2]]
                    dzi = (m00 * s[iy0, ix0] + m10 * s[iy0, ix0 + 1]
                           + m01 * s[iy0 + 1, ix0] + m11 * s[iy0 + 1, ix0 + 1])
                    dz[sub] += tfac * dzi
                if comp.displacement in (1, 3):  # horizontal or 3d
                    sx = grid.samples[ci[0]]
                    sy = grid.samples[ci[1]]
                    e00 = sx[iy0, ix0].astype(np.float64)
                    e10 = sx[iy0, ix0 + 1].astype(np.float64)
                    e01 = sx[iy0 + 1, ix0].astype(np.float64)
                    e11 = sx[iy0 + 1, ix0 + 1].astype(np.float64)
                    n00 = sy[iy0, ix0].astype(np.float64)
                    n10 = sy[iy0, ix0 + 1].astype(np.float64)
                    n01 = sy[iy0 + 1, ix0].astype(np.float64)
                    n11 = sy[iy0 + 1, ix0 + 1].astype(np.float64)
                    if self.is_degree:
                        dli = (m00 * e00 + m01 * e01 + m10 * e10 + m11 * e11)
                        dpi = (m00 * n00 + m01 * n01 + m10 * n10 + m11 * n11)
                        dlam[sub] += tfac * dli * DEG_TO_RAD
                        dphi[sub] += tfac * dpi * DEG_TO_RAD
                    elif comp.interpolation_method == "bilinear":
                        dei = (m00 * e00 + m01 * e01 + m10 * e10 + m11 * e11)
                        dni = (m00 * n00 + m01 * n01 + m10 * n10 + m11 * n11)
                        de[sub] += tfac * dei
                        dn[sub] += tfac * dni
                    else:  # geocentric_bilinear (GridEx, defmodel_impl.hpp:96-170)
                        dei, dni = _geocentric_bilinear(
                            grid, iy0, ix0, fx_, e00, n00, e01, n01, e10, n10,
                            e11, n11, m00, m01, m10, m11,
                            sinphi[sub], cosphi[sub])
                        de[sub] += tfac * dei
                        dn[sub] += tfac * dni

        x_out = np.where(ok, x_orig, np.nan)
        y_out = np.where(ok, y_orig, np.nan)
        if self.is_degree:
            x_out = x_out + dlam
            y_out = y_out + dphi
        elif not self.is_geographic:
            x_out = x_out + de
            y_out = y_out + dn
        elif self.is_addition:
            # DeltaEastingNorthingToLongLat (defmodel_impl.hpp:713-726)
            one_minu_x = self.es * (1.0 - cosphi * cosphi)
            Xv = 1.0 - one_minu_x
            sqrt_x = np.sqrt(Xv)
            with np.errstate(divide="ignore", invalid="ignore"):
                x_out = x_out + de * sqrt_x / (self.a * cosphi)
            y_out = y_out + dn * self.a * sqrt_x * Xv / (self.b * self.b)
        else:
            # geocentric addition via cart roundtrip
            sinlam = np.sin(x)
            coslam = np.cos(x)
            dns = dn * sinphi
            dX = -de * sinlam - dns * coslam
            dY = de * coslam - dns * sinlam
            dZ = dn * cosphi
            from ..ops.cart import Cart
            from ..core.op import Coords

            shim = _EllShim(self.a, self.b, self.es)
            geo = Coords(x.copy(), y.copy(), np.zeros_like(x))
            Cart._fwd(shim, geo)
            geo.x = geo.x + dX
            geo.y = geo.y + dY
            geo.z = geo.z + dZ
            Cart._inv(shim, geo)
            x_out = np.where(ok, geo.x, np.nan)
            y_out = np.where(ok, geo.y, np.nan)
        z_in = np.asarray(z, dtype=np.float64)
        z_out = np.where(ok, z_in + dz, np.nan)
        return x_out, y_out, z_out, ok

    def inverse(self, x, y, z, t):
        """Vectorized Evaluator::inverse (fixed-point, ≤10 iterations)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        z = np.asarray(z, dtype=np.float64)
        x_out, y_out, z_out = x.copy(), y.copy(), z.copy()
        ok = np.isfinite(x) & np.isfinite(y)
        done = np.zeros_like(ok)
        for _ in range(10):
            act = ok & ~done
            if not np.any(act):
                break
            xn, yn, zn, fok = self.forward(x_out, y_out, z_out, t, for_inverse=True)
            ok &= fok | done
            dx = xn - x
            dy = yn - y
            dzv = zn - z
            upd = ok & ~done
            x_out = np.where(upd, x_out - dx, x_out)
            y_out = np.where(upd, y_out - dy, y_out)
            z_out = np.where(upd, z_out - dzv, z_out)
            done = done | (upd & (np.maximum(np.abs(dx), np.abs(dy)) < 1e-12)
                           & (np.abs(dzv) < 1e-3))
        ok &= done
        return (np.where(ok, x_out, np.nan), np.where(ok, y_out, np.nan),
                np.where(ok, z_out, np.nan), ok)


class _EllShim:
    def __init__(self, a, b, es):
        class E:
            pass

        self.ell = E()
        self.ell.a = a
        self.ell.b = b
        self.ell.es = es
        self.ell.e = float(np.sqrt(es))
        self.ell.one_es = 1.0 - es
        self.ell.e2s = es / (1.0 - es)


def _bbox_check(x, y, minx, miny, maxx, maxy, eps, margin):
    """bboxCheck (defmodel_impl.hpp:786-818): inside test with EPS; with a
    margin (inverse iteration) slightly-outside points clamp to the edge."""
    inside_x = (x >= minx - eps) & (x <= maxx + eps)
    inside_y = (y >= miny - eps) & (y <= maxy + eps)
    if margin > 0.0:
        snap_lo_x = (~inside_x) & (x > minx - margin) & (x < minx)
        snap_hi_x = (~inside_x) & (x < maxx + margin) & (x > maxx)
        x = np.where(snap_lo_x, minx, np.where(snap_hi_x, maxx, x))
        inside_x |= snap_lo_x | snap_hi_x
        snap_lo_y = (~inside_y) & (y > miny - margin) & (y < miny)
        snap_hi_y = (~inside_y) & (y < maxy + margin) & (y > maxy)
        y = np.where(snap_lo_y, miny, np.where(snap_hi_y, maxy, y))
        inside_y |= snap_lo_y | snap_hi_y
    return x, y, inside_x & inside_y


def _geocentric_bilinear(grid, iy0, ix0, frct_x, e00, n00, e01, n01, e10, n10,
                         e11, n11, m00, m01, m10, m11, sinphi, cosphi):
    """GridEx::getBilinearGeocentric + the back-conversion to easting /
    northing deltas (defmodel_impl.hpp:96-170, 1100-1146), vectorized."""
    sinhalfresx = np.sin(grid.res_x / 2)
    coshalfresx = np.cos(grid.res_x / 2)
    sinresy = np.sin(grid.res_y)
    cosresy = np.cos(grid.res_y)
    y0 = grid.south + iy0 * grid.res_y
    sinphi0 = np.sin(y0)
    cosphi0 = np.cos(y0)
    sinphi1 = sinphi0 * cosresy + cosphi0 * sinresy
    cosphi1 = cosphi0 * cosresy - sinphi0 * sinresy

    def enu_to_xyz(dev, dnv, sp, cp, sl, cl):
        dns = dnv * sp
        return (-dev * sl - dns * cl, dev * cl - dns * sl, dnv * cp)

    dX00, dY00, dZ00 = enu_to_xyz(e00, n00, sinphi0, cosphi0, -sinhalfresx, coshalfresx)
    dX01, dY01, dZ01 = enu_to_xyz(e01, n01, sinphi1, cosphi1, -sinhalfresx, coshalfresx)
    dX10, dY10, dZ10 = enu_to_xyz(e10, n10, sinphi0, cosphi0, sinhalfresx, coshalfresx)
    dX11, dY11, dZ11 = enu_to_xyz(e11, n11, sinphi1, cosphi1, sinhalfresx, coshalfresx)
    dX = m00 * dX00 + m01 * dX01 + m10 * dX10 + m11 * dX11
    dY = m00 * dY00 + m01 * dY01 + m10 * dY10 + m11 * dY11
    dZ = m00 * dZ00 + m01 * dZ01 + m10 * dZ10 + m11 * dZ11
    lrel = (frct_x - 0.5) * grid.res_x
    if grid.res_x < DEG_TO_RAD:
        sinlam = lrel * (1.0 - (1.0 / 6) * (lrel * lrel))
        coslam = 1.0 - 0.5 * (lrel * lrel)
    else:
        sinlam = np.sin(lrel)
        coslam = np.cos(lrel)
    de = -dX * sinlam + dY * coslam
    dn = (-dX * coslam - dY * sinlam) * sinphi + dZ * cosphi
    return de, dn


def load_defmodel(path: str, a: float, b: float) -> DefModel:
    with open(path, "rb") as f:
        data = f.read()
    if len(data) > 10 * 1024 * 1024:
        raise ModelError("file too large")
    return DefModel(data.decode("utf-8", errors="replace"), a, b)
