"""Unit conversion: linear, angular and time units.

Semantics per /root/reference/src/conversions/unitconvert.cpp:
xy/z factors from the linear (units.cpp:14-36) and angular
(units.cpp:52-57) tables or numeric values; io units become
radians/degrees when an angular name is used (:480-503); time units
mjd/decimalyear/gps_week/yyyymmdd (:141-270) vectorized as calendar
math over whole arrays.
"""

from __future__ import annotations

import numpy as np

from ..core.constants import DEG_TO_RAD
from ..core.errors import ERR_INCONSISTENT_UNIT, ERR_UNKNOWN_UNIT_ID, ProjError
from ..core.op import IO_DEGREES, IO_RADIANS, IO_WHATEVER, Coords, Operation
from ..core.units import ANGULAR_UNITS, LINEAR_UNITS
from . import register

TIME_UNITS = ("mjd", "decimalyear", "gps_week", "yyyymmdd")


def _is_leap(year):
    return ((year % 4 == 0) & (year % 100 != 0)) | (year % 400 == 0)


def _days_in_year(year):
    return np.where(_is_leap(year), 366, 365)


_MONTH_DAYS = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])
_CUM_DAYS = np.concatenate([[0], np.cumsum(_MONTH_DAYS)])


def decimalyear_to_mjd(dy):
    dy = np.asarray(dy, dtype=np.float64)
    valid = (dy >= -10000) & (dy <= 10000)
    dy0 = np.where(valid, dy, 0.0)
    year = np.floor(dy0).astype(np.int64)
    frac = dy0 - year
    mjd = (year - 1859) * 365 + 14 + 31
    mjd = mjd + frac * _days_in_year(year)
    # leap days between 1859 and year-1 inclusive
    y1 = year - 1
    def _leaps_upto(y):
        # number of leap years in [1,y]
        return y // 4 - y // 100 + y // 400
    leaps = np.where(y1 >= 1858, _leaps_upto(y1) - _leaps_upto(np.int64(1858)), 0)
    mjd = mjd + leaps
    return np.where(valid, mjd, 0.0)


def mjd_to_decimalyear(mjd):
    mjd = np.asarray(mjd, dtype=np.float64)
    # year such that cumulative days (from 1859-01-01 == mjd 45) <= mjd
    # brute-force mirror of the reference (:186-200), vectorized via search
    years = np.arange(1859, 3000)
    cum = np.concatenate([[0], np.cumsum(np.where(_is_leap(years), 366, 365))]) + 14 + 31
    idx = np.searchsorted(cum, mjd, side="right") - 1
    idx = np.clip(idx, 0, len(years) - 1)
    year = years[idx]
    start = cum[idx]
    return year + (mjd - start) / _days_in_year(year)


def gps_week_to_mjd(w):
    return 44244.0 + np.asarray(w, dtype=np.float64) * 7.0


def mjd_to_gps_week(mjd):
    return (np.asarray(mjd, dtype=np.float64) - 44244.0) / 7.0


def _daynumber_in_year(year, month, day):
    month = np.clip(month, 1, 12)
    dim = _MONTH_DAYS[month - 1] + ((month == 2) & _is_leap(year))
    day = np.minimum(day, dim)
    base = _CUM_DAYS[month - 1] + ((month > 2) & _is_leap(year))
    return base + day


def yyyymmdd_to_mjd(v):
    v = np.asarray(v, dtype=np.float64)
    year = np.floor(v / 10000).astype(np.int64)
    month = np.floor((v - year * 10000) / 100).astype(np.int64)
    day = np.floor(v - year * 10000 - month * 100).astype(np.int64)
    mjd = _daynumber_in_year(year, month, day).astype(np.float64)
    y1 = year - 1
    def _leaps_upto(y):
        return y // 4 - y // 100 + y // 400
    ordinary = (y1 - 1858) * 365
    leaps = np.where(y1 >= 1858, _leaps_upto(y1) - _leaps_upto(np.int64(1858)), 0)
    mjd = mjd + np.where(y1 >= 1858, ordinary + leaps, 0)
    return mjd + 13 + 31


def mjd_to_yyyymmdd(mjd):
    mjd = np.asarray(mjd, dtype=np.float64)
    years = np.arange(1859, 3000)
    cum = np.concatenate([[0], np.cumsum(np.where(_is_leap(years), 366, 365))]) + 14 + 31
    idx = np.searchsorted(cum, mjd, side="right") - 1
    idx = np.clip(idx, 0, len(years) - 1)
    year = years[idx]
    rem = mjd - cum[idx]  # days since Jan 1 of `year`, 0-based fractional
    leap = _is_leap(year)
    acc = np.zeros_like(np.asarray(rem, dtype=np.float64))
    out_month = np.ones(acc.shape, dtype=np.int64)
    # the reference's month loop stops at the first month that does not
    # fit — a lane that failed month m must not consume a later shorter
    # month (Jan 31: February's 28 days would otherwise "fit" rem=30)
    active = np.ones(acc.shape, dtype=bool)
    for m in range(1, 13):
        dim = _MONTH_DAYS[m - 1] + ((m == 2) & leap)
        step = active & (acc + dim <= rem)
        acc = np.where(step, acc + dim, acc)
        out_month = np.where(step, m + 1, out_month)
        active &= step
    day = (rem - acc + 1).astype(np.int64)
    return year * 10000.0 + out_month * 100.0 + day


_T_IN = {
    "mjd": lambda v: np.asarray(v, dtype=np.float64),
    "decimalyear": decimalyear_to_mjd,
    "gps_week": gps_week_to_mjd,
    "yyyymmdd": yyyymmdd_to_mjd,
}
_T_OUT = {
    "mjd": lambda v: np.asarray(v, dtype=np.float64),
    "decimalyear": mjd_to_decimalyear,
    "gps_week": mjd_to_gps_week,
    "yyyymmdd": mjd_to_yyyymmdd,
}


def _factor(name: str):
    """Return (factor, kind) where kind ∈ {'linear','angular',None}."""
    if name in LINEAR_UNITS:
        return LINEAR_UNITS[name], "linear"
    if name in ANGULAR_UNITS:
        return ANGULAR_UNITS[name], "angular"
    return None, None


@register
class UnitConvert(Operation):
    name = "unitconvert"
    need_ellps = False

    def setup(self) -> None:
        p = self.params
        self.left = IO_WHATEVER
        self.right = IO_WHATEVER
        self.skip_fwd_prepare = True
        self.skip_inv_prepare = True
        self.xy_factor = 1.0
        self.z_factor = 1.0
        self.t_in = None
        self.t_out = None

        def resolve(key: str):
            name = p.str_(key)
            if name is None:
                return None, None
            f, kind = _factor(name)
            if f is None:
                try:
                    f = float(name)
                except ValueError:
                    raise ProjError(ERR_UNKNOWN_UNIT_ID, name) from None
                if f == 0.0 or 1.0 / f == 0.0:
                    raise ProjError(ERR_UNKNOWN_UNIT_ID, name)
            return f, (kind, name)

        f, meta = resolve("xy_in")
        xy_in_kind = None
        if f is not None:
            self.xy_factor = f
            xy_in_kind = meta[0]
            if meta[1] == "rad":
                self.left = IO_RADIANS
            elif meta[1] == "deg":
                self.left = IO_DEGREES
        f, meta = resolve("xy_out")
        xy_out_kind = None
        if f is not None:
            self.xy_factor /= f
            xy_out_kind = meta[0]
            if meta[1] == "rad":
                self.right = IO_RADIANS
            elif meta[1] == "deg":
                self.right = IO_DEGREES
        if xy_in_kind and xy_out_kind and xy_in_kind != xy_out_kind:
            raise ProjError(ERR_INCONSISTENT_UNIT, "xy")

        f, meta = resolve("z_in")
        z_in_kind = None
        if f is not None:
            self.z_factor = f
            z_in_kind = meta[0]
        f, meta = resolve("z_out")
        z_out_kind = None
        if f is not None:
            self.z_factor /= f
            z_out_kind = meta[0]
        if z_in_kind and z_out_kind and z_in_kind != z_out_kind:
            raise ProjError(ERR_INCONSISTENT_UNIT, "z")

        for key, attr in (("t_in", "t_in"), ("t_out", "t_out")):
            name = p.str_(key)
            if name is not None:
                if name not in TIME_UNITS:
                    raise ProjError(ERR_UNKNOWN_UNIT_ID, name)
                setattr(self, attr, name)

    def _fwd(self, coo: Coords) -> None:
        coo.x = coo.x * self.xy_factor
        coo.y = coo.y * self.xy_factor
        coo.z = coo.z * self.z_factor
        t = coo.t
        if self.t_in is not None:
            t = _T_IN[self.t_in](t)
        if self.t_out is not None:
            t = _T_OUT[self.t_out](t)
        coo.t = np.asarray(t, dtype=np.float64)

    def _inv(self, coo: Coords) -> None:
        coo.x = coo.x / self.xy_factor
        coo.y = coo.y / self.xy_factor
        coo.z = coo.z / self.z_factor
        t = coo.t
        if self.t_out is not None:
            t = _T_IN[self.t_out](t)
        if self.t_in is not None:
            t = _T_OUT[self.t_in](t)
        coo.t = np.asarray(t, dtype=np.float64)


DEG_FACTOR = DEG_TO_RAD
