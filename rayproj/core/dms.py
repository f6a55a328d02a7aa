"""DMS (degree-minute-second) string parsing.

Re-derivation of the reference's ``dmstor`` semantics
(/root/reference/src/dmstor.cpp): accepts plain decimal degrees,
``12d34'56.7"``-style sexagesimal, an ``r`` suffix for radians, and an
optional N/E/S/W postfix sign. Returns radians.
"""

from __future__ import annotations

import math
import re

from .constants import DEG_TO_RAD
from .errors import ERR_WRONG_FORMAT_DMS_VALUE, ProjError

# multipliers for degree / minute / second fields
_VM = (DEG_TO_RAD, DEG_TO_RAD / 60.0, DEG_TO_RAD / 3600.0)
# must contain at least one DIGIT: a bare "." (or "...") is "no
# conversion" in the reference's strtod-based dmstor, i.e. an error,
# not float('.')'s ValueError
_NUM = re.compile(r"(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][-+]?[0-9]+)?")


def dms_to_rad(text: str) -> float:
    """Parse a DMS/decimal-degree string to radians."""
    s = text.strip()
    if not s:
        raise ProjError(ERR_WRONG_FORMAT_DMS_VALUE, text)
    sign = 1.0
    i = 0
    if s[0] in "+-":
        sign = -1.0 if s[0] == "-" else 1.0
        i = 1
    v = 0.0
    level = 0  # 0=deg, 1=min, 2=sec
    while level < 3 and i < len(s):
        m = _NUM.match(s, i)
        if not m:
            break
        tv = float(m.group(0))
        i = m.end()
        c = s[i] if i < len(s) else "\0"
        if c in "Dd":
            n = 0
        elif c == "'":
            n = 1
        elif c == '"':
            n = 2
        elif c in "rR":
            if level:
                raise ProjError(ERR_WRONG_FORMAT_DMS_VALUE, text)
            i += 1
            v = tv  # radians verbatim
            break
        else:
            # bare number: interpret at the current field level
            v += tv * _VM[level]
            break
        if n < level:
            raise ProjError(ERR_WRONG_FORMAT_DMS_VALUE, text)
        v += tv * _VM[n]
        i += 1
        level = n + 1
    # postfix hemisphere sign
    if i < len(s) and s[i] in "NnEeSsWw":
        sign = -1.0 if s[i] in "SsWw" else 1.0
        i += 1
    return sign * v


# C-strtod prefix: optional whitespace/sign, digits with optional
# fraction and exponent. Must contain at least one digit (a bare "."
# or "+" is "no conversion").
_STRTOD = re.compile(
    r"[ \t\r\n\v\f]*[-+]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][-+]?[0-9]+)?"
)


def strtod_prefix(s: str, i: int = 0) -> tuple[float, int]:
    """C ``strtod`` over ``s[i:]``: skip leading whitespace, parse one
    decimal float, return ``(value, end_index)``. No conversion returns
    ``(0.0, i)`` (endptr == nptr), exactly like the C library call the
    reference apps lean on (src/apps/proj.cpp:523, cs2cs.cpp:630)."""
    m = _STRTOD.match(s, i)
    if not m:
        return 0.0, i
    return float(m.group(0)), m.end()


def dmstor_prefix(s: str, i: int = 0) -> tuple[float, int]:
    """Prefix-consuming ``dmstor`` (src/dmstor.cpp:28-98): parse a
    DMS / decimal-degree / ``<x>r`` radian token starting at ``s[i]``
    and return ``(radians, end_index)``. A malformed sexagesimal field
    order returns ``(inf, i)`` — the reference's ``HUGE_VAL`` error
    lane, which the CLI apps turn into the ``-e`` error line."""
    n = len(s)
    j = i
    while j < n and s[j].isspace():
        j += 1
    # the reference copies at most 63 "graph" chars into a work buffer
    k = j
    while k < n and s[k].isprintable() and not s[k].isspace() and k - j < 63:
        k += 1
    work = s[j:k]
    p = 0
    sign = 1.0
    if p < len(work) and work[p] in "+-":
        sign = -1.0 if work[p] == "-" else 1.0
        p += 1
    v = 0.0
    nl = 0
    while nl < 3:
        if p >= len(work) or not (work[p].isdigit() or work[p] == "."):
            break
        m = _NUM.match(work, p)
        if not m:
            break
        tv = float(m.group(0))
        if math.isinf(tv):
            # numeric overflow: the reference's proj_strtod returns
            # HUGE_VAL and dmstor propagates it immediately, before
            # sign application, with endptr left at the start
            # (dmstor.cpp:53-54) — never -inf
            return tv, i
        p = m.end()
        c = work[p] if p < len(work) else "\0"
        if c in "Dd":
            fld = 0
        elif c == "'":
            fld = 1
        elif c == '"':
            fld = 2
        elif c in "rR":
            if nl:
                return float("inf"), i
            p += 1
            v = tv  # radians verbatim
            break
        else:
            v += tv * _VM[nl]
            break
        if fld < nl:
            return float("inf"), i
        v += tv * _VM[fld]
        p += 1
        nl = fld + 1
    # postfix hemisphere sign overrides any leading sign
    if p < len(work) and work[p] in "NnEeSsWw":
        sign = -1.0 if work[p] in "SsWw" else 1.0
        p += 1
    return sign * v, j + p


def rtodms(r: float, pos: str, neg: str, fract: int = 3,
           fixed_width: bool = False) -> str:
    """Radians → DMS string, mirroring the reference's ``rtodms``
    (src/rtodms.cpp:43-87): round to ``fract`` fractional second
    digits, drop zero-valued trailing fields (``12d30'E``, ``12dE``),
    strip trailing zeros off the seconds fraction, and append the
    ``pos``/``neg`` hemisphere letter (falsy ``pos`` emits a leading
    ``-`` instead). ``fixed_width`` is the ``-W`` constant-width form:
    zero-padded minutes and seconds, no field dropping. Total
    function: non-finite input formats as ``inf``/``nan`` text rather
    than raising (the C version's printf prints garbage but never
    aborts).

    Known deliberate deviation: at ``fract=0`` the C zero-strip loop
    (rtodms.cpp:64-81) has no decimal-point guard and eats significant
    trailing zeros off integer seconds (``12d0'10"E`` prints as
    ``12d0'1"E``) — a data-corrupting formatter bug we do not
    reproduce; our output keeps the full integer seconds."""
    if not math.isfinite(r):
        return "%g" % r
    res = 10.0 ** fract
    conv = 180.0 * 3600.0 * res / math.pi
    lead = ""
    if r < 0:
        r = -r
        if not pos:
            lead, sign = "-", ""
        else:
            sign = neg
    else:
        sign = pos
    r = math.floor(r * conv + 0.5)
    sec = math.fmod(r / res, 60.0)
    r = math.floor(r / (res * 60.0))
    mn = int(math.fmod(r, 60.0))
    deg = int(math.floor(r / 60.0))
    if fixed_width:
        w = fract + 2 + (1 if fract else 0)
        return f"{lead}{deg}d{mn:02d}'{sec:0{w}.{fract}f}\"{sign}"
    if sec != 0.0:
        sec_str = f"{sec:.{fract}f}"
        if "." in sec_str:
            sec_str = sec_str.rstrip("0").rstrip(".")
        return f"{lead}{deg}d{mn}'{sec_str}\"{sign}"
    if mn:
        return f"{lead}{deg}d{mn}'{sign}"
    return f"{lead}{deg}d{sign}"
