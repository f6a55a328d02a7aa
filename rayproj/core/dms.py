"""DMS (degree-minute-second) string parsing.

Re-derivation of the reference's ``dmstor`` semantics
(/root/reference/src/dmstor.cpp): accepts plain decimal degrees,
``12d34'56.7"``-style sexagesimal, an ``r`` suffix for radians, and an
optional N/E/S/W postfix sign. Returns radians.
"""

from __future__ import annotations

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
            v += tv * _VM[min(level, 2)] if level else tv * _VM[0]
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
