"""Linear and angular unit tables.

Transcribed from the reference's built-in tables
(/root/reference/src/units.cpp:14-57). ``to_meter`` strings may be
ratios like ``1/1000`` (init.cpp:744-760 parsing semantics).
"""

from __future__ import annotations

from .constants import DEG_TO_RAD
from .errors import ERR_UNIT_FACTOR_LESS_THAN_0, ERR_UNKNOWN_UNIT_ID, ProjError

GRAD_TO_RAD = 0.015707963267948967

LINEAR_UNITS: dict[str, float] = {
    "km": 1000.0,
    "m": 1.0,
    "dm": 0.1,
    "cm": 0.01,
    "mm": 0.001,
    "kmi": 1852.0,
    "in": 0.0254,
    "ft": 0.3048,
    "yd": 0.9144,
    "mi": 1609.344,
    "fath": 1.8288,
    "ch": 20.1168,
    "link": 0.201168,
    "us-in": 100 / 3937.0,
    "us-ft": 1200 / 3937.0,
    "us-yd": 3600 / 3937.0,
    "us-ch": 79200 / 3937.0,
    "us-mi": 6336000 / 3937.0,
    "ind-yd": 0.91439523,
    "ind-ft": 0.30479841,
    "ind-ch": 20.11669506,
}

ANGULAR_UNITS: dict[str, float] = {
    "rad": 1.0,
    "deg": DEG_TO_RAD,
    "grad": GRAD_TO_RAD,
}


def parse_to_meter(s: str) -> float:
    """Parse a to_meter value, allowing 'num/denom' ratio notation."""
    if "/" in s:
        num, denom = s.split("/", 1)
        d = float(denom)
        if d == 0.0:
            raise ProjError(ERR_UNIT_FACTOR_LESS_THAN_0)
        v = float(num) / d
    else:
        v = float(s)
    if v <= 0.0:
        raise ProjError(ERR_UNIT_FACTOR_LESS_THAN_0)
    return v


def linear_unit_to_meter(name: str) -> float:
    try:
        return LINEAR_UNITS[name]
    except KeyError:
        raise ProjError(ERR_UNKNOWN_UNIT_ID, name) from None
