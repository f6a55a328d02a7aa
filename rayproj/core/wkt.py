"""WKT2:2019 (ISO 19162) emission for resolved operations.

The reference's WKT formatter lives in the iso19111 layer
(src/iso19111/io.cpp, WKTFormatter) and is database-backed; this is a
from-scratch re-derivation of the subset a proj-string can express:

- ``longlat``-style ops emit ``GEOGCRS`` with the resolved ellipsoid
  and (when present) ``BOUNDCRS`` + ``ABRIDGEDTRANSFORMATION`` for a
  ``+towgs84`` Helmert leg (mirroring how the reference represents
  gridless datum info in WKT2).
- projected ops with a known EPSG method mapping emit ``PROJCRS`` with
  ``CONVERSION``/``METHOD``/``PARAMETER`` nodes.
- anything else falls back to the reference's own escape hatch for
  non-CRS operations: ``METHOD["PROJ-based operation method: ..."]``
  (io.cpp exports exactly this form for un-mappable proj-strings).

Only formatting lives here — all numbers come from the already-resolved
Operation (ellipsoid constants, offsets, k0), so WKT agrees with what
the kernels actually compute.
"""

from __future__ import annotations

from .constants import RAD_TO_DEG

# proj name -> (EPSG method name, [(wkt param name, source attr/param)])
# Sources: 'lat_0/lon_0' read degrees from the op's resolved radians;
# 'k0/x0/y0' read the resolved floats; 'lat_1/lat_2/lat_ts' read params.
_METHODS = {
    "tmerc": (
        "Transverse Mercator",
        [
            ("Latitude of natural origin", "lat_0"),
            ("Longitude of natural origin", "lon_0"),
            ("Scale factor at natural origin", "k0"),
            ("False easting", "x0"),
            ("False northing", "y0"),
        ],
    ),
    "merc": (
        "Mercator (variant B)",
        [
            ("Latitude of 1st standard parallel", "lat_ts"),
            ("Longitude of natural origin", "lon_0"),
            ("False easting", "x0"),
            ("False northing", "y0"),
        ],
    ),
    "webmerc": (
        "Popular Visualisation Pseudo Mercator",
        [
            ("Latitude of natural origin", "lat_0"),
            ("Longitude of natural origin", "lon_0"),
            ("False easting", "x0"),
            ("False northing", "y0"),
        ],
    ),
    "lcc": (
        "Lambert Conic Conformal (2SP)",
        [
            ("Latitude of false origin", "lat_0"),
            ("Longitude of false origin", "lon_0"),
            ("Latitude of 1st standard parallel", "lat_1"),
            ("Latitude of 2nd standard parallel", "lat_2"),
            ("Easting at false origin", "x0"),
            ("Northing at false origin", "y0"),
        ],
    ),
    "aea": (
        "Albers Equal Area",
        [
            ("Latitude of false origin", "lat_0"),
            ("Longitude of false origin", "lon_0"),
            ("Latitude of 1st standard parallel", "lat_1"),
            ("Latitude of 2nd standard parallel", "lat_2"),
            ("Easting at false origin", "x0"),
            ("Northing at false origin", "y0"),
        ],
    ),
    "laea": (
        "Lambert Azimuthal Equal Area",
        [
            ("Latitude of natural origin", "lat_0"),
            ("Longitude of natural origin", "lon_0"),
            ("False easting", "x0"),
            ("False northing", "y0"),
        ],
    ),
    "cea": (
        "Lambert Cylindrical Equal Area",
        [
            ("Latitude of 1st standard parallel", "lat_ts"),
            ("Longitude of natural origin", "lon_0"),
            ("False easting", "x0"),
            ("False northing", "y0"),
        ],
    ),
    "stere": (
        "Polar Stereographic (variant B)",
        [
            ("Latitude of standard parallel", "lat_ts"),
            ("Longitude of origin", "lon_0"),
            ("False easting", "x0"),
            ("False northing", "y0"),
        ],
    ),
    "somerc": (
        "Hotine Oblique Mercator (variant B)",
        [
            ("Latitude of projection centre", "lat_0"),
            ("Longitude of projection centre", "lon_0"),
            ("Scale factor on initial line", "k0"),
            ("Easting at projection centre", "x0"),
            ("Northing at projection centre", "y0"),
        ],
    ),
    "eqc": (
        "Equidistant Cylindrical",
        [
            ("Latitude of 1st standard parallel", "lat_ts"),
            ("Longitude of natural origin", "lon_0"),
            ("False easting", "x0"),
            ("False northing", "y0"),
        ],
    ),
}

_ANGLEUNIT = 'ANGLEUNIT["degree",0.0174532925199433]'
_METREUNIT = 'LENGTHUNIT["metre",1]'

# +datum= shorthand -> the EPSG datum name the reference resolves it to
# (datums.cpp pj_datums table + io.cpp naming)
_DATUM_NAMES = {
    "WGS84": "World Geodetic System 1984",
    "NAD83": "North American Datum 1983",
    "NAD27": "North American Datum 1927",
    "potsdam": "Deutsches Hauptdreiecksnetz",
    "GGRS87": "Greek Geodetic Reference System 1987",
    "hermannskogel": "Militar-Geographische Institut",
    "ire65": "TM65",
    "nzgd49": "New Zealand Geodetic Datum 1949",
    "OSGB36": "Ordnance Survey of Great Britain 1936",
    "carthage": "Carthage",
}

_ELLPS_NAMES = {"WGS84": "WGS 84", "GRS80": "GRS 1980"}


def _num(v: float) -> str:
    """Shortest exact-enough numeric literal (repr-style, no trailing .0)."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _param_value(op, src: str) -> float:
    if src == "lat_0":
        v = op.phi0 * RAD_TO_DEG
    elif src == "lon_0":
        v = op.lam0 * RAD_TO_DEG
    elif src == "k0":
        return op.k0
    elif src == "x0":
        return op.x0
    elif src == "y0":
        return op.y0
    else:
        # spec parameters not stored as resolved attrs (lat_1/lat_2/lat_ts)
        return op.params.float_(src, 0.0)
    # radians→degrees round-trip leaves ~1 ulp noise on derived angles
    # (utm's lam0 = (zone+.5)·π/30−π): snap to 10 decimals
    return round(v, 10)


def _ellipsoid(op) -> str:
    # use the ORIGINAL ellipsoid (a_orig/es_orig): spherical-only
    # projections legitimately flatten op.ell to a sphere internally,
    # but the CRS keeps the datum ellipsoid
    a = getattr(op, "a_orig", None) or op.ell.a
    es = getattr(op, "es_orig", None)
    if es is None:
        es = op.ell.es
    name = op.params.str_("ellps") or "unknown"
    name = _ELLPS_NAMES.get(name, name)
    f = 1.0 - (1.0 - es) ** 0.5
    rf = 1.0 / f if f else 0
    return (
        f'ELLIPSOID["{name}",{_num(a)},{_num(round(rf, 9))},{_METREUNIT}]'
    )


def _datum_name(op) -> str:
    d = op.params.str_("datum")
    return _DATUM_NAMES.get(d, "unknown") if d else "unknown"


def _geog_cs(op, name: str = "unknown") -> str:
    return (
        f'GEOGCRS["{name}",'
        f'DATUM["{_datum_name(op)}",{_ellipsoid(op)}],'
        f'PRIMEM["Greenwich",0,{_ANGLEUNIT}],'
        "CS[ellipsoidal,2],"
        f'AXIS["geodetic latitude (Lat)",north,ORDER[1],{_ANGLEUNIT}],'
        f'AXIS["geodetic longitude (Lon)",east,ORDER[2],{_ANGLEUNIT}]]'
    )


def _base_geog(op) -> str:
    return (
        'BASEGEOGCRS["unknown",'
        f'DATUM["{_datum_name(op)}",{_ellipsoid(op)}],'
        f'PRIMEM["Greenwich",0,{_ANGLEUNIT}]]'
    )


def _bound(inner: str, towgs84: str) -> str:
    vals = [float(v) for v in towgs84.split(",")]
    vals += [0.0] * (7 - len(vals))
    names = [
        ("X-axis translation", ""),
        ("Y-axis translation", ""),
        ("Z-axis translation", ""),
        ("X-axis rotation", ""),
        ("Y-axis rotation", ""),
        ("Z-axis rotation", ""),
        ("Scale difference", ""),
    ]
    params = ",".join(
        f'PARAMETER["{n}",{_num(v)}]' for (n, _), v in zip(names, vals)
    )
    return (
        f"BOUNDCRS[SOURCECRS[{inner}],"
        'TARGETCRS[GEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
        f'ELLIPSOID["WGS 84",6378137,298.257223563,{_METREUNIT}]],'
        f'PRIMEM["Greenwich",0,{_ANGLEUNIT}],CS[ellipsoidal,2],'
        f'AXIS["geodetic latitude (Lat)",north,ORDER[1],{_ANGLEUNIT}],'
        f'AXIS["geodetic longitude (Lon)",east,ORDER[2],{_ANGLEUNIT}]]],'
        'ABRIDGEDTRANSFORMATION["Transformation from unknown to WGS84",'
        'METHOD["Position Vector transformation (geog2D domain)"],'
        f"{params}]]"
    )


def _projected(op) -> str:
    name = op.name
    params = op.params
    if name == "utm":
        # utm resolves to tmerc constants (lam0/k0/x0/y0 already set)
        method, plist = _METHODS["tmerc"]
    elif name in _METHODS:
        method, plist = _METHODS[name]
    else:
        # reference escape hatch for non-mappable operations
        toks = " ".join(
            f"+{k}={v}" if v is not None else f"+{k}" for k, v in params.pairs
            if k != "no_defs"
        )
        method, plist = f"PROJ-based operation method: {toks}", []
    conv_params = ",".join(
        f'PARAMETER["{pname}",{_num(_param_value(op, src))},'
        + (_ANGLEUNIT if pname.startswith(("Latitude", "Longitude")) else _METREUNIT)
        + "]"
        for pname, src in plist
    )
    conv = (
        f'CONVERSION["unknown",METHOD["{method}"]'
        + ("," + conv_params if conv_params else "")
        + "]"
    )
    return (
        'PROJCRS["unknown",'
        f"{_base_geog(op)},"
        f"{conv},"
        "CS[Cartesian,2],"
        f'AXIS["(E)",east,ORDER[1],{_METREUNIT}],'
        f'AXIS["(N)",north,ORDER[2],{_METREUNIT}]]'
    )


def to_wkt2(op) -> str:
    """WKT2:2019 for a resolved Operation (geographic or projected)."""
    if op.is_latlong:
        inner = _geog_cs(op)
    else:
        inner = _projected(op)
    towgs84 = op.params.str_("towgs84")
    # an all-zero towgs84 (what +datum=WGS84 expands to) means the datum
    # IS the WGS84 hub: the reference emits a bare CRS, not a BOUNDCRS
    if towgs84 and any(float(v) != 0.0 for v in towgs84.split(",")):
        return _bound(inner, towgs84)
    return inner


def pretty(wkt: str, indent: int = 4) -> str:
    """Re-indent a single-line WKT string (matching projinfo's output
    style: one node per line, children indented)."""
    out = []
    depth = 0
    cur = ""
    in_str = False
    for ch in wkt:
        if ch == '"':
            in_str = not in_str
            cur += ch
        elif not in_str and ch == "[":
            cur += ch
            depth += 1
        elif not in_str and ch == "]":
            cur += ch
            depth -= 1
        elif not in_str and ch == ",":
            # split only between top-level-ish nodes: next token starts
            # an UPPERCASE keyword
            cur += ch
            out.append(cur)
            cur = " " * (indent * depth)
        else:
            cur += ch
    out.append(cur)
    # merge splits that were mid-parameter (next fragment not a keyword)
    lines = []
    for frag in out:
        body = frag.strip()
        key = body.split("[", 1)[0]
        if lines and not (key.isupper() and key.isalpha()):
            lines[-1] += body
        else:
            lines.append(frag)
    return "\n".join(lines)
