"""Operation factory — the engine's pj_init.

Re-derivation of the reference's resolution rules:
  * pj_init_ctx            — /root/reference/src/init.cpp:522-836
  * pj_datum_set           — /root/reference/src/datum_set.cpp:41-160
  * cs2cs_emulation_setup  — /root/reference/src/4D_api.cpp:610-744
The result is a tiny pure-Python Operation object (resolved float
constants only) that ships to Ray tasks via closure capture.
"""

from __future__ import annotations

import math

from ..ops import REGISTRY, get_operation_class
from .constants import M_HALFPI
from .datums import (
    DATUM_3PARAM,
    DATUM_7PARAM,
    DATUM_GRIDSHIFT,
    DATUM_TABLE,
    DATUM_UNKNOWN,
    DATUM_WGS84,
    prime_meridian_rad,
)
from .ellps import Ellipsoid, resolve_ellipsoid
from .errors import (
    ERR_K_LESS_THAN_ZERO,
    ERR_LAT_LARGER_THAN_90,
    ERR_MAJOR_AXIS_NOT_GIVEN,
    ERR_PROJ_NOT_NAMED,
    ERR_UNKNOWN_ELLP_PARAM,
    ERR_UNKNOWN_PRIME_MERIDIAN,
    ERR_UNKNOWN_PROJECTION_ID,
    ProjError,
)
from .op import Operation
from .params import Params
from .units import linear_unit_to_meter, parse_to_meter

SEC_TO_RAD = 4.84813681109535993589914102357e-6


def create_operation(definition: str | Params) -> Operation:
    """Build a fully-resolved Operation from a proj-string."""
    params = Params.parse(definition) if isinstance(definition, str) else definition
    name = params.str_("proj")
    if not name and params.has("init"):
        # +init-only definition: +proj comes from the catalog expansion
        # (init.cpp:581-599 — get_init runs before the proj= check)
        from .resources import load_init

        expansion = load_init(params.str_("init") or "")
        name = next((v for k, v in expansion if k == "proj"), None)
        if name == "pipeline":
            # a pipeline served from an init catalog needs its step
            # tokens merged in before dispatch (init_operation merges
            # for plain ops, but pipelines parse their own argv)
            params = Params(params.pairs + expansion)
    if not name:
        raise ProjError(ERR_PROJ_NOT_NAMED, str(definition))
    if name == "pipeline":
        from ..ops.pipeline import make_pipeline

        return make_pipeline(params)
    return init_operation(params)


def datum_expand(params: Params) -> tuple[int, tuple | None, Params]:
    """pj_datum_set: expand +datum=, classify datum type, parse towgs84."""
    datum_type = DATUM_UNKNOWN
    datum_params = None
    name = params.str_("datum")
    if name:
        if name not in DATUM_TABLE:
            raise ProjError(ERR_UNKNOWN_ELLP_PARAM, f"datum {name}")
        defn, ellps_id = DATUM_TABLE[name]
        extra = []
        if ellps_id:
            extra.append(("ellps", ellps_id))
        for tok in defn.split():
            k, _, v = tok.partition("=")
            extra.append((k, v if v else None))
        # appended at the end: explicit user params win (first match)
        params = Params(params.pairs + extra)
    if params.str_("nadgrids"):
        datum_type = DATUM_GRIDSHIFT
    elif params.str_("towgs84"):
        vals = [float(v) for v in params.str_("towgs84").split(",") if v != ""][:7]
        d = (vals + [0.0] * 7)[:7]
        if d[3] != 0.0 or d[4] != 0.0 or d[5] != 0.0 or d[6] != 0.0:
            datum_type = DATUM_7PARAM
            d[3] *= SEC_TO_RAD
            d[4] *= SEC_TO_RAD
            d[5] *= SEC_TO_RAD
            d[6] = d[6] / 1000000.0 + 1
        else:
            datum_type = DATUM_3PARAM
        datum_params = tuple(d)
    return datum_type, datum_params, params


def _needs_default_ellps(params: Params) -> bool:
    """append_default_ellipsoid_to_paralist (init.cpp:320-346)."""
    if params.has("no_defs"):
        return False
    if params.str_("proj") == "pipeline":
        return False
    for k in ("datum", "ellps", "a", "b", "rf", "f", "e", "es", "R"):
        if params.has(k):
            return False
    return True


def init_operation(params: Params, cs2cs_emulation: bool = True) -> Operation:
    # +init= catalog expansion, appended as defaults (init.cpp:212-318)
    if params.has("init"):
        from .resources import load_init

        expansion = load_init(params.str_("init") or "")
        params = Params(params.pairs + expansion)

    name = params.str_("proj")
    if not name:
        raise ProjError(ERR_PROJ_NOT_NAMED)
    cls = get_operation_class(name)
    if cls is None:
        raise ProjError(ERR_UNKNOWN_PROJECTION_ID, name)

    datum_type, datum_params, params = datum_expand(params)

    if _needs_default_ellps(params):
        # the reference's default ellipsoid is GRS80 (init.cpp:351)
        params = Params(params.pairs + [("ellps", "GRS80")])

    try:
        ell = resolve_ellipsoid(params)
    except ProjError:
        if getattr(cls, "need_ellps", True):
            raise
        # free WGS84 for ops that don't require one (init.cpp:648-660)
        f = 1.0 / 298.257223563
        ell = Ellipsoid(a=6378137.0, es=f * (2 - f), f=f).derive()

    # WGS84 datum equivalence (init.cpp:666-675)
    if (
        datum_type == DATUM_3PARAM
        and datum_params is not None
        and datum_params[0] == 0.0
        and datum_params[1] == 0.0
        and datum_params[2] == 0.0
        and ell.a == 6378137.0
        and abs(ell.es - 0.006694379990) < 0.000000000050
    ):
        datum_type = DATUM_WGS84

    op: Operation = cls(params, ell)
    op.datum_type = datum_type
    op.datum_params = datum_params
    op.a_orig = ell.a
    op.es_orig = ell.es

    if abs(op.phi0) > M_HALFPI:
        raise ProjError(ERR_LAT_LARGER_THAN_90, "lat_0")
    if op.k0 <= 0.0:
        raise ProjError(ERR_K_LESS_THAN_ZERO, "k_0")

    # Linear units (init.cpp:740-770)
    s: str | None = None
    if params.str_("units"):
        s = str(linear_unit_to_meter(params.str_("units")))
    if s is None and params.str_("to_meter"):
        s = params.str_("to_meter")
    if s is not None:
        op.to_meter = parse_to_meter(s)
        op.fr_meter = 1.0 / op.to_meter

    # Vertical units (init.cpp:768-793)
    s = None
    if params.str_("vunits"):
        s = str(linear_unit_to_meter(params.str_("vunits")))
    if s is None and params.str_("vto_meter"):
        s = params.str_("vto_meter")
    if s is not None:
        op.vto_meter = parse_to_meter(s)
        op.vfr_meter = 1.0 / op.vto_meter
    else:
        op.vto_meter = op.to_meter
        op.vfr_meter = op.fr_meter

    # Prime meridian (init.cpp:795-816)
    pm = params.str_("pm")
    if pm:
        try:
            op.from_greenwich = prime_meridian_rad(pm)
        except ProjError:
            raise ProjError(ERR_UNKNOWN_PRIME_MERIDIAN, pm) from None
        if math.isinf(op.from_greenwich) or math.isnan(op.from_greenwich):
            raise ProjError(ERR_UNKNOWN_PRIME_MERIDIAN, pm)

    # Projection-specific constructor
    op.setup()

    if cs2cs_emulation and not params.has("break_cs2cs_recursion"):
        _cs2cs_emulation_setup(op)
    return op


def _cs2cs_emulation_setup(op: Operation) -> None:
    """Attach axisswap/gridshift/helmert/cart helper sub-ops
    (4D_api.cpp:610-744). Helper ops run kernel-only (skip_prep_fin)."""
    params = op.params

    axis = params.str_("axis")
    if axis and axis != "enu":
        q = init_operation(
            Params.parse(f"break_cs2cs_recursion proj=axisswap axis={axis}"),
            cs2cs_emulation=False,
        )
        op.axisswap = _skip_prep_fin(q)

    geoidgrids = params.str_("geoidgrids")
    if geoidgrids:
        q = init_operation(
            Params([("break_cs2cs_recursion", None),
                    ("proj", "vgridshift"), ("grids", geoidgrids)]),
            cs2cs_emulation=False,
        )
        op.vgridshift = _skip_prep_fin(q)

    nadgrids = params.str_("nadgrids")
    if nadgrids:
        q = init_operation(
            Params([("break_cs2cs_recursion", None),
                    ("proj", "hgridshift"), ("grids", nadgrids)]),
            cs2cs_emulation=False,
        )
        op.hgridshift = _skip_prep_fin(q)

    do_cart = False
    towgs84 = params.str_("towgs84")
    # +grid_fallback (database catalog expansions only): keep the
    # towgs84 Helmert AS A PER-POINT FALLBACK for points outside the
    # grid — proj_create_crs_to_crs candidate selection, not classic
    # nadgrids-over-towgs84 precedence (which drops towgs84 entirely)
    grid_fb = (op.hgridshift is not None and bool(towgs84)
               and params.has("grid_fallback"))
    if op.hgridshift is not None and not grid_fb:
        towgs84 = None
    if towgs84 and (op.datum_params is not None or grid_fb):
        d = op.datum_params
        if d is not None and all(v == 0 for v in d) and not grid_fb:
            # null shift: only need the ellipsoid change if not already WGS84
            if not (
                abs(op.a_orig - 6378137.0) < 1e-8 and abs(op.es_orig - 0.0066943799901413) < 1e-15
            ):
                do_cart = True
        else:
            q = init_operation(
                Params.parse(
                    "break_cs2cs_recursion proj=helmert exact "
                    f"towgs84={towgs84} convention=position_vector"
                ),
                cs2cs_emulation=False,
            )
            q.ell = op.ell  # pj_inherit_ellipsoid_def
            if grid_fb:
                op.helmert_fb = _skip_prep_fin(q)
            else:
                op.helmert = _skip_prep_fin(q)

    if op.is_geocent or op.helmert is not None or op.helmert_fb is not None \
            or do_cart:
        q = init_operation(
            Params.parse(
                f"break_cs2cs_recursion proj=cart a={op.a_orig!r} es={op.es_orig!r}"
            ),
            cs2cs_emulation=False,
        )
        op.cart = _skip_prep_fin(q)
        if not op.is_geocent:
            q = init_operation(
                Params.parse("break_cs2cs_recursion proj=cart ellps=WGS84"),
                cs2cs_emulation=False,
            )
            op.cart_wgs84 = _skip_prep_fin(q)


def _skip_prep_fin(op: Operation) -> Operation:
    op.skip_fwd_prepare = True
    op.skip_fwd_finalize = True
    op.skip_inv_prepare = True
    op.skip_inv_finalize = True
    return op


__all__ = ["create_operation", "init_operation", "REGISTRY"]
