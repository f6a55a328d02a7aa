"""Core framework: proj-string parsing, ellipsoids, DMS, merc kernels."""

import math

import numpy as np
import pytest

from rayproj import Coords, create_operation
from rayproj.core.constants import DEG_TO_RAD
from rayproj.core.dms import dms_to_rad
from rayproj.core.ellps import resolve_ellipsoid
from rayproj.core.params import Params


def test_params_parse():
    p = Params.parse("+proj=merc +ellps=GRS80 +over +k_0=0.9996")
    assert p.str_("proj") == "merc"
    assert p.bool_("over") is True
    assert p.float_("k_0") == 0.9996
    assert not p.has("nope")


def test_dms():
    assert dms_to_rad("2") == pytest.approx(2 * DEG_TO_RAD)
    assert dms_to_rad("-2.5") == pytest.approx(-2.5 * DEG_TO_RAD)
    assert dms_to_rad("12d30") == pytest.approx(12.5 * DEG_TO_RAD)
    assert dms_to_rad("12d30'36\"") == pytest.approx((12 + 30 / 60 + 36 / 3600) * DEG_TO_RAD)
    assert dms_to_rad("17d40'W") == pytest.approx(-(17 + 40 / 60) * DEG_TO_RAD)
    assert dms_to_rad("1.5r") == 1.5
    assert dms_to_rad("90dN") == pytest.approx(90 * DEG_TO_RAD)


def test_ellipsoid_grs80():
    ell = resolve_ellipsoid(Params.parse("+ellps=GRS80"))
    assert ell.a == 6378137.0
    assert ell.es == pytest.approx(0.0066943800229, abs=1e-12)
    assert ell.b == pytest.approx(6356752.31414, abs=1e-5)


def test_ellipsoid_sphere_override():
    ell = resolve_ellipsoid(Params.parse("+R=6400000"))
    assert ell.a == 6400000.0 and ell.es == 0.0
    ell2 = resolve_ellipsoid(Params.parse("+a=6378137 +b=6378137"))
    assert ell2.es == 0.0


def test_merc_gie_values():
    # test/gie/builtins.gie:3356-3376 @ 0.1 mm
    op = create_operation("+proj=merc +ellps=GRS80")
    c = Coords(np.array([2.0, 2, -2, -2]) * DEG_TO_RAD, np.array([1.0, -1, 1, -1]) * DEG_TO_RAD)
    op.fwd(c)
    np.testing.assert_allclose(
        c.x, [222638.981586547, 222638.981586547, -222638.981586547, -222638.981586547],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        c.y, [110579.965218250, -110579.965218249, 110579.965218250, -110579.965218249],
        atol=1e-4,
    )
    c2 = Coords(np.array([200.0]), np.array([100.0]))
    op.inv(c2)
    assert c2.x[0] / DEG_TO_RAD == pytest.approx(0.001796631, abs=1e-9)
    assert c2.y[0] / DEG_TO_RAD == pytest.approx(0.000904369, abs=1e-9)


def test_merc_roundtrip_vec():
    op = create_operation("+proj=merc +ellps=WGS84")
    rng = np.random.default_rng(42)
    lam = rng.uniform(-np.pi + 0.01, np.pi - 0.01, 10000)
    phi = rng.uniform(-1.4, 1.4, 10000)
    c = Coords(lam.copy(), phi.copy())
    op.fwd(c)
    op.inv(c)
    assert np.abs(c.x - lam).max() < 1e-12
    assert np.abs(c.y - phi).max() < 1e-12
    assert (c.err == 0).all()


def test_merc_pole_error():
    op = create_operation("+proj=merc +ellps=WGS84")
    c = Coords(np.array([0.0, 0.1]), np.array([math.pi / 2, 0.5]))
    op.fwd(c)
    assert c.err[0] == -20  # tolerance condition at the pole
    assert np.isinf(c.x[0])
    assert c.err[1] == 0 and np.isfinite(c.x[1])


def test_lat_over_range():
    op = create_operation("+proj=merc +ellps=WGS84")
    c = Coords(np.array([0.0]), np.array([math.pi / 2 + 0.1]))
    op.fwd(c)
    assert c.err[0] == -14


def test_units_and_offsets():
    op = create_operation("+proj=merc +ellps=WGS84 +x_0=1000 +y_0=2000 +units=km")
    c = Coords(np.array([0.0]), np.array([0.0]))
    op.fwd(c)
    assert c.x[0] == pytest.approx(1.0)  # (0 + 1000 m) in km
    assert c.y[0] == pytest.approx(2.0)


def test_webmerc():
    op = create_operation("+proj=webmerc +ellps=WGS84")
    c = Coords(np.array([2.0 * DEG_TO_RAD]), np.array([1.0 * DEG_TO_RAD]))
    op.fwd(c)
    # spherical formulas on a=6378137
    assert c.x[0] == pytest.approx(2 * DEG_TO_RAD * 6378137.0)


def test_factors_merc_sphere_analytic():
    import numpy as np

    from rayproj.core.factors import factors

    op = create_operation("+proj=merc +R=6400000")
    lat = np.array([0.0, 30.0, 60.0]) * DEG_TO_RAD
    f = factors(op, np.full(3, 0.1), lat)
    assert np.allclose(f.k, 1 / np.cos(lat), rtol=1e-7)
    assert np.allclose(f.h, f.k, rtol=1e-7)
    assert np.all(np.abs(f.omega) < 1e-7)
    assert np.allclose(f.s, f.h * f.k, rtol=1e-6)


def test_prefix_parsers_and_rtodms():
    """strtod/dmstor prefix consumption + rtodms emission match the
    C library semantics the reference apps build on (src/dmstor.cpp,
    src/rtodms.cpp)."""
    from rayproj.core.constants import DEG_TO_RAD
    from rayproj.core.dms import dmstor_prefix, rtodms, strtod_prefix

    # strtod: leading whitespace, exponent, endptr; no-conversion -> (0, i)
    assert strtod_prefix("  1.5e2x") == (150.0, 7)
    assert strtod_prefix("abc") == (0.0, 0)
    assert strtod_prefix("12 34", 2) == (34.0, 5)
    # dmstor: radians suffix, postfix hemisphere overrides leading sign,
    # prefix stops at whitespace, malformed field order -> inf
    v, i = dmstor_prefix("12d30'30\"W rest")
    assert v == pytest.approx(-(12 + 30 / 60 + 30 / 3600) * DEG_TO_RAD)
    assert i == 10
    assert dmstor_prefix("1.5r x")[0] == 1.5
    assert dmstor_prefix("-12d30N")[0] == pytest.approx(12.5 * DEG_TO_RAD)
    assert dmstor_prefix("12'30d")[0] == float("inf")
    v, i = dmstor_prefix("  7.5 more")
    assert (v, i) == (pytest.approx(7.5 * DEG_TO_RAD), 5)
    # rtodms: zero-field dropping, fraction stripping, fixed width,
    # falsy pos emits a '-' prefix
    assert rtodms(12.5 * DEG_TO_RAD, "E", "W") == "12d30'E"
    assert rtodms(-12.0 * DEG_TO_RAD, "E", "W") == "12dW"
    assert rtodms(-12.0 * DEG_TO_RAD, "", "") == "-12d"
    s = (12 + 30 / 60 + 30.25 / 3600) * DEG_TO_RAD
    assert rtodms(s, "N", "S") == "12d30'30.25\"N"
    assert rtodms(s, "N", "S", 3, True) == "12d30'30.250\"N"
    assert rtodms(s, "N", "S", 0) == "12d30'30\"N"
    # round-trip: dmstor(rtodms(x)) == x at 1e-9 rad for random values
    rng = np.random.default_rng(42)
    for x in rng.uniform(-3.1, 3.1, 200):
        txt = rtodms(float(x), "E", "W", 7)
        back, _ = dmstor_prefix(txt)
        assert back == pytest.approx(float(x), abs=1e-9)


def test_params_quoted_values_and_joining():
    """Quote-aware proj-string tokenizing (pj_shrink/pj_trim_argc) and
    the CLI's argv re-quoting (pj_double_quote_string_param_if_needed):
    grid paths with spaces/tabs survive both layers."""
    from rayproj.cli import _join_args
    from rayproj.core.params import Params

    p = Params.parse('+nadgrids="./dir with "" space/f" +ellps=clrk66')
    assert p.str_("nadgrids") == './dir with " space/f'
    assert p.str_("ellps") == "clrk66"
    # tab preserved inside quotes, splits outside
    p = Params.parse('+a="x\ty"\t+b=1')
    assert p.str_("a") == "x\ty" and p.str_("b") == "1"
    # argv tokens whose value has whitespace are re-quoted on join and
    # round-trip through parse
    joined = _join_args(["+proj=latlong", "+nadgrids=./a b/c", "+x=1"])
    p = Params.parse(joined)
    assert p.str_("nadgrids") == "./a b/c" and p.str_("x") == "1"
