"""Round-3 EPSG catalog additions: common-use grid-free codes.

The reference serves these from proj.db (src/iso19111/factory.cpp —
out of scope); the bundled static catalog transcribes the public EPSG
registry parameters. These tests anchor each transcription:

- projection-origin anchors are EXACT by construction (at the natural
  origin the forward map yields (x_0, y_0) — any false-easting/
  northing, lat_0/lon_0 or unit transcription error breaks them);
- the formulaic Gauss-Krueger / ED50-UTM families are checked for the
  zone->lon_0/x_0 rule;
- Web Mercator / World Mercator are cross-checked against the
  closed-form spherical/ellipsoidal formulas computed in-test;
- one datum-path landmark (Royal Observatory Greenwich on the British
  National Grid) exercises the 7-parameter Helmert leg end-to-end at
  the accuracy the gridless towgs84 path supports.
"""

import math

import numpy as np
import pytest

from rayproj.core.factory import create_operation
from rayproj.core.op import FWD, Coords


def _fwd_deg(defn: str, lon: float, lat: float, datum_leg: bool = True):
    """Forward-project one (lon, lat) in degrees.

    With ``datum_leg=False`` the cs2cs helper sub-ops (helmert/cart)
    are detached so the input is interpreted in the operation's OWN
    datum — that makes the natural-origin anchors exact by
    construction regardless of the towgs84 transcription.
    """
    op = create_operation(defn)
    if not datum_leg:
        op.helmert = op.cart = op.cart_wgs84 = None
        op.hgridshift = op.vgridshift = None
    c = Coords(
        np.array([math.radians(lon)]),
        np.array([math.radians(lat)]),
        np.zeros(1),
        np.zeros(1),
    )
    op.trans(FWD, c)
    return float(c.x[0]), float(c.y[0])


ORIGIN_ANCHORS = [
    # code, (lon_0, lat_0) natural origin, (x_0, y_0)
    (27700, (-2.0, 49.0), (400000.0, -100000.0)),
    (2154, (3.0, 46.5), (700000.0, 6600000.0)),
    (3035, (10.0, 52.0), (4321000.0, 3210000.0)),
    (3034, (10.0, 52.0), (4000000.0, 2800000.0)),
    (21781, (7.439583333333333, 46.95240555555556), (600000.0, 200000.0)),
    (2056, (7.439583333333333, 46.95240555555556), (2600000.0, 1200000.0)),
    (2180, (19.0, 0.0), (500000.0, -5300000.0)),
    (2193, (173.0, 0.0), (1600000.0, 10000000.0)),
    (5070, (-96.0, 23.0), (0.0, 0.0)),
    (3413, (-45.0, 90.0), (0.0, 0.0)),
    (3031, (0.0, -90.0), (0.0, 0.0)),
    (32661, (0.0, 90.0), (2000000.0, 2000000.0)),
    (32761, (0.0, -90.0), (2000000.0, 2000000.0)),
]


@pytest.mark.parametrize("code,origin,xy", ORIGIN_ANCHORS)
def test_origin_anchor(code, origin, xy):
    ox, oy = _fwd_deg(f"+init=epsg:{code}", *origin, datum_leg=False)
    assert ox == pytest.approx(xy[0], abs=1e-6)
    assert oy == pytest.approx(xy[1], abs=1e-6)


def test_geographic_additions_resolve():
    for code, ell in [(4258, "GRS80"), (4269, "GRS80"), (4277, "airy"),
                      (4171, "GRS80"), (4149, "bessel"), (4314, "bessel")]:
        op = create_operation(f"+init=epsg:{code}")
        assert op.name == "longlat"
        assert op.params.str_("ellps") == ell or op.params.has("towgs84")


def test_webmerc_closed_form():
    # EPSG:3857 spherical Mercator on the WGS84 semi-major axis
    lon, lat = 13.4050, 52.5200  # Berlin
    x, y = _fwd_deg("+init=epsg:3857", lon, lat)
    R = 6378137.0
    assert x == pytest.approx(R * math.radians(lon), abs=1e-5)
    assert y == pytest.approx(
        R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)), abs=1e-5
    )


def test_world_mercator_closed_form():
    # EPSG:3395 ellipsoidal Mercator: y = a*atanh(sin phi) - a*e*atanh(e sin phi)
    lon, lat = 151.2093, -33.8688  # Sydney
    x, y = _fwd_deg("+init=epsg:3395", lon, lat)
    a, es = 6378137.0, 0.0066943799901413165
    e = math.sqrt(es)
    s = math.sin(math.radians(lat))
    assert x == pytest.approx(a * math.radians(lon), abs=1e-5)
    assert y == pytest.approx(a * (math.atanh(s) - e * math.atanh(e * s)), abs=1e-4)


def test_formulaic_ed50_utm():
    op = create_operation("+init=epsg:23032")
    assert op.name == "utm"
    assert op.params.str_("zone") == "32"
    assert op.params.str_("ellps") == "intl"
    assert op.params.str_("towgs84").startswith("-87,-98,-121")


def test_formulaic_dhdn_gk():
    # DHDN / 3-degree Gauss-Krueger zone 3 (31467): lon_0=9, x_0=3500000
    op = create_operation("+init=epsg:31467")
    assert op.name == "tmerc"
    assert float(op.params.str_("lon_0")) == 9.0
    assert float(op.params.str_("x_0")) == 3500000.0
    assert op.params.str_("ellps") == "bessel"
    ox, oy = _fwd_deg("+init=epsg:31467", 9.0, 0.0, datum_leg=False)
    assert ox == pytest.approx(3500000.0, abs=1e-6)
    assert oy == pytest.approx(0.0, abs=1e-6)


def test_formulaic_pulkovo_gk():
    # Pulkovo 1942 / Gauss-Krueger zone 12 (28412): lon_0=69, x_0=12500000
    op = create_operation("+init=epsg:28412")
    assert op.name == "tmerc"
    assert float(op.params.str_("lon_0")) == 69.0
    assert float(op.params.str_("x_0")) == 12500000.0
    assert op.params.str_("ellps") == "krass"


def test_bng_datum_path_landmark():
    """4326 -> 27700 through the WGS84 hub: Royal Observatory Greenwich.

    OSGB grid reference TQ 3889 7731 (E 538890 N 177310); the gridless
    mean-Helmert path is good to a few metres, so assert at 25 m.
    Note the WGS84 zero meridian runs ~102 m EAST of the Airy transit
    circle — the Observatory's WGS84 longitude is ~0.00147°W.
    """
    src = create_operation("+init=epsg:4326")
    dst = create_operation("+init=epsg:27700")
    c = Coords(
        np.array([math.radians(-0.00147)]),
        np.array([math.radians(51.4779)]),
        np.zeros(1),
        np.zeros(1),
    )
    # cs2cs semantics: src → WGS84 geodetic hub → dst (cli.py cmd_cs2cs)
    src.inv(c)
    dst.fwd(c)
    assert float(c.x[0]) == pytest.approx(538890.0, abs=25.0)
    assert float(c.y[0]) == pytest.approx(177310.0, abs=25.0)
