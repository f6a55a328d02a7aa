"""Unit-vector ports of the reference's test_metadata.cpp extent suite
(TEST(metadata, extent), test/unit/test_metadata.cpp:64-280) and the
numeric/emission vectors of test_datum.cpp (ellipsoid derived quantities,
PROJ-string emission of ellipsoids and prime meridians).

The extent functions under test are the engine's candidate-operation
AOI machinery (rayproj/state/dbcrs.py), re-derived from
GeographicBoundingBox in src/iso19111/metadata.cpp:256-441.
"""

import math

import pytest

from rayproj.state.dbcrs import (
    _bbox_area,
    _bbox_contains,
    _bbox_intersection,
    _bbox_intersects,
)
from rayproj.core.ellps import Ellipsoid, resolve_ellipsoid
from rayproj.core.params import Params
from rayproj.core.wkt import (
    _ellps_tokens_ab,
    _pm_wellknown_name,
    from_wkt,
)


def bbox(w, s, e, n):
    """Reference createFromBBOX argument order -> engine (s, w, n, e)."""
    return (s, w, n, e)


WORLD = bbox(-180, -90, 180, 90)
WEST_HEMISPHERE = bbox(-180, -90, 0, 90)
FRANCE = bbox(-5, 40, 12, 51)
EUROPE = bbox(-30, 25, 30, 70)
NZ = bbox(155.0, -60.0, -170.0, -25.0)  # crosses the antimeridian


def test_extent_contains_basics():
    assert _bbox_contains(WORLD, WORLD)
    assert _bbox_contains(WORLD, WEST_HEMISPHERE)
    assert not _bbox_contains(WEST_HEMISPHERE, WORLD)
    assert _bbox_contains(FRANCE, FRANCE)
    assert _bbox_contains(WORLD, FRANCE)
    assert not _bbox_contains(FRANCE, WORLD)
    assert _bbox_contains(EUROPE, FRANCE)
    assert not _bbox_contains(FRANCE, EUROPE)


def test_extent_intersection_identity_and_nesting():
    assert _bbox_intersection(WORLD, WORLD) == WORLD
    assert _bbox_intersection(FRANCE, FRANCE) == FRANCE
    assert _bbox_intersection(FRANCE, WORLD) == FRANCE
    assert _bbox_intersection(WORLD, FRANCE) == FRANCE
    assert _bbox_intersection(FRANCE, EUROPE) == FRANCE
    assert _bbox_intersection(EUROPE, FRANCE) == FRANCE


def test_extent_shifted_overlap():
    france_shifted = bbox(-5 + 5, 40 + 5, 12 + 5, 51 + 5)
    assert _bbox_intersects(FRANCE, france_shifted)
    assert _bbox_intersects(france_shifted, FRANCE)
    assert not _bbox_contains(FRANCE, france_shifted)
    assert not _bbox_contains(france_shifted, FRANCE)


def test_extent_antimeridian_nz_vs_world():
    assert _bbox_contains(NZ, NZ)
    assert _bbox_contains(WORLD, NZ)
    assert _bbox_intersects(NZ, WORLD)
    assert _bbox_intersects(WORLD, NZ)
    assert not _bbox_contains(NZ, WORLD)
    assert not _bbox_contains(NZ, FRANCE)
    assert not _bbox_contains(FRANCE, NZ)
    assert not _bbox_intersects(NZ, FRANCE)
    assert not _bbox_intersects(FRANCE, NZ)
    assert _bbox_intersection(NZ, WORLD) == NZ
    assert _bbox_intersection(WORLD, NZ) == NZ
    assert _bbox_intersection(NZ, FRANCE) is None
    assert _bbox_intersection(FRANCE, NZ) is None


def test_extent_antimeridian_disjoint_latitudes():
    bbox_antimeridian_north = bbox(155.0, 10.0, -170.0, 30.0)
    assert not _bbox_contains(NZ, bbox_antimeridian_north)
    assert not _bbox_contains(bbox_antimeridian_north, NZ)
    assert not _bbox_intersects(NZ, bbox_antimeridian_north)
    assert not _bbox_intersects(bbox_antimeridian_north, NZ)
    assert _bbox_intersection(NZ, bbox_antimeridian_north) is None
    assert _bbox_intersection(bbox_antimeridian_north, NZ) is None


def test_extent_antimeridian_halves():
    nz_pos_long = bbox(155.0, -60.0, 180.0, -25.0)
    assert _bbox_contains(NZ, nz_pos_long)
    assert not _bbox_contains(nz_pos_long, NZ)
    assert _bbox_intersects(NZ, nz_pos_long)
    assert _bbox_intersects(nz_pos_long, NZ)
    assert _bbox_intersection(NZ, nz_pos_long) == nz_pos_long
    assert _bbox_intersection(nz_pos_long, NZ) == nz_pos_long

    nz_neg_long = bbox(-180.0, -60.0, -170.0, -25.0)
    assert _bbox_contains(NZ, nz_neg_long)
    assert not _bbox_contains(nz_neg_long, NZ)
    assert _bbox_intersects(NZ, nz_neg_long)
    assert _bbox_intersects(nz_neg_long, NZ)
    assert _bbox_intersection(NZ, nz_neg_long) == nz_neg_long
    assert _bbox_intersection(nz_neg_long, NZ) == nz_neg_long


def test_extent_crossing_vs_crossing():
    nz_smaller = bbox(160, -55.0, -175.0, -30.0)
    assert _bbox_contains(NZ, nz_smaller)
    assert not _bbox_contains(nz_smaller, NZ)

    nz_pos_long_shifted_west = bbox(150.0, -60.0, 175.0, -25.0)
    assert not _bbox_contains(NZ, nz_pos_long_shifted_west)
    assert not _bbox_contains(nz_pos_long_shifted_west, NZ)
    assert _bbox_intersects(NZ, nz_pos_long_shifted_west)
    assert _bbox_intersects(nz_pos_long_shifted_west, NZ)

    nz_smaller_shifted = bbox(165, -60.0, -170.0, -25.0)
    assert not _bbox_contains(nz_smaller, nz_smaller_shifted)
    assert not _bbox_contains(nz_smaller_shifted, nz_smaller)
    assert _bbox_intersects(nz_smaller, nz_smaller_shifted)
    assert _bbox_intersects(nz_smaller_shifted, nz_smaller)

    nz_shifted = bbox(165.0, -60.0, -160.0, -25.0)
    assert _bbox_intersection(NZ, nz_shifted) == bbox(165, -60.0, -170.0, -25.0)
    assert _bbox_intersection(NZ, nz_smaller) == nz_smaller
    assert _bbox_intersection(nz_smaller, NZ) == nz_smaller


def test_extent_larger_part_wins():
    # crossing ∩ normal keeps the LARGER split part (metadata.cpp:412-425)
    world_smaller = bbox(-179, -90, 179, 90)
    assert not _bbox_contains(world_smaller, NZ)
    assert not _bbox_contains(NZ, world_smaller)
    assert _bbox_intersection(NZ, world_smaller) == bbox(155, -60, 179, -25)
    assert _bbox_intersection(world_smaller, NZ) == bbox(155, -60, 179, -25)

    world_smaller_east = bbox(-179, -90, 150, 90)
    assert not _bbox_contains(world_smaller_east, NZ)
    assert not _bbox_contains(NZ, world_smaller_east)
    got = _bbox_intersection(NZ, world_smaller_east)
    assert got == bbox(-179, -60, -170, -25)
    assert got[1] == -179 and got[3] == -170
    assert _bbox_intersection(world_smaller_east, NZ) == bbox(-179, -60, -170, -25)

    east_hemisphere = bbox(0, -90, 180, 90)
    assert _bbox_intersection(east_hemisphere, NZ) == \
        bbox(155.0, -60.0, 180.0, -25.0)

    minus_180_to_156 = bbox(-180, -90, 156, 90)
    assert _bbox_intersection(minus_180_to_156, NZ) == \
        bbox(-180.0, -60.0, -170.0, -25.0)


def test_pseudo_area_weighting():
    # getPseudoArea: lon span × ∫cos(lat); a polar band weighs less than
    # an equatorial band of the same degree extent
    eq = _bbox_area(bbox(0, -10, 10, 10))
    polar = _bbox_area(bbox(0, 70, 10, 90))
    assert eq > polar > 0
    assert math.isclose(_bbox_area(WORLD), 360.0 * 2.0)


# --- test_datum.cpp numeric vectors ----------------------------------------


def test_ellipsoid_from_inverse_flattening():
    # test_datum.cpp:93-128: a=6378137 rf=298.257223563 (WGS84)
    f = 1.0 / 298.257223563
    ell = Ellipsoid(a=6378137.0, es=f * (2 - f), f=f).derive()
    assert abs(ell.b - 6356752.31424518) < 1e-9
    assert abs(ell.rf - 298.257223563) < 1e-9
    assert not ell.is_sphere


def test_ellipsoid_from_semi_minor_axis():
    # test_datum.cpp:143-174: two-axis a/b -> computed rf
    a, b = 6378137.0, 6356752.31424518
    f = (a - b) / a
    ell = Ellipsoid(a=a, es=f * (2 - f), b=b, f=f).derive()
    assert abs(ell.rf - 298.257223563) < 1e-10


def test_ellipsoid_sphere():
    # test_datum.cpp:61-80: sphere has b == a, zero flattening
    ell = Ellipsoid(a=6378137.0, es=0.0).derive()
    assert ell.is_sphere
    assert ell.b == ell.a
    assert ell.f == 0.0


def test_ellipsoid_proj_string_emission():
    # test_datum.cpp:294-315 (ellipsoid_to_PROJString)
    assert _ellps_tokens_ab(6378137.0, 298.257223563) == ["+ellps=WGS84"]
    assert _ellps_tokens_ab(6378137.0, 298.257222101) == ["+ellps=GRS80"]
    assert _ellps_tokens_ab(10000.0, 0.5) == ["+a=10000", "+rf=0.5"]
    assert _ellps_tokens_ab(10000.0, 0.0, 5000.0) == ["+a=10000", "+b=5000"]
    # sphere -> +R (test_datum.cpp:61-80 expects "+R=6378137")
    assert _ellps_tokens_ab(6378137.0, 0.0) == ["+R=6378137"]
    # the pj_ellps "sphere" entry (a=b=6370997) is recognized by name
    assert _ellps_tokens_ab(6370997.0, 0.0) == ["+ellps=sphere"]


def test_prime_meridian_wellknown():
    # test_datum.cpp:175-205 (prime_meridian_to_PROJString)
    assert _pm_wellknown_name(2.5969213 * 0.9) == "paris"  # 2.5969213 grad
    assert _pm_wellknown_name(2.337229166666667) == "paris"
    assert _pm_wellknown_name(3.5) is None
    assert _pm_wellknown_name(90.0) is None  # 100 grad -> numeric +pm=90


def test_wkt_paris_pm_round_trip():
    # a WKT GEOGCRS on the Paris meridian emits +pm=paris (named), and
    # +R= spheres parse back through resolve_ellipsoid
    wkt = (
        'GEOGCRS["NTF (Paris)",'
        'DATUM["Nouvelle Triangulation Francaise (Paris)",'
        'ELLIPSOID["Clarke 1880 (IGN)",6378249.2,293.4660212936269,'
        'LENGTHUNIT["metre",1]]],'
        'PRIMEM["Paris",2.5969213,ANGLEUNIT["grad",0.015707963267949]],'
        'CS[ellipsoidal,2],'
        'AXIS["latitude",north,ORDER[1],ANGLEUNIT["grad",0.015707963267949]],'
        'AXIS["longitude",east,ORDER[2],ANGLEUNIT["grad",0.015707963267949]]]'
    )
    pstr = from_wkt(wkt)
    assert "+pm=paris" in pstr
    assert "+ellps=clrk80ign" in pstr

    ell = resolve_ellipsoid(Params.parse("+proj=longlat +R=6371000"))
    assert ell.is_sphere and ell.a == 6371000.0
