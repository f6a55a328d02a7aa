"""WKT2:2019 emission (rayproj/core/wkt.py vs the WKTFormatter surface
of reference src/iso19111/io.cpp for proj-string-expressible CRSs)."""

from rayproj.core.factory import create_operation
from rayproj.core.wkt import pretty, to_wkt2


def test_geogcrs_wgs84_plain():
    wkt = to_wkt2(create_operation("+proj=longlat +datum=WGS84"))
    assert wkt.startswith('GEOGCRS["unknown"')
    assert 'DATUM["World Geodetic System 1984"' in wkt
    assert 'ELLIPSOID["WGS 84",6378137,298.257223563' in wkt
    # zero towgs84 must NOT produce a BOUNDCRS wrapper
    assert "BOUNDCRS" not in wkt
    assert 'AXIS["geodetic latitude (Lat)",north,ORDER[1]' in wkt


def test_projcrs_utm():
    from rayproj.cli import _expand_crs_tokens

    defn = " ".join(_expand_crs_tokens(["EPSG:32632"]))
    wkt = to_wkt2(create_operation(defn))
    assert 'METHOD["Transverse Mercator"]' in wkt
    assert 'PARAMETER["Longitude of natural origin",9,' in wkt
    assert 'PARAMETER["Scale factor at natural origin",0.9996,' in wkt
    assert 'PARAMETER["False easting",500000,' in wkt
    assert "CS[Cartesian,2]" in wkt


def test_boundcrs_towgs84_seven_param():
    wkt = to_wkt2(
        create_operation(
            "+proj=longlat +ellps=bessel "
            "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7"
        )
    )
    assert wkt.startswith("BOUNDCRS[")
    assert 'METHOD["Position Vector transformation (geog2D domain)"]' in wkt
    assert 'PARAMETER["X-axis translation",598.1]' in wkt
    assert 'PARAMETER["Scale difference",6.7]' in wkt
    assert 'ELLIPSOID["bessel",6377397.155,299.1528128' in wkt


def test_lcc_method_mapping():
    wkt = to_wkt2(
        create_operation(
            "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96 "
            "+ellps=GRS80"
        )
    )
    assert 'METHOD["Lambert Conic Conformal (2SP)"]' in wkt
    assert 'PARAMETER["Latitude of 1st standard parallel",33,' in wkt
    assert 'PARAMETER["Latitude of 2nd standard parallel",45,' in wkt
    assert 'ELLIPSOID["GRS 1980"' in wkt


def test_unmappable_op_escape_hatch():
    # io.cpp exports non-CRS-mappable operations as a PROJ-based method
    wkt = to_wkt2(create_operation("+proj=eck4 +ellps=WGS84"))
    assert "PROJ-based operation method:" in wkt
    assert "+proj=eck4" in wkt


def test_pretty_roundtrip_structure():
    wkt = to_wkt2(create_operation("+proj=longlat +datum=WGS84"))
    p = pretty(wkt)
    # pretty only inserts newlines/indentation; stripping recovers input
    assert "".join(line.strip() for line in p.splitlines()) == wkt
    assert p.splitlines()[1].startswith("    DATUM[")
