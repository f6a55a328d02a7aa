"""Byte-parity replay of the reference's testprojinfo corpus —
describe subset.

The reference's test/cli/testprojinfo script drives projinfo over EPSG
codes and object names and compares against testprojinfo_out.dist. The
operation-SEARCH sections (-s/-t createOperations ranking) are engine-
format here by design; every describe-style section (single CRS /
ellipsoid / datum / operation lookups, all -o formats, --3d promotion,
deprecation warnings) is replayed below and must match byte-for-byte.

Reference: test/cli/testprojinfo:28-200, testprojinfo_out.dist.
"""

from __future__ import annotations

import io
import re
import sys

import pytest

from rayproj import cli
from rayproj.state import projdb

pytestmark = pytest.mark.skipif(
    not projdb.available(), reason="EPSG sql scripts not available")

DIST = "/root/reference/test/cli/testprojinfo_out.dist"


def _run(argv: list[str]) -> str:
    old_out = sys.stdout
    sys.stdout = io.StringIO()
    try:
        rc = cli.main(["projinfo"] + argv)
        out = sys.stdout.getvalue()
    finally:
        sys.stdout = old_out
    assert rc == 0
    return out


def _section(title: str) -> str:
    """Expected bytes between the echoed `title` line and the blank
    line the driver script writes before the next section."""
    txt = open(DIST).read()
    m = re.search(re.escape(title) + r"\n(.*?)\n\nTesting ", txt, re.S)
    if m is None:  # last section
        m = re.search(re.escape(title) + r"\n(.*?)\n$", txt, re.S)
    assert m is not None, title
    return m.group(1)


DESCRIBE_CASES = [
    ("Testing projinfo EPSG:4326", ["EPSG:4326"]),
    ("Testing projinfo -o WKT1_GDAL EPSG:4326",
     ["-o", "WKT1_GDAL", "EPSG:4326"]),
    ("Testing projinfo -o WKT2_2015 EPSG:4326",
     ["-o", "WKT2_2015", "EPSG:4326"]),
    ("Testing projinfo -o WKT2_2019 EPSG:4326",
     ["-o", "WKT2_2019", "EPSG:4326"]),
    ("Testing projinfo -o ALL EPSG:4326", ["-o", "ALL", "EPSG:4326"]),
    ("Testing projinfo -s EPSG:4326 -t EPSG:32631 --single-line",
     ["-s", "EPSG:4326", "-t", "EPSG:32631", "--single-line"]),
    ("Testing deprecated CRS: projinfo EPSG:26591", ["EPSG:26591"]),
    ("Testing non compliant WKT1",
     ['GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
      '298.257223563]],UNIT["degree",0.0174532925199433]]']),
    ("Testing CRS with towgs84: projinfo -o PROJ EPSG:25832",
     ["-o", "PROJ", "EPSG:25832"]),
    ("Testing EPSG:32631 --3d", ["EPSG:32631", "--3d"]),
    ("Testing -k ellipsoid WGS84", ["-k", "ellipsoid", "WGS84"]),
    ("Testing -k ellipsoid EPSG:7030", ["-k", "ellipsoid", "EPSG:7030"]),
    ("Testing -k datum WGS84", ["-k", "datum", "WGS84"]),
    ("Testing -k datum EPSG:6326", ["-k", "datum", "EPSG:6326"]),
    ("Testing -k operation EPSG:8457 -o PROJ -q",
     ["-k", "operation", "EPSG:8457", "-o", "PROJ", "-q"]),
    ("Testing D_WGS_1984", ["D_WGS_1984"]),
    ("Testing -k datum D_WGS_1984", ["-k", "datum", "D_WGS_1984"]),
    ("Testing projinfo -s NAD27 -t NAD83", ["-s", "NAD27", "-t", "NAD83"]),
    ("Testing projinfo -s NAD27 -t NAD83 --grid-check none "
     "--spatial-test intersects --summary --hide-ballpark",
     ["-s", "NAD27", "-t", "NAD83", "--grid-check", "none",
      "--spatial-test", "intersects", "--summary", "--hide-ballpark"]),
    ("Testing projinfo -s NAD27 -t NAD83 --grid-check none "
     "--spatial-test intersects",
     ["-s", "NAD27", "-t", "NAD83", "--grid-check", "none",
      "--spatial-test", "intersects"]),
    ("Testing -s EPSG:32631 -t EPSG:4326+3855 --summary",
     ["-s", "EPSG:32631", "-t", "EPSG:4326+3855", "--summary"]),
    ("Testing -s EPSG:32631 -t EPSG:4326+3855 --3d --summary",
     ["-s", "EPSG:32631", "-t", "EPSG:4326+3855", "--3d", "--summary"]),
    ("Testing -s EPSG:4936 -t EPSG:4978 --spatial-test intersects "
     "--summary where WGS 84 to ETRS89 (2) uses a transformation method "
     "not supported by PROJ currently (time-specific Helmert), and thus "
     "must be sorted last",
     ["-s", "EPSG:4936", "-t", "EPSG:4978",
      "--spatial-test", "intersects", "--summary"]),
    ("Testing projinfo -s EPSG:4230 -t EPSG:4258 "
     "--bbox 8,54.51,15.24,57.8 --summary",
     ["-s", "EPSG:4230", "-t", "EPSG:4258",
      "--bbox", "8,54.51,15.24,57.8", "--summary"]),
    ("Testing projinfo -s EPSG:4230 -t EPSG:4258 --area EPSG:3237 --summary",
     ["-s", "EPSG:4230", "-t", "EPSG:4258",
      "--area", "EPSG:3237", "--summary"]),
    ("Testing projinfo -s EPSG:4230 -t EPSG:4258 --area "
     "'Denmark - onshore' --summary",
     ["-s", "EPSG:4230", "-t", "EPSG:4258",
      "--area", "Denmark - onshore", "--summary"]),
    ("Testing projinfo -s EPSG:4230 -t EPSG:4258 --area "
     "'Denmark -' --summary",
     ["-s", "EPSG:4230", "-t", "EPSG:4258",
      "--area", "Denmark -", "--summary"]),
    ("Testing projinfo -s EPSG:4230 -t EPSG:4258 --area no_match --summary",
     ["-s", "EPSG:4230", "-t", "EPSG:4258",
      "--area", "no_match", "--summary"]),
    ("Testing projinfo -s EPSG:4230 -t EPSG:4258 --area WRONG:CODE "
     "--summary",
     ["-s", "EPSG:4230", "-t", "EPSG:4258",
      "--area", "WRONG:CODE", "--summary"]),
    ('Testing -s "GDA94" -t "WGS 84 (G1762)" --spatial-test intersects '
     "--summary. Should include transformations through ITRF2008 and "
     "GDA2020",
     ["-s", "GDA94", "-t", "WGS 84 (G1762)",
      "--spatial-test", "intersects", "--summary"]),
    ('Testing -s "AGD66" -t "WGS 84 (G1762)" --spatial-test intersects '
     "--summary. Should include a transformation through GDA2020",
     ["-s", "AGD66", "-t", "WGS 84 (G1762)",
      "--spatial-test", "intersects", "--summary"]),
    ("Testing -s EPSG:31467 -t ETRS89 --spatial-test intersects "
     "--grid-check none --bbox 8,48,9,49 --summary. Should include both "
     "DHDN to ETRS89 (8) and DHDN to ETRS89 (BWTA2017)",
     ["-s", "EPSG:31467", "-t", "ETRS89", "--spatial-test", "intersects",
      "--grid-check", "none", "--bbox", "8,48,9,49", "--summary"]),
    ('Testing -s "GDA94" -t "AHD height" --grid-check none -o PROJ '
     "--spatial-test intersects",
     ["-s", "GDA94", "-t", "AHD height", "--grid-check", "none",
      "-o", "PROJ", "--spatial-test", "intersects"]),
    ('Testing -s "GDA2020" -t "AHD height" --grid-check none -o PROJ '
     "--spatial-test intersects",
     ["-s", "GDA2020", "-t", "AHD height", "--grid-check", "none",
      "-o", "PROJ", "--spatial-test", "intersects"]),
    ("Testing RH2000 height to SWEREF99: projinfo -s EPSG:5613 "
     "-t EPSG:4977",
     ["-s", "EPSG:5613", "-t", "EPSG:4977"]),
    ("Testing NGF IGN69 height to RGF93: projinfo -s EPSG:5720 "
     "-t EPSG:4965 -o PROJ",
     ["-s", "EPSG:5720", "-t", "EPSG:4965", "-o", "PROJ"]),
    ("Testing NAD83(2011) + NAVD88 height -> NAD83(2011) : projinfo "
     "-s EPSG:6349 -t EPSG:6319 --spatial-test intersects -o PROJ",
     ["-s", "EPSG:6349", "-t", "EPSG:6319",
      "--spatial-test", "intersects", "-o", "PROJ"]),
    ("Testing -s +proj=longlat +datum=WGS84 +geoidgrids=@foo.gtx "
     "+type=crs -t EPSG:4326 -o PROJ -q",
     ["-s", "+proj=longlat +datum=WGS84 +geoidgrids=@foo.gtx +type=crs",
      "-t", "EPSG:4326", "-o", "PROJ", "-q"]),
    ("Testing -s NZGD2000 -t ITRF96 -o PROJ -q",
     ["-s", "NZGD2000", "-t", "ITRF96", "-o", "PROJ", "-q"]),
    ("Testing -s NZGD2000 -t ITRF97 -o PROJ -q",
     ["-s", "NZGD2000", "-t", "ITRF97", "-o", "PROJ", "-q"]),
    ("Testing -s NZGD2000 -t ITRF2000 -o PROJ -q",
     ["-s", "NZGD2000", "-t", "ITRF2000", "-o", "PROJ", "-q"]),
    ("Testing -s NZGD2000 -t ITRF2005 -o PROJ -q",
     ["-s", "NZGD2000", "-t", "ITRF2005", "-o", "PROJ", "-q"]),
    ("Testing -s NZGD2000 -t ITRF2008 -o PROJ -q",
     ["-s", "NZGD2000", "-t", "ITRF2008", "-o", "PROJ", "-q"]),
    ("Testing -s NZGD2000 -t ITRF2014 -o PROJ -q",
     ["-s", "NZGD2000", "-t", "ITRF2014", "-o", "PROJ", "-q"]),
    ('Testing -s "KKJ / Finland Uniform Coordinate System" -t "ETRS89 / '
     'TM35FIN(E,N)" --grid-check none -o PROJ -q',
     ["-s", "KKJ / Finland Uniform Coordinate System",
      "-t", "ETRS89 / TM35FIN(E,N)", "--grid-check", "none",
      "-o", "PROJ", "-q"]),
    ("Testing -s KKJ -t ETRS89 -o PROJ --grid-check none -q",
     ["-s", "KKJ", "-t", "ETRS89", "-o", "PROJ",
      "--grid-check", "none", "-q"]),
    ('Testing -s "KKJ + N43 height" -t "KKJ + N60 height" '
     "--grid-check none -o PROJ -q",
     ["-s", "KKJ + N43 height", "-t", "KKJ + N60 height",
      "--grid-check", "none", "-o", "PROJ", "-q"]),
    ('Testing -s "KKJ + N60 height" -t "KKJ + N2000 height" '
     "--grid-check none -o PROJ -q",
     ["-s", "KKJ + N60 height", "-t", "KKJ + N2000 height",
      "--grid-check", "none", "-o", "PROJ", "-q"]),
    ('Testing -s "KKJ + N43 height" -t "ETRS89 + N2000 height" '
     "--grid-check none -o PROJ -q",
     ["-s", "KKJ + N43 height", "-t", "ETRS89 + N2000 height",
      "--grid-check", "none", "-o", "PROJ", "-q"]),
    ('Testing -s "KKJ / Finland Uniform Coordinate System + N43 height" '
     '-t "ETRS89 / TM35FIN(E,N) + N2000 height" --grid-check none -o PROJ -q',
     ["-s", "KKJ / Finland Uniform Coordinate System + N43 height",
      "-t", "ETRS89 / TM35FIN(E,N) + N2000 height",
      "--grid-check", "none", "-o", "PROJ", "-q"]),
    ('Testing -s "ETRS89 / TM35FIN(E,N) + N2000 height" -t "KKJ / Finland '
     'Uniform Coordinate System + N43 height" --grid-check none -o PROJ -q',
     ["-s", "ETRS89 / TM35FIN(E,N) + N2000 height",
      "-t", "KKJ / Finland Uniform Coordinate System + N43 height",
      "--grid-check", "none", "-o", "PROJ", "-q"]),
]


@pytest.mark.parametrize("title,argv",
                         DESCRIBE_CASES, ids=[t for t, _ in DESCRIBE_CASES])
def test_projinfo_describe_byte_parity(title, argv):
    got = _run(argv).rstrip("\n")
    exp = _section(title).rstrip("\n")
    assert got == exp, f"\n--- expected ---\n{exp}\n--- got ---\n{got}"


def test_vertical_crs_wkt2_matches_embedded_golden():
    """EPSG:5613 VERTCRS: the corpus embeds its exact WKT2 inside the
    RH2000→SWEREF99 COORDINATEOPERATION (testprojinfo_out.dist:936-944);
    dedented, our standalone emit must reproduce it byte-for-byte (the
    standalone form adds USAGE/ID, which operations suppress)."""
    from rayproj.state import dbcrs

    got = dbcrs.to_wkt2(dbcrs.load_crs("EPSG", "5613"), "2019")
    golden = (
        'VERTCRS["RH2000 height",\n'
        "    DYNAMIC[\n"
        "        FRAMEEPOCH[2000]],\n"
        '    VDATUM["Rikets hojdsystem 2000"],\n'
        "    CS[vertical,1],\n"
        '        AXIS["gravity-related height (H)",up,\n'
        '            LENGTHUNIT["metre",1]],'
    )
    assert got.startswith(golden)
    assert got.endswith('ID["EPSG",5613]]')


def test_compound_crs_describe():
    from rayproj.state import dbcrs

    c = dbcrs.load_crs("EPSG", "3901")
    w = dbcrs.to_wkt2(c, "2019")
    assert w.startswith(
        'COMPOUNDCRS["KKJ / Finland Uniform Coordinate System + N60 height"')
    # component IDs suppressed under the identified top (io.cpp rule)
    assert 'ID["EPSG",2393]' not in w
    assert w.rstrip().endswith('ID["EPSG",3901]]')
    # nested BASEGEOGCRS id still prints (crs.cpp:3437 special case)
    assert 'ID["EPSG",4123]' in w
    j = dbcrs.to_projjson(c)
    assert j["type"] == "CompoundCRS" and len(j["components"]) == 2
    assert j["components"][1]["type"] == "VerticalCRS"


def test_towgs84_coordinate_frame_sign_flip():
    """EPSG:4673 (CHI1979→WGS84 is a single Coordinate Frame rotation):
    +towgs84 is position-vector, so rotation signs flip
    (coordinateoperation.cpp getTOWGS84Parameters invertRotSigns)."""
    from rayproj.state import dbcrs

    t = dbcrs._towgs84_7("EPSG", "4673")
    assert t == "+towgs84=174.05,-25.49,112.57,0,0,0.554,0.2263"


def test_promote_to_3d_uses_db_counterpart_identity():
    from rayproj.state import dbcrs

    p = dbcrs.promote_to_3d(dbcrs.load_crs("EPSG", "4326"))
    assert p["code"] == "4979" and p["cs"]["dim"] == 3
    # the 3D object's OWN usage, not 4326's
    assert p["usages"][0]["scope"].startswith("Geodesy. Navigation")


def test_promote_to_3d_synthesizes_without_counterpart():
    from rayproj.state import dbcrs

    p = dbcrs.promote_to_3d(dbcrs.load_crs("EPSG", "4277"))  # OSGB36
    assert "code" not in p and p["cs"]["dim"] == 3
    assert p["remark"] == "Promoted to 3D from EPSG:4277"
    assert p["cs"]["axes"][2]["name"] == "Ellipsoidal height"


def test_prime_meridian_keeps_native_unit():
    from rayproj.state import dbcrs

    w = dbcrs.to_wkt2(dbcrs.load_crs("EPSG", "4807"), "2019")  # NTF (Paris)
    assert 'PRIMEM["Paris",2.5969213,' in w
    assert 'ANGLEUNIT["grad",' in w
