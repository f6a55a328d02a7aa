"""CLI argv robustness fuzz: random flag/definition/stdin combinations
through ``cli.main`` for every subcommand. The reference apps exit with
a usage message or an error line on malformed invocations (emess /
usage paths in apps/proj.cpp, apps/cs2cs.cpp); they never crash. The
engine contract here: ``main`` returns an int or raises SystemExit —
any other exception is an unhandled internal path."""

from __future__ import annotations

import io
import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rayproj import cli

FUZZ = settings(
    max_examples=int(os.environ.get("FUZZ_EXAMPLES", "150")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

_FLAGS = [
    "-I", "-E", "-r", "-s", "-t#", "-e", "junk", "-w4", "-W8", "-f",
    "%.4f", "%s", "-d", "4", "-3", "nan", "-m", "1:2", "-m", "junk",
    "-o", "wkt1", "-o", "nosuchformat", "-k", "--area", "junk",
    "--bbox", "1,2,3,4", "--bbox", "a,b", "-l", "-le", "-lu", "-lp",
    "-V", "-S", "--accuracy", "zz", "-z", "0", "--3d", "-v", "-",
    "--", "-q", "-x", "%", "-f%z",
]
_DEFN = [
    "+proj=merc", "+proj=utm", "+proj=latlong", "+proj=nosuch",
    "+ellps=WGS84", "+ellps=junk", "+zone=31", "+lat_0=nan",
    "+lat_1=inf", "+datum=NAD27", "+to", "EPSG:4326", "EPSG:32633",
    "EPSG:999999", "ESRI:102001", "NAD27", "NAD83", "WGS84",
    "+init=epsg:4326", "+init=zzz:1", "urn:ogc:def:crs:EPSG::4326",
    "+proj=pipeline", "+step", "+inv", "+towgs84=1,2,3", "🌍", "+",
    "", "+R=0", "+a=-1", "+es=2", "+proj=geod", "junk.gie",
]
_STDIN = [
    "", "\n", "2 1\n", "12d30'W 45N\n", "abc def\n", "1e400 2\n",
    "90 91\n", "0 0 0 2020.5\n", "55N 12E\n12 34\n", "# comment\n1 2\n",
    "nan inf\n", "1 2 3 4 5 6 7\n", "-- --\n", "\x00\x01\n",
]


_GIE_LINES = [
    "<gie>", "</gie>", "operation +proj=merc +ellps=WGS84",
    "operation +proj=nosuch", "operation EPSG:4326", "operation",
    "accept 12 55", "accept nan inf", "accept 1 2 3 4 5 6 7",
    "expect 1335833.89 7326837.71", "expect failure", "accept",
    "expect failure errno invalid_op", "expect failure errno -99",
    "direction inverse", "direction forward", "direction sideways",
    "tolerance 10 cm", "tolerance junk", "tolerance -1 lightyears",
    "roundtrip 100", "roundtrip junk", "ignore pjd_err_failed_to_load_grid",
    "use_proj4_init_rules true", "require_grid nosuch.gsb", "echo hi",
    "skip", "verbose", "# comment", "", "banner 🌍", "expect 1e400 2",
    "<gie-strict>", "junk line with no tag", "operation +step +proj=axisswap",
]


@FUZZ
@given(st.data())
def test_gie_runner_never_crashes(data):
    """Corrupted / shuffled .gie content must produce a GieResult (with
    fail/skip counts), never an internal exception — the reference gie
    app reports bad records as errors and keeps going (gie.cpp
    dispatch/errmsg paths)."""
    import tempfile

    from rayproj.core.factory import create_operation
    from rayproj.testing.gie import run_gie_file

    n = data.draw(st.integers(min_value=0, max_value=15))
    lines = [data.draw(st.sampled_from(_GIE_LINES)) for _ in range(n)]
    with tempfile.NamedTemporaryFile(
            "w", suffix=".gie", delete=False) as f:
        f.write("\n".join(lines) + "\n")
        path = f.name
    try:
        res = run_gie_file(path, create_operation)
        assert res.ok >= 0 and res.failed >= 0
    finally:
        os.unlink(path)


@FUZZ
@given(st.data())
def test_cli_main_never_crashes(data):
    sub = data.draw(st.sampled_from(
        ["proj", "cs2cs", "cct", "geod", "projinfo", "gie"]))
    n = data.draw(st.integers(min_value=0, max_value=7))
    argv = [sub] + [data.draw(st.sampled_from(_FLAGS + _DEFN))
                    for _ in range(n)]
    stdin_text = data.draw(st.sampled_from(_STDIN))
    old_in, old_out, old_err = sys.stdin, sys.stdout, sys.stderr
    sys.stdin = io.StringIO(stdin_text)
    sys.stdout = io.StringIO()
    sys.stderr = io.StringIO()
    try:
        rc = cli.main(argv)
        assert isinstance(rc, int)
    except SystemExit:
        pass
    finally:
        sys.stdin, sys.stdout, sys.stderr = old_in, old_out, old_err
