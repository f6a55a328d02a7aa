"""Reference gie conformance corpus (SURVEY.md §5 layer 1).

Runs every .gie file from the reference's test corpus through our
engine. Assertions whose operators/grids we don't support yet are
counted as skips; any non-skip failure fails this test. The ok-floor
ratchets up as operator coverage grows.
"""

import glob
import os

import pytest

import rayproj.core.resources as resources
from rayproj import create_operation
from rayproj.testing.gie import GieResult, run_gie_file

GIE_DIR = "/root/reference/test/gie"
GIGS_DIR = "/root/reference/test/gigs"

# Floor on passing assertions — raise when adding operators.
# Round 2 final: full corpus measures 5,668 ok / 0 failed / 0 skipped.
MIN_OK_GIE = 5660


@pytest.fixture(scope="module", autouse=True)
def _data_paths(tmp_path_factory):
    resources.add_search_path("/root/reference/data")
    resources.add_search_path("/root/reference/data/tests")
    # the reference's test harness exposes downsampled grids under their
    # production names (data/CMakeLists.txt:98-99) — mirror that
    alias_dir = tmp_path_factory.mktemp("grid_aliases")
    for alias, target in (
        ("egm96_15.gtx", "/root/reference/data/tests/egm96_15_downsampled.gtx"),
        ("ntv2_0.gsb", "/root/reference/data/tests/ntv2_0_downsampled.gsb"),
    ):
        if os.path.exists(target):
            os.symlink(target, alias_dir / alias)
    resources.add_search_path(str(alias_dir))


@pytest.mark.skipif(not os.path.isdir(GIE_DIR), reason="reference corpus not present")
def test_gie_corpus():
    tot = GieResult()
    for path in sorted(glob.glob(os.path.join(GIE_DIR, "*.gie"))):
        tot.merge(run_gie_file(path, create_operation))
    assert tot.failed == 0, [
        (f.file.split("/")[-1], f.lineno, f.operation[:60], f.deviation)
        for f in tot.failures[:20]
    ]
    assert tot.skipped == 0
    assert tot.ok >= MIN_OK_GIE


@pytest.mark.skipif(not os.path.isdir(GIGS_DIR), reason="reference corpus not present")
def test_gigs_corpus():
    tot = GieResult()
    for path in sorted(glob.glob(os.path.join(GIGS_DIR, "*.gie"))):
        tot.merge(run_gie_file(path, create_operation))
    assert tot.failed == 0, [
        (f.file.split("/")[-1], f.lineno, f.operation[:60], f.deviation)
        for f in tot.failures[:20]
    ]
    # full pass with the bundled EPSG catalog (rayproj/data/epsg):
    # 1062 assertions, 0 skips
    assert tot.skipped == 0
    assert tot.ok >= 1060
