"""sch (vectors from the reference's test/cli/testvarious +
tv_out.dist:395-407) and xyzgridshift (exercised in full by
test/gie/geotiff_grids.gie via the corpus test; here: basic
direct/iterative consistency)."""

import numpy as np
import pytest

import rayproj.core.resources as resources
from rayproj.core.constants import DEG_TO_RAD
from rayproj.core.factory import create_operation
from rayproj.core.op import FWD, INV, Coords

SCH = "+proj=sch +ellps=WGS84 +plat_0=30.0 +plon_0=45.0 +phdg_0=-12.0"


def test_sch_forward_testvarious():
    op = create_operation(SCH)
    lons = np.array([0.0, 0.0, 45.0, 45.1, 44.9, 30.0]) * DEG_TO_RAD
    lats = np.array([0.0, 90.0, 45.0, 44.9, 45.1, 45.0]) * DEG_TO_RAD
    c = Coords(lons, lats, np.zeros(6))
    op.trans(FWD, c)
    exp = np.array(
        [
            [-1977112.0305592, 5551475.1418378, 6595.7256583],
            [6618337.9734775, -1152927.4060894, 10055.1157181],
            [1630035.5650122, -342353.6396475, 128.3445654],
            [1617547.4295637, -347855.9734973, 125.4645102],
            [1642526.7453121, -336878.8571851, 131.3265616],
            [1974596.2356203, 787409.8217445, 773.0028577],
        ]
    )
    assert np.abs(np.c_[c.x, c.y, c.z] - exp).max() < 1e-4


def test_sch_inverse_testvarious():
    op = create_operation(SCH)
    c = Coords(np.array([0.0, 0.0, 1000.0, 1000.0]),
               np.array([0.0, 1000.0, 0.0, 1000.0]),
               np.array([2.0, 0.0, 0.0, 0.0]))
    op.trans(INV, c)
    exp = np.array(
        [
            [45.0, 30.0, 2.0],
            [44.989863, 29.998124, -0.000362],
            [44.997845, 30.008824, 0.0],
            [44.987707, 30.006948, -0.000523],
        ]
    )
    got = np.c_[c.x / DEG_TO_RAD, c.y / DEG_TO_RAD, c.z]
    assert np.abs(got[:, :2] - exp[:, :2]).max() < 1e-6
    assert np.abs(got[:, 2] - exp[:, 2]).max() < 1e-5


def test_sch_roundtrip():
    op = create_operation(SCH + " +h_0=7000")
    lon = np.linspace(42, 48, 9) * DEG_TO_RAD
    lat = np.linspace(27, 33, 9) * DEG_TO_RAD
    h = np.linspace(-100, 3000, 9)
    c = Coords(lon.copy(), lat.copy(), h.copy())
    op.trans(FWD, c)
    op.trans(INV, c)
    assert np.abs(c.x - lon).max() * 6.4e6 < 1e-6
    assert np.abs(c.y - lat).max() * 6.4e6 < 1e-6
    assert np.abs(c.z - h).max() < 1e-6


GRID = "/root/reference/data/tests/subset_of_gr3df97a.tif"


@pytest.mark.skipif(not __import__("os").path.exists(GRID), reason="grid not present")
def test_xyzgridshift_lambe_to_lamb93():
    # the geotiff_grids.gie:336-353 IGNF:LAMBE->IGNF:LAMB93 pipeline
    resources.add_search_path("/root/reference/data/tests")
    op = create_operation(
        "+proj=pipeline"
        " +step +inv +proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0"
        " +k_0=0.99987742 +x_0=600000 +y_0=2200000 +ellps=clrk80ign +pm=paris"
        " +step +proj=push +v_3"
        " +step +proj=cart +ellps=clrk80ign"
        " +step +proj=xyzgridshift +grids=subset_of_gr3df97a.tif"
        " +grid_ref=output_crs +ellps=GRS80"
        " +step +proj=cart +ellps=GRS80 +inv"
        " +step +proj=pop +v_3"
        " +step +proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44"
        " +x_0=700000 +y_0=6600000 +ellps=GRS80"
    )
    c = Coords(np.array([814149.529]), np.array([1887019.768]), np.array([0.0]))
    op.trans(FWD, c)
    assert np.hypot(c.x[0] - 860690.804, c.y[0] - 6319036.849) < 1e-3
    op.trans(INV, c)
    assert np.hypot(c.x[0] - 814149.529, c.y[0] - 1887019.768) < 1e-3
