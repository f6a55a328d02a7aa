"""Ports of the reference's small unit-vector suites.

- pj_phi2_test.cpp (Basic + AvoidUndefinedBehavior): inverse isometric
  latitude including the IEEE-propagation edge lanes.
- proj_errno_string_test.cpp: pj_strerrno / proj_errno_string semantics.
- proj_angular_io_test.cpp: angular/degree IO classification through
  bare operations and pipelines.
- gie_self_tests.cpp io_predicates + rtodms/dmstor vectors and the
  unitconvert_selftest time-unit vectors.

No Ray needed — these are pure-kernel / plan-time checks.
"""

import math
import os

import numpy as np
import pytest

from rayproj.core.errors import strerrno
from rayproj.core.factory import create_operation
from rayproj.core.op import FWD, INV
from rayproj.mathx import phi2

NAN = float("nan")
INF = float("inf")


def _phi2(ts, e):
    r, _ = phi2(np.array([ts], dtype=np.float64), e)
    return float(r[0])


class TestPjPhi2:
    """pj_phi2_test.cpp:39-63 (Basic)."""

    def test_basic(self):
        assert _phi2(0.0, 0.0) == math.pi / 2
        assert abs(_phi2(1.0, 0.0)) <= 1e-16
        assert _phi2(0.0, 1.0) == math.pi / 2
        assert _phi2(-1.0, 0.0) == math.pi
        assert _phi2(0.0, -1.0) == math.pi / 2
        assert abs(_phi2(1.0, 1.0)) <= 1e-16
        assert _phi2(-1.0, -1.0) == math.pi
        assert _phi2(math.pi, 0.0) == pytest.approx(
            -0.95445818456292697, abs=5e-16)
        assert math.isnan(_phi2(0.0, math.pi))
        assert _phi2(-math.pi, 0.0) == pytest.approx(
            4.0960508381527205, abs=1e-15)
        assert math.isnan(_phi2(0.0, -math.pi))
        assert math.isnan(_phi2(math.pi, math.pi))
        assert math.isnan(_phi2(-math.pi, -math.pi))

    def test_avoid_undefined_behavior(self):
        """pj_phi2_test.cpp:65-84: nan/inf lanes must propagate exactly
        as the C loop does (pow(nan, 0) == 1)."""
        assert math.isnan(_phi2(NAN, 0.0))
        assert math.isnan(_phi2(0.0, NAN))
        assert math.isnan(_phi2(NAN, NAN))
        assert _phi2(INF, 0.0) == -math.pi / 2
        assert math.isnan(_phi2(0.0, INF))
        assert _phi2(-INF, 0.0) == pytest.approx(
            4.7123889803846897, abs=1e-15)
        assert math.isnan(_phi2(0.0, -INF))
        assert math.isnan(_phi2(INF, INF))
        assert math.isnan(_phi2(-INF, -INF))

    def test_no_warning_leak(self):
        """Non-finite lanes must not leak numpy RuntimeWarnings."""
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            phi2(np.array([INF, -INF, NAN, 0.5]), 0.0818191908426215)


class TestProjErrnoString:
    """proj_errno_string_test.cpp:37-69."""

    def test_no_error(self):
        assert strerrno(0) is None

    def test_proj_errnos(self):
        assert strerrno(-1) == "no arguments in initialization list"
        assert strerrno(-1000) == "invalid projection system error (-1000)"
        assert strerrno(-9999) == "invalid projection system error (-9999)"
        # for errnos < -9999, -9999 is always reported
        assert strerrno(-(2 ** 31)) == \
            "invalid projection system error (-9999)"
        assert strerrno(-10000) == "invalid projection system error (-9999)"

    def test_table_entries(self):
        assert strerrno(-5) == "unknown projection id"
        assert strerrno(-14) == "latitude or longitude exceeded limits"
        assert strerrno(-38) == "failed to load datum shift file"
        assert strerrno(-62) == "network error"
        assert strerrno(-36) == ""  # retired slot stays addressable

    def test_system_errnos(self):
        # HAVE_STRERROR branch: defer to the platform strerror
        assert strerrno(5) == os.strerror(5)
        assert strerrno(9999) == os.strerror(9999)
        assert strerrno(10000) == os.strerror(10000)
        assert strerrno(2 ** 31 - 1) == os.strerror(2 ** 31 - 1)


class TestAngularUnits:
    """proj_angular_io_test.cpp:36-116."""

    def test_basic(self):
        P = create_operation("proj=latlong")
        assert P.angular_input(FWD)
        assert P.angular_output(FWD)
        assert P.angular_input(INV)
        assert P.angular_output(INV)

    def test_pipelines(self):
        P = create_operation(
            "proj=pipeline +step +proj=axisswap +order=2,1 +step "
            "+proj=latlong +step +proj=axisswap +order=2,1")
        assert P.angular_input(FWD)
        assert P.angular_output(FWD)
        assert P.angular_input(INV)
        assert P.angular_output(INV)

    def test_pipelines2(self):
        P = create_operation(
            "+proj=pipeline "
            "+step +proj=axisswap +order=2,1 "
            "+step +proj=unitconvert +xy_in=deg +xy_out=rad "
            "+step +proj=tmerc +lat_0=0 +lon_0=-81 +k=0.9996 "
            "+x_0=500000.001016002 +y_0=0 +ellps=WGS84 "
            "+step +proj=axisswap +order=2,1 "
            "+step +proj=unitconvert +xy_in=m +z_in=m "
            "+xy_out=us-ft +z_out=us-ft")
        assert not P.angular_input(FWD)
        assert not P.angular_output(FWD)

    def test_pipelines3(self):
        P = create_operation(
            "+proj=pipeline "
            "+step +proj=axisswap +order=2,1 "
            "+step +proj=tmerc +lat_0=0 +lon_0=-81 +k=0.9996 "
            "+x_0=500000.001016002 +y_0=0 +ellps=WGS84 "
            "+step +proj=axisswap +order=2,1 "
            "+step +proj=unitconvert +xy_in=m +z_in=m "
            "+xy_out=us-ft +z_out=us-ft")
        assert P.angular_input(FWD)
        assert not P.angular_output(FWD)

    def test_degrees(self):
        P = create_operation(
            "+proj=pipeline "
            "+step +inv +proj=utm +zone=32 +ellps=GRS80 "
            "+step +proj=unitconvert +xy_in=rad +xy_out=deg")
        assert not P.degree_input(FWD)
        assert P.degree_input(INV)
        assert P.degree_output(FWD)
        assert not P.degree_output(INV)


class TestIoPredicates:
    """gie_self_tests.cpp:462-535 io_predicates, plus the rtodms/dmstor
    vectors from info_functions (gie_self_tests.cpp:410-422)."""

    def test_cart_angular_in_linear_out(self):
        P = create_operation("+proj=cart +ellps=GRS80")
        assert P.angular_input(FWD)
        assert not P.angular_input(INV)
        assert not P.angular_output(FWD)
        assert P.angular_output(INV)
        P.inverted = True
        assert not P.angular_input(FWD)
        assert P.angular_input(INV)
        assert P.angular_output(FWD)
        assert not P.angular_output(INV)

    def test_molodensky_angular_in_and_out(self):
        P = create_operation(
            "+proj=molodensky +a=6378160 +rf=298.25 "
            "+da=-23 +df=-8.120449e-8 +dx=-134 +dy=-48 +dz=149 +abridged")
        for inverted in (False, True):
            P.inverted = inverted
            assert P.angular_input(FWD)
            assert P.angular_input(INV)
            assert P.angular_output(FWD)
            assert P.angular_output(INV)

    def test_helmert_linear_in_and_out_grs80_default(self):
        P = create_operation(
            "+proj=helmert"
            " +x=0.0127 +y=0.0065 +z=-0.0209 +s=0.00195"
            " +rx=-0.00039 +ry=0.00080 +rz=-0.00114"
            " +dx=-0.0029 +dy=-0.0002 +dz=-0.0006 +ds=0.00001"
            " +drx=-0.00011 +dry=-0.00019 +drz=0.00007"
            " +t_epoch=1988.0 +convention=coordinate_frame")
        for inverted in (False, True):
            P.inverted = inverted
            assert not P.angular_input(FWD)
            assert not P.angular_input(INV)
            assert not P.angular_output(FWD)
            assert not P.angular_output(INV)
        # pj_init_ctx defaults to GRS80
        assert P.ell.a == 6378137.0
        assert P.ell.f == 1.0 / 298.257222101

    def test_nan_propagation(self):
        import numpy as np

        from rayproj.core.op import Coords

        P = create_operation("+proj=merc +ellps=WGS84")
        for direction in (FWD, INV):
            c = Coords(np.array([NAN]), np.array([NAN]), np.array([NAN]),
                       np.array([NAN]), np.zeros(1, dtype=np.int32))
            r = P.trans(direction, c)
            assert math.isnan(r.x[0]) and math.isnan(r.y[0])
            assert math.isnan(r.z[0]) and math.isnan(r.t[0])

    def test_rtodms_dmstor_roundtrip(self):
        from rayproj.core.dms import dmstor_prefix, rtodms

        s = rtodms(math.pi, "N", "S")
        assert s == "180dN"
        assert dmstor_prefix(s)[0] == math.pi
        s = rtodms(-2.0, "N", "S")
        assert s == "114d35'29.612\"S"
        assert dmstor_prefix(s)[0] == pytest.approx(-2.0, abs=1e-7)


class TestUnitconvertTime:
    """gie_self_tests.cpp:558-580 unitconvert_selftest (test_time)."""

    @pytest.mark.parametrize("args,t_in,t_exp", [
        ("+proj=unitconvert +t_in=decimalyear +t_out=decimalyear",
         2004.25, 2004.25),
        ("+proj=unitconvert +t_in=gps_week +t_out=gps_week",
         1782.0, 1782.0),
        ("+proj=unitconvert +t_in=mjd +t_out=mjd", 57390.0, 57390.0),
        ("+proj=unitconvert +t_in=gps_week +t_out=decimalyear",
         1877.71428, 2016.0),
        ("+proj=unitconvert +t_in=yyyymmdd +t_out=yyyymmdd",
         20170131, 20170131),
    ])
    def test_time(self, args, t_in, t_exp):
        import numpy as np

        from rayproj.core.op import Coords

        P = create_operation(args)
        c = Coords(np.array([0.0]), np.array([0.0]), np.array([0.0]),
                   np.array([float(t_in)]), np.zeros(1, dtype=np.int32))
        out = P.trans(FWD, c)
        assert out.t[0] == pytest.approx(t_exp, abs=1e-6)
        back = P.trans(INV, out)
        assert back.t[0] == pytest.approx(t_in, abs=1e-6)

    def test_yyyymmdd_calendar_sweep(self):
        """Every day of 2016-2017 (leap/non-leap pair incl. month ends)
        round-trips and matches the datetime oracle."""
        import datetime

        import numpy as np

        from rayproj.ops.unitconvert import mjd_to_yyyymmdd, yyyymmdd_to_mjd

        base = datetime.date(1858, 11, 17).toordinal()  # MJD epoch
        d = datetime.date(2016, 1, 1)
        vals, true_mjd = [], []
        while d <= datetime.date(2017, 12, 31):
            vals.append(d.year * 10000 + d.month * 100 + d.day)
            true_mjd.append(d.toordinal() - base)
            d += datetime.timedelta(days=1)
        v = np.array(vals, dtype=np.float64)
        m = yyyymmdd_to_mjd(v)
        assert (m == np.array(true_mjd, dtype=np.float64)).all()
        assert (mjd_to_yyyymmdd(m) == v).all()
