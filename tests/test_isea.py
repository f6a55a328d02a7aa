"""ISEA — vectors from the reference's test/gie/builtins.gie:2355-2377
(plane mode values at 0.1 mm, hex/resolution=31 expected failure)."""

import numpy as np

from rayproj.core.constants import DEG_TO_RAD
from rayproj.core.factory import create_operation
from rayproj.core.op import FWD, Coords


def test_isea_plane_builtins():
    op = create_operation("+proj=isea +a=6400000")
    c = Coords(
        np.array([2.0, 2.0, -2.0, -2.0]) * DEG_TO_RAD,
        np.array([1.0, -1.0, 1.0, -1.0]) * DEG_TO_RAD,
    )
    op.trans(FWD, c)
    exp = np.array(
        [
            [-1097074.948022474, 3442909.309037183],
            [-1097074.948264795, 3233611.728585708],
            [-1575486.353641554, 3442168.342028188],
            [-1575486.353880283, 3234352.695594706],
        ]
    )
    assert np.abs(np.c_[c.x, c.y] - exp).max() < 1e-4


def test_isea_hex_res31_fails():
    op = create_operation("+proj=isea +mode=hex +resolution=31 +a=6400000")
    c = Coords(np.array([0.0]), np.array([0.0]))
    op.trans(FWD, c)
    assert c.err[0] != 0 and np.isinf(c.x[0])


def test_isea_modes_produce_grid_addresses():
    # integer hex addresses, stable across calls (determinism)
    for mode in ("di", "hex"):
        op = create_operation(f"+proj=isea +mode={mode} +resolution=4 +R=1")
        c = Coords(
            np.array([2.0, -100.0, 45.0]) * DEG_TO_RAD,
            np.array([1.0, -40.0, 80.0]) * DEG_TO_RAD,
        )
        op.trans(FWD, c)
        assert (c.err == 0).all()
        assert np.array_equal(c.x, np.round(c.x))
    # aperture-3 odd-resolution path
    op = create_operation("+proj=isea +mode=di +resolution=5 +aperture=3 +R=1")
    c = Coords(np.array([2.0]) * DEG_TO_RAD, np.array([1.0]) * DEG_TO_RAD)
    op.trans(FWD, c)
    assert c.err[0] == 0 and c.x[0] == round(c.x[0])


def test_isea_orient_pole_plane():
    op = create_operation("+proj=isea +orient=pole +a=6400000")
    c = Coords(np.array([0.0, 10.0]) * DEG_TO_RAD, np.array([89.0, 50.0]) * DEG_TO_RAD)
    op.trans(FWD, c)
    assert (c.err == 0).all() and np.isfinite(c.x).all()
