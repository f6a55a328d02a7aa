"""Port of the reference's test/unit/test_defmodel.cpp time-function
and ISO8601 vector suites (lines 488-694).

The evaluator_* grid tests are covered separately: the gie corpus
drives the simple_model_*.json fixtures end-to-end, and the driver's
`defmodel` query pins interpolation values against a SQL oracle.
"""

import math

import numpy as np
import pytest

from rayproj.state.defmodel import (
    Component,
    ExponentialTF,
    ModelError,
    PiecewiseTF,
    iso8601_to_decimal_year,
)

_BBOX = [158, -58, 194, -25]


def _component(time_function):
    """A minimal valid component (test_defmodel.cpp:84-130) with the
    given time_function block."""
    return Component({
        "description": "description",
        "displacement_type": "horizontal",
        "uncertainty_type": "none",
        "horizontal_uncertainty": 0.01,
        "vertical_uncertainty": 0.02,
        "extent": {"type": "bbox", "parameters": {"bbox": _BBOX}},
        "spatial_model": {
            "type": "GeoTIFF",
            "interpolation_method": "bilinear",
            "filename": "nzgd2000-ndm-grid02.tif",
            "md5_checksum": "49fce8ab267be2c8d00d43683060a032",
        },
        "time_function": time_function,
    })


def _eval(comp, t):
    return float(comp.time_function.evaluate(np.array([t]))[0])


class TestISO8601ToDecimalYear:
    """test_defmodel.cpp:488-513."""

    def test_values(self):
        iso = iso8601_to_decimal_year
        assert iso("2000-01-01T00:00:00Z") == 2000.0
        assert iso("2000-02-29T12:00:00Z") == \
            2000.0 + ((31 + 28) * 86400.0 + 12 * 3600) / (366 * 86400)
        assert iso("2000-12-31T23:59:59Z") == \
            2000.0 + (366 * 86400 - 1.0) / (366 * 86400)
        assert iso("2001-01-01T00:00:00Z") == 2001.0
        assert iso("2001-12-31T23:59:59Z") == \
            2001.0 + (365 * 86400 - 1.0) / (365 * 86400)

    @pytest.mark.parametrize("bad", [
        "",
        "0000-01-01T00:00:00Z",
        "2001-02-29T00:00:00Z",   # not a leap year
        "2000-13-01T00:00:00Z",
        "2000-01-32T00:00:00Z",
        "2000-01-01T24:00:00Z",
        "2000-01-01T00:60:00Z",
        "2000-01-01T00:00:61Z",
    ])
    def test_rejects(self, bad):
        with pytest.raises(ModelError):
            iso8601_to_decimal_year(bad)


class TestTimeFunctions:
    """test_defmodel.cpp:516-694 evaluate_* vectors."""

    def test_constant(self):
        comp = _component({"type": "constant", "parameters": {}})
        for t in (1999.0, 2000.0, 2001.0):
            assert _eval(comp, t) == 1.0

    def test_velocity(self):
        comp = _component({
            "type": "velocity",
            "parameters": {"reference_epoch": "2000-01-01T00:00:00Z"},
        })
        assert _eval(comp, 1999.0) == -1.0
        assert _eval(comp, 2000.0) == 0.0
        assert _eval(comp, 2001.0) == 1.0

    def test_step(self):
        comp = _component({
            "type": "step",
            "parameters": {"step_epoch": "2000-01-01T00:00:00Z"},
        })
        assert _eval(comp, 1999.99) == 0.0
        assert _eval(comp, 2000.00) == 1.0
        assert _eval(comp, 2000.01) == 1.0

    def test_reverse_step(self):
        comp = _component({
            "type": "reverse_step",
            "parameters": {"step_epoch": "2000-01-01T00:00:00Z"},
        })
        assert _eval(comp, 1999.99) == -1.0
        assert _eval(comp, 2000.00) == 0.0
        assert _eval(comp, 2000.01) == 0.0

    def _piecewise(self, before="zero", after="constant", model=None):
        if model is None:
            model = [
                {"epoch": "2016-01-01T00:00:00Z", "scale_factor": 0.5},
                {"epoch": "2017-01-01T00:00:00Z", "scale_factor": 1.0},
                {"epoch": "2017-01-01T00:00:00Z", "scale_factor": 2.0},
                {"epoch": "2018-01-01T00:00:00Z", "scale_factor": 1.0},
            ]
        return _component({
            "type": "piecewise",
            "parameters": {"before_first": before, "after_last": after,
                           "model": model},
        })

    def test_piecewise_base(self):
        comp = self._piecewise()
        assert _eval(comp, 2015.99) == 0.0
        assert _eval(comp, 2016.00) == 0.5
        assert _eval(comp, 2016.5) == 0.75
        assert _eval(comp, 2017 - 1e-9) == pytest.approx(1.0, abs=1e-9)
        assert _eval(comp, 2017.0) == 2.0   # duplicate epoch: last wins
        assert _eval(comp, 2017.5) == 1.5
        assert _eval(comp, 2018.0) == 1.0
        assert _eval(comp, 2019.0) == 1.0

    def test_piecewise_before_first(self):
        assert _eval(self._piecewise(before="zero"), 2015.5) == 0.0
        assert _eval(self._piecewise(before="constant"), 2015.5) == 0.5
        assert _eval(self._piecewise(before="linear"), 2015.5) == 0.25

    def test_piecewise_after_last(self):
        assert _eval(self._piecewise(after="zero"), 2018.5) == 0.0
        assert _eval(self._piecewise(after="constant"), 2018.5) == 1.0
        assert _eval(self._piecewise(after="linear"), 2018.5) == 0.5

    def test_piecewise_no_epoch(self):
        comp = self._piecewise(model=[])
        assert _eval(comp, 2015.5) == 0.0

    def test_piecewise_one_epoch(self):
        comp = self._piecewise(
            before="linear", after="linear",
            model=[{"epoch": "2016-01-01T00:00:00Z", "scale_factor": 0.5}])
        assert _eval(comp, 2015.5) == 0.5
        assert _eval(comp, 2016.5) == 0.5

    def test_piecewise_two_identical_epochs(self):
        comp = self._piecewise(
            before="linear", after="linear",
            model=[
                {"epoch": "2016-01-01T00:00:00Z", "scale_factor": 0.5},
                {"epoch": "2016-01-01T00:00:00Z", "scale_factor": 1.0},
            ])
        assert _eval(comp, 2015.5) == 0.5
        assert _eval(comp, 2016.5) == 1.0

    def test_exponential(self):
        comp = _component({
            "type": "exponential",
            "parameters": {
                "reference_epoch": "2000-01-01T00:00:00Z",
                "end_epoch": "2001-01-01T00:00:00Z",
                "relaxation_constant": 2.0,
                "before_scale_factor": 0.0,
                "initial_scale_factor": 1.0,
                "final_scale_factor": 3.0,
            },
        })
        assert _eval(comp, 1999.99) == 0.0
        assert _eval(comp, 2000.00) == 1.0
        assert _eval(comp, 2000.50) == \
            1.0 + 2.0 * (1.0 - math.exp(-(2000.50 - 2000.00) / 2.0))
        assert _eval(comp, 2001.00) == \
            1.0 + 2.0 * (1.0 - math.exp(-(2001.00 - 2000.00) / 2.0))
        # end_epoch clamps: frozen after 2001.0
        assert _eval(comp, 2002.00) == \
            1.0 + 2.0 * (1.0 - math.exp(-(2001.00 - 2000.00) / 2.0))

    def test_exponential_rejects_nonpositive_tau(self):
        with pytest.raises(ModelError):
            ExponentialTF(2000.0, None, 0.0, 0.0, 1.0, 3.0)

    def test_piecewise_rejects_bad_extrapolation(self):
        with pytest.raises(ModelError):
            PiecewiseTF("bogus", "constant", [])
        with pytest.raises(ModelError):
            PiecewiseTF("zero", "bogus", [])
