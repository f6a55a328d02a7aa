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


# ---------------------------------------------------------------------------
# MasterFile parse validation (test_defmodel.cpp:180-487 basic/error_cases)
# ---------------------------------------------------------------------------

import copy
import json as _json

from rayproj.state.defmodel import DefModel

_GRS80_A, _GRS80_B = 6378137.0, 6356752.314140356


def _parse(doc):
    text = doc if isinstance(doc, str) else _json.dumps(doc)
    return DefModel(text, _GRS80_A, _GRS80_B)


def _min_master():
    """test_defmodel.cpp:58-73 getMinValidContent()."""
    return {
        "file_type": "GeoTIFF",
        "format_version": "1.0",
        "source_crs": "EPSG:4959",
        "target_crs": "EPSG:7907",
        "definition_crs": "EPSG:4959",
        "extent": {"type": "bbox", "parameters": {"bbox": _BBOX}},
        "time_extent": {"first": "1900-01-01T00:00:00Z",
                        "last": "2050-01-01T00:00:00Z"},
        "components": [],
    }


def _full_master():
    """test_defmodel.cpp:84-177 getFullValidContent() (metadata keys the
    engine ignores are omitted — only validated keys are kept)."""
    j = _min_master()
    j["horizontal_offset_method"] = "addition"
    j["horizontal_offset_unit"] = "metre"
    j["vertical_offset_unit"] = "metre"
    base_comp = {
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
        "time_function": {"type": "constant", "parameters": {}},
    }
    tfs = [
        {"type": "constant", "parameters": {}},
        {"type": "velocity",
         "parameters": {"reference_epoch": "2000-01-01T00:00:00Z"}},
        {"type": "step",
         "parameters": {"step_epoch": "2000-01-01T00:00:00Z"}},
        {"type": "reverse_step",
         "parameters": {"step_epoch": "2000-01-01T00:00:00Z"}},
        {"type": "piecewise", "parameters": {
            "before_first": "zero", "after_last": "constant",
            "model": [
                {"epoch": "2016-01-01T00:00:00Z", "scale_factor": 0.5},
                {"epoch": "2017-01-01T00:00:00Z", "scale_factor": 1.0},
                {"epoch": "2017-01-01T00:00:00Z", "scale_factor": 2.0},
                {"epoch": "2018-01-01T00:00:00Z", "scale_factor": 1.0},
            ]}},
        {"type": "exponential", "parameters": {
            "reference_epoch": "2000-01-01T00:00:00Z",
            "end_epoch": "2001-01-01T00:00:00Z",
            "relaxation_constant": 2.0,
            "before_scale_factor": 0.0,
            "initial_scale_factor": 1.0,
            "final_scale_factor": 3.0}},
    ]
    j["components"] = []
    for tf in tfs:
        c = copy.deepcopy(base_comp)
        c["time_function"] = tf
        j["components"].append(c)
    return j


IDX_CONSTANT, IDX_VELOCITY, IDX_PIECEWISE = 0, 1, 4


class TestMasterFileParse:
    def test_malformed(self):
        for content in ("foo", "null", "{}"):
            with pytest.raises(ModelError):
                _parse(content)

    def test_min_valid_accepted(self):
        m = _parse(_min_master())
        assert m.source_crs == "EPSG:4959"
        assert m.definition_crs == "EPSG:4959"
        assert (m.extent.minx, m.extent.miny, m.extent.maxx,
                m.extent.maxy) == (158.0, -58.0, 194.0, -25.0)
        assert m.time_first == 1900.0
        assert m.time_last == 2050.0

    def test_each_required_key(self):
        base = _min_master()
        for key in list(base):
            doc = copy.deepcopy(base)
            del doc[key]
            with pytest.raises(ModelError):
                _parse(doc)

    @pytest.mark.parametrize("mutate", [
        lambda j: j.update(definition_crs="EPSG:4326"),
        lambda j: j.update(file_type=1),
        lambda j: j["extent"].pop("type"),
        lambda j: j["extent"].pop("parameters"),
        lambda j: j["extent"].update(parameters={}),
        lambda j: j["extent"]["parameters"].pop("bbox"),
        lambda j: j["extent"]["parameters"].update(bbox="foo"),
        lambda j: j["extent"]["parameters"].update(bbox=[0, 1, 2]),
        lambda j: j["extent"]["parameters"].update(bbox=[0, 1, 2, "foo"]),
        lambda j: j.update(time_extent="foo"),
        lambda j: j["time_extent"].pop("first"),
        lambda j: j["time_extent"].pop("last"),
    ])
    def test_min_valid_mutations_rejected(self, mutate):
        doc = _min_master()
        mutate(doc)
        with pytest.raises(ModelError):
            _parse(doc)

    def test_full_valid_accepted(self):
        m = _parse(_full_master())
        assert len(m.components) == 6
        assert m.horizontal_offset_method == "addition"
        assert m.horizontal_offset_unit == "metre"
        assert m.components[IDX_CONSTANT].displacement_type == "horizontal"
        assert m.components[IDX_CONSTANT].filename == \
            "nzgd2000-ndm-grid02.tif"
        assert m.components[IDX_CONSTANT].interpolation_method == "bilinear"

    @pytest.mark.parametrize("mutate", [
        lambda j: j.update(horizontal_offset_method="unsupported"),
        lambda j: j.update(horizontal_offset_unit="unsupported"),
        lambda j: j.update(vertical_offset_unit="unsupported"),
        lambda j: j["components"][IDX_CONSTANT]["spatial_model"].update(
            interpolation_method="unsupported"),
        lambda j: j["components"][IDX_CONSTANT].update(
            displacement_type="unsupported"),
        lambda j: j["components"][IDX_PIECEWISE]["time_function"]
        ["parameters"].update(model="foo"),
        lambda j: j["components"][IDX_PIECEWISE]["time_function"]
        ["parameters"].update(before_first="illegal"),
        lambda j: j["components"][IDX_PIECEWISE]["time_function"]
        ["parameters"].update(after_last="illegal"),
        lambda j: j["components"][0]["time_function"].update(type="unknown"),
    ])
    def test_full_valid_mutations_rejected(self, mutate):
        doc = _full_master()
        mutate(doc)
        with pytest.raises(ModelError):
            _parse(doc)

    def test_unsupported_combinations(self):
        # geocentric + metre OK, degree + addition OK, geocentric+degree NO
        doc = _full_master()
        doc["horizontal_offset_method"] = "geocentric"
        _parse(doc)
        doc = _full_master()
        doc["horizontal_offset_unit"] = "degree"
        _parse(doc)
        doc = _full_master()
        doc["horizontal_offset_method"] = "geocentric"
        doc["horizontal_offset_unit"] = "degree"
        with pytest.raises(ModelError):
            _parse(doc)
        # geocentric_bilinear + metre OK; + degree unit NO
        doc = _full_master()
        doc["components"][IDX_VELOCITY]["spatial_model"][
            "interpolation_method"] = "geocentric_bilinear"
        _parse(doc)
        doc["horizontal_offset_unit"] = "degree"
        with pytest.raises(ModelError):
            _parse(doc)
