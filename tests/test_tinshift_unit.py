"""Port of the reference's test/unit/test_tinshift.cpp vector suite.

Exercises the four vertices_columns layouts (horizontal,
vertical-via-source_z/target_z, vertical-via-offset_z,
horizontal+vertical) with the exact interpolation values the
reference's Evaluator pins, plus parse rejection of malformed files.
The reference signals outside-hull by returning false; this engine
poisons the lanes with ERR_GRID_AREA (-48) in the err column.
"""

import json

import numpy as np
import pytest

from rayproj.core.errors import ERR_GRID_AREA, ProjError
from rayproj.core.factory import create_operation
from rayproj.core.op import FWD, INV, Coords


def _min_valid():
    """test_tinshift.cpp:38-53 getMinValidContent()."""
    return {
        "file_type": "triangulation_file",
        "format_version": "1.0",
        "input_crs": "EPSG:2393",
        "output_crs": "EPSG:3067",
        "transformed_components": ["horizontal"],
        "vertices_columns": ["source_x", "source_y", "target_x", "target_y"],
        "triangles_columns": ["idx_vertex1", "idx_vertex2", "idx_vertex3"],
        "vertices": [[0, 0, 101, 101], [0, 1, 100, 101], [1, 1, 100, 100]],
        "triangles": [[0, 1, 2]],
    }


def _op(tmp_path, doc):
    path = tmp_path / "tin.json"
    path.write_text(json.dumps(doc))
    return create_operation(f"+proj=tinshift +file={path}")


def _run(op, direction, x, y, z):
    coo = Coords(np.array([x]), np.array([y]), np.array([z]),
                 np.array([0.0]), np.zeros(1, dtype=np.int32))
    r = op.trans(direction, coo)
    return float(r.x[0]), float(r.y[0]), float(r.z[0]), int(r.err[0])


def test_parse_rejects_malformed(tmp_path):
    """TINShiftFile::parse("foo"/"null"/"{}") -> ParsingException."""
    for i, content in enumerate(("foo", "null", "{}")):
        path = tmp_path / f"bad{i}.json"
        path.write_text(content)
        with pytest.raises(ProjError):
            create_operation(f"+proj=tinshift +file={path}")


def test_horizontal(tmp_path):
    op = _op(tmp_path, _min_valid())

    x, y, z, err = _run(op, FWD, -0.1, 0.0, 1000.0)
    assert err == ERR_GRID_AREA  # eval.forward(...) == false

    assert _run(op, FWD, 0.0, 0.0, 1000.0) == (101.0, 101.0, 1000.0, 0)
    assert _run(op, FWD, 0.0, 1.0, 1000.0) == (100.0, 101.0, 1000.0, 0)
    assert _run(op, FWD, 1.0, 1.0, 1000.0) == (100.0, 100.0, 1000.0, 0)
    assert _run(op, FWD, 0.0, 0.5, 1000.0) == (100.5, 101.0, 1000.0, 0)
    assert _run(op, FWD, 0.5, 0.5, 1000.0) == (100.5, 100.5, 1000.0, 0)
    assert _run(op, FWD, 0.5, 0.75, 1000.0) == (100.25, 100.5, 1000.0, 0)
    assert _run(op, INV, 100.25, 100.5, 1000.0) == (0.5, 0.75, 1000.0, 0)


def test_vertical_source_target_z(tmp_path):
    doc = _min_valid()
    doc["transformed_components"] = ["vertical"]
    doc["vertices_columns"] = ["source_x", "source_y", "source_z",
                               "target_z"]
    doc["vertices"] = [[0, 0, 10.5, 10.6], [0, 1, 15.0, 15.2],
                       [1, 1, 17.5, 18.0]]
    op = _op(tmp_path, doc)

    assert _run(op, FWD, 0.0, 0.0, 1000.0) == (0.0, 0.0, 1000.1, 0)
    assert _run(op, FWD, 0.5, 0.75, 1000.0) == (0.5, 0.75, 1000.325, 0)
    assert _run(op, INV, 0.5, 0.75, 1000.325) == (0.5, 0.75, 1000.0, 0)


def test_vertical_offset_z(tmp_path):
    doc = _min_valid()
    doc["transformed_components"] = ["vertical"]
    doc["vertices_columns"] = ["source_x", "source_y", "offset_z"]
    doc["vertices"] = [[0, 0, 0.1], [0, 1, 0.2], [1, 1, 0.5]]
    op = _op(tmp_path, doc)

    assert _run(op, FWD, 0.0, 0.0, 1000.0) == (0.0, 0.0, 1000.1, 0)
    assert _run(op, FWD, 0.5, 0.75, 1000.0) == (0.5, 0.75, 1000.325, 0)
    assert _run(op, INV, 0.5, 0.75, 1000.325) == (0.5, 0.75, 1000.0, 0)


def test_horizontal_and_vertical(tmp_path):
    doc = _min_valid()
    doc["transformed_components"] = ["horizontal", "vertical"]
    doc["vertices_columns"] = ["source_x", "source_y", "target_x",
                               "target_y", "offset_z"]
    doc["vertices"] = [[0, 0, 101, 101, 0.1], [0, 1, 100, 101, 0.2],
                       [1, 1, 100, 100, 0.5]]
    op = _op(tmp_path, doc)

    assert _run(op, FWD, 0.0, 0.0, 1000.0) == (101.0, 101.0, 1000.1, 0)
    assert _run(op, FWD, 0.5, 0.75, 1000.0) == (100.25, 100.5, 1000.325, 0)
    assert _run(op, INV, 100.25, 100.5, 1000.325) == (0.5, 0.75, 1000.0, 0)
