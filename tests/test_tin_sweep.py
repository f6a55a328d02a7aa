"""Edge cases for the TIN pair-sweep assign (state/tin.py._assign):
tiny TINs (W <= fast-path width), outside-hull points, empty input,
and first-hit-wins determinism on shared edges."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rayproj.state.tin import TinModel


def _model(verts, tris):
    return TinModel(
        {
            "file_type": "triangulation_file",
            "transformed_components": ["horizontal"],
            "vertices_columns": ["source_x", "source_y", "target_x", "target_y"],
            "triangles_columns": ["idx_vertex1", "idx_vertex2", "idx_vertex3"],
            "vertices": verts,
            "triangles": tris,
        }
    )


def _square_model():
    # unit square split on the diagonal (0,0)-(1,1): two triangles
    verts = [
        [0.0, 0.0, 10.0, 10.0],
        [1.0, 0.0, 11.0, 10.0],
        [1.0, 1.0, 11.0, 11.0],
        [0.0, 1.0, 10.0, 11.0],
    ]
    tris = [[0, 1, 2], [0, 2, 3]]
    return _model(verts, tris)


def test_tiny_tin_interior_points():
    m = _square_model()
    x = np.array([0.75, 0.25])
    y = np.array([0.25, 0.75])
    tri, l1, l2, l3 = m._assign(x, y, True)
    assert tri.tolist() == [0, 1]
    np.testing.assert_allclose(l1 + l2 + l3, 1.0, atol=1e-12)
    xo, yo, zo, outside = m.apply(x, y, np.zeros(2), True)
    assert not outside.any()
    np.testing.assert_allclose(xo, x + 10.0, atol=1e-12)
    np.testing.assert_allclose(yo, y + 10.0, atol=1e-12)


def test_outside_hull_marked():
    m = _square_model()
    x = np.array([-0.5, 2.0, 0.5])
    y = np.array([0.5, 0.5, 0.5])
    tri, *_ = m._assign(x, y, True)
    assert tri[0] == -1 and tri[1] == -1 and tri[2] >= 0
    xo, yo, zo, outside = m.apply(x, y, np.zeros(3), True)
    assert outside.tolist() == [True, True, False]
    assert np.isinf(xo[0]) and np.isinf(yo[1])


def test_empty_input():
    m = _square_model()
    tri, l1, l2, l3 = m._assign(np.empty(0), np.empty(0), True)
    assert len(tri) == 0 and len(l1) == 0


def test_shared_edge_first_hit_wins():
    m = _square_model()
    # points exactly on the shared diagonal x == y are contained by
    # both triangles within EPS: the lower candidate id must win,
    # deterministically, for every point
    x = np.linspace(0.1, 0.9, 9)
    tri, *_ = m._assign(x, x.copy(), True)
    assert (tri == tri[0]).all()
    assert tri[0] in (0, 1)


def test_long_candidate_lists_second_sweep():
    # fan of many slim triangles around one shared apex: every cell
    # containing the apex collects a long candidate list, forcing the
    # residual (beyond-fast-path) sweep to run
    K = 24
    ang = np.linspace(0.0, np.pi, K + 1)
    verts = [[0.0, 0.0, 0.0, 0.0]] + [
        [float(np.cos(a)), float(np.sin(a)), float(np.cos(a)), float(np.sin(a))]
        for a in ang
    ]
    tris = [[0, i + 1, i + 2] for i in range(K)]
    m = _model(verts, tris)
    rng = np.random.default_rng(3)
    r = rng.uniform(0.05, 0.95, 4000)
    a = rng.uniform(0.01, np.pi - 0.01, 4000)
    x = r * np.cos(a)
    y = r * np.sin(a)
    tri, l1, l2, l3 = m._assign(x, y, True)
    assert (tri >= 0).all()
    # every assignment must be a genuine containment
    want = np.floor(a / (np.pi / K)).astype(np.int64)
    assert (tri == want).mean() > 0.99  # boundary points may tie-break
    np.testing.assert_allclose((l1 + l2 + l3)[tri >= 0], 1.0, atol=1e-9)


def test_outside_hull_in_padded_cells():
    # the fan model's bucket grid has cells with sentinel-padded
    # candidate columns; outside-hull points (y < 0, r > 1) landing in
    # those cells must come back -1 / outside, never the sentinel id
    # (regression: 0.0-padded coefficients passed containment, giving
    # tri_id == len(triangles) and an IndexError in apply()).
    K = 24
    ang = np.linspace(0.0, np.pi, K + 1)
    verts = [[0.0, 0.0, 0.0, 0.0]] + [
        [float(np.cos(a)), float(np.sin(a)), float(np.cos(a)), float(np.sin(a))]
        for a in ang
    ]
    tris = [[0, i + 1, i + 2] for i in range(K)]
    m = _model(verts, tris)
    rng = np.random.default_rng(7)
    # below the fan (y < 0) and beyond the rim (r > 1), plus far corners
    xb = rng.uniform(-1.0, 1.0, 500)
    yb = rng.uniform(-1.0, -0.01, 500)
    a = rng.uniform(0.01, np.pi - 0.01, 500)
    r = rng.uniform(1.05, 3.0, 500)
    x = np.concatenate([xb, r * np.cos(a), [-5.0, 5.0]])
    y = np.concatenate([yb, r * np.sin(a), [-5.0, 5.0]])
    tri, l1, l2, l3 = m._assign(x, y, True)
    assert (tri == -1).all(), f"max tri_id {tri.max()} (K={K})"
    xo, yo, zo, outside = m.apply(x, y, np.zeros(len(x)), True)
    assert outside.all()
    assert np.isinf(xo).all() and np.isinf(yo).all()


def test_mixed_inside_outside_padded_fan():
    # interleave in-hull and out-of-hull points so both paths run in
    # the same sweep over the padded index
    K = 24
    ang = np.linspace(0.0, np.pi, K + 1)
    verts = [[0.0, 0.0, 0.0, 0.0]] + [
        [float(np.cos(a)), float(np.sin(a)), float(np.cos(a)), float(np.sin(a))]
        for a in ang
    ]
    tris = [[0, i + 1, i + 2] for i in range(K)]
    m = _model(verts, tris)
    x = np.array([0.3, 0.3, -0.2, -0.2, 0.0])
    y = np.array([0.3, -0.3, 0.4, -0.4, 1.5])
    tri, *_ = m._assign(x, y, True)
    assert tri[0] >= 0 and tri[2] >= 0
    assert tri[1] == -1 and tri[3] == -1 and tri[4] == -1
