"""TIN (triangulation) shift model — the actor-held spatial index for
tinshift (and the blueprint for the engine's point-in-polygon layer).

Semantics per /root/reference/src/transformations/tinshift_impl.hpp:
triangulation JSON (vertices_columns / triangles, :300-360), candidate
lookup + barycentric containment test λ1,λ2 ∈ [−ε, 1+ε], λ3 ≥ 0
(:414-459), barycentric interpolation of target coords / ΔZ
(:461-553). The reference walks a quadtree per point; here candidate
pruning uses a uniform cell bucket grid and the barycentric test runs
vectorized per candidate triangle over the masked point subset.
"""

from __future__ import annotations

import json

import numpy as np

EPS = 1e-10


class TinModel:
    def __init__(self, doc: dict):
        if doc.get("file_type") != "triangulation_file":
            raise ValueError("not a triangulation_file")
        cols = doc["vertices_columns"]
        comps = doc.get("transformed_components", [])
        self.horizontal = "horizontal" in comps
        self.vertical = "vertical" in comps
        # normalize vertices to the reference's canonical layout
        # (tinshift_impl.hpp:240-295): source_x, source_y
        # [, target_x, target_y][, Δz (offset_z or target_z − source_z)]
        raw = np.asarray(doc["vertices"], dtype=np.float64)
        idx = {c: i for i, c in enumerate(cols)}
        parts = [raw[:, idx["source_x"]], raw[:, idx["source_y"]]]
        if self.horizontal:
            parts += [raw[:, idx["target_x"]], raw[:, idx["target_y"]]]
        if self.vertical:
            if "offset_z" in idx:
                parts.append(raw[:, idx["offset_z"]])
            else:
                parts.append(raw[:, idx["target_z"]] - raw[:, idx["source_z"]])
        self.vertices = np.stack(parts, axis=1)
        self.col_count = self.vertices.shape[1]
        tcols = doc.get("triangles_columns", ["idx_vertex1", "idx_vertex2", "idx_vertex3"])
        tidx = {c: i for i, c in enumerate(tcols)}
        traw = np.asarray(doc["triangles"], dtype=np.int64)
        self.triangles = np.stack(
            [traw[:, tidx["idx_vertex1"]], traw[:, tidx["idx_vertex2"]],
             traw[:, tidx["idx_vertex3"]]], axis=1,
        )
        self.input_crs = doc.get("input_crs")
        self.fallback = doc.get("fallback_strategy", "none")
        self._buckets: dict[bool, tuple] = {}

    def _source_xy(self, forward: bool):
        if self.horizontal and not forward:
            return self.vertices[:, 2], self.vertices[:, 3]
        return self.vertices[:, 0], self.vertices[:, 1]

    def _bucket_index(self, forward: bool, n_cells: int = 2048):
        """Uniform grid buckets of triangle bboxes (quadtree stand-in)."""
        key = forward
        if key in self._buckets:
            return self._buckets[key]
        vx, vy = self._source_xy(forward)
        tx = vx[self.triangles]  # (T, 3)
        ty = vy[self.triangles]
        minx, maxx = tx.min(axis=1), tx.max(axis=1)
        miny, maxy = ty.min(axis=1), ty.max(axis=1)
        x0, x1 = float(minx.min()), float(maxx.max())
        y0, y1 = float(miny.min()), float(maxy.max())
        # ~4 cells per triangle: shortens per-cell candidate lists so
        # most points resolve inside the first sweep columns (measured
        # faster than 1-triangle-per-cell despite the larger index —
        # the candidate matrix is still only (cells x W) int64).
        # The cap only exists to bound index memory for million-triangle
        # TINs (2048^2 cells x W x 8 B); it must NOT bind at the
        # reference's own 115k-triangle RFC-6 scale, where a capped-256
        # grid left ~7.5 real candidates per cell and cost a measured
        # 1.4-1.9x in the sweep (same-window A/B, bit-identical output)
        nx = ny = max(1, 2 * int(np.sqrt(max(len(self.triangles), 1))))
        nx, ny = min(nx, n_cells), min(ny, n_cells)
        sx = (x1 - x0) / nx or 1.0
        sy = (y1 - y0) / ny or 1.0
        bx0 = np.clip(((minx - x0) / sx).astype(np.int64), 0, nx - 1)
        bx1 = np.clip(((maxx - x0) / sx).astype(np.int64), 0, nx - 1)
        by0 = np.clip(((miny - y0) / sy).astype(np.int64), 0, ny - 1)
        by1 = np.clip(((maxy - y0) / sy).astype(np.int64), 0, ny - 1)
        # vectorized (triangle -> covered cells) expansion: repeat each
        # triangle id once per bbox cell and derive the cell ids from
        # the within-triangle rank (row-major over the bbox) — no
        # per-triangle Python loop (the loop was ~200 ms on RFC-6-sized
        # TINs at this grid density; this is ~2 ms)
        wx = bx1 - bx0 + 1
        wy = by1 - by0 + 1
        counts = wx * wy
        tri = np.repeat(np.arange(len(self.triangles), dtype=np.int64), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        k = np.arange(len(tri), dtype=np.int64) - starts[tri]
        cx = bx0[tri] + k // wy[tri]
        cy = by0[tri] + k % wy[tri]
        cells = cx * ny + cy
        # padded candidate matrix (cells x W), ascending triangle id
        # per cell (same first-hit-wins order as the bucket lists),
        # trailing -1 padding — enables the vectorized column sweep.
        # stable sort by cell keeps triangle ids ascending within cells.
        order = np.argsort(cells, kind="stable")
        cells_s = cells[order]
        tri_s = tri[order]
        cell_start = np.searchsorted(cells_s, np.arange(nx * ny + 1))
        pos = np.arange(len(tri_s)) - cell_start[cells_s]
        W = max(1, int(np.diff(cell_start).max(initial=0)))
        cand = np.full((nx * ny, W), -1, dtype=np.int64)
        cand[cells_s, pos] = tri_s
        # per-triangle inverse-barycentric coefficients:
        # lam1 = a11*(x-x3) + a12*(y-y3); lam2 = a21*(x-x3) + a22*(y-y3)
        i1, i2, i3 = self.triangles.T
        tx1, ty1 = vx[i1], vy[i1]
        tx2, ty2 = vx[i2], vy[i2]
        tx3, ty3 = vx[i3], vy[i3]
        det = (ty2 - ty3) * (tx1 - tx3) + (tx3 - tx2) * (ty1 - ty3)
        with np.errstate(divide="ignore", invalid="ignore"):
            coef = (
                (ty2 - ty3) / det,
                (tx3 - tx2) / det,
                (ty3 - ty1) / det,
                (tx1 - tx3) / det,
            )
        idx = (x0, y0, sx, sy, nx, ny, cand, coef, tx3, ty3)
        self._buckets[key] = idx
        return idx

    def _sweep_index(self, forward: bool):
        """Sentinel-padded companion of `_bucket_index` for the 2D
        pair sweep: candidate ids with -1 remapped to a sentinel
        triangle T whose coefficients can never produce a containment
        hit, and the inverse-barycentric coefficients appended with
        that sentinel row as six contiguous arrays. (A packed (T+1, 6)
        row-gather variant was measured 2.7x SLOWER per chunk — numpy
        trailing-dim fancy-indexing plus strided-slice arithmetic costs
        far more than six flat gathers.)"""
        key = ("sweep", forward)
        if key in self._buckets:
            return self._buckets[key]
        x0, y0, sx, sy, nx, ny, cand, coef, tx3, ty3 = self._bucket_index(forward)
        a11, a12, a21, a22 = coef
        T = len(self.triangles)
        def pad(a, v):
            return np.ascontiguousarray(np.append(a, v))

        # NaN sentinels: lam1/lam2/lam3 all evaluate NaN for the padded
        # row, so every containment comparison is False and the sentinel
        # can never register a hit. (0.0-coefficients were NOT inert:
        # 0*dx = -0.0 passed lam1>=-EPS & lam3>=0, assigning outside-hull
        # points tri_id == len(triangles) in padded cells.)
        packed = (
            pad(a11, np.nan), pad(a12, np.nan), pad(a21, np.nan), pad(a22, np.nan),
            pad(tx3, np.nan), pad(ty3, np.nan),
        )
        cand_s = np.where(cand < 0, T, cand)
        self._buckets[key] = (x0, y0, sx, sy, nx, ny, cand_s, packed, T)
        return self._buckets[key]

    def _assign(self, x: np.ndarray, y: np.ndarray, forward: bool):
        """Per-point triangle id + barycentric coords; -1 when outside.

        Vectorized (point x candidate) pair sweep, chunked to stay
        cache/bandwidth-resident: the first W0 candidate columns of
        EVERY point evaluate as one 2D array expression, first hit
        resolved with argmax over the boolean hit matrix in candidate
        order (first-hit-wins, candidates ascend in triangle id). The
        few points still unresolved after W0 columns finish in a
        second sweep over the remaining columns. -1-padding rides a
        NaN-sentinel triangle whose coefficients never produce a hit.

        (Two alternatives were built and measured SLOWER at RFC-6
        scale: a bucket-grouped slab variant — radix-sort points by
        cell, scalar coefficients per candidate — at 1.9 M vs 2.5 M
        pts/s, the per-cell Python loop over ~1.5k cells x W
        candidates dominating; and a packed (T+1, 6) row-gather at
        2.7x the per-chunk kernel cost, numpy trailing-dim fancy
        indexing losing to six flat gathers.)"""
        x0, y0, sx, sy, nx, ny, cand, packed, T = self._sweep_index(forward)
        A11, A12, A21, A22, X3, Y3 = packed
        n = len(x)
        keys = (
            np.clip(((x - x0) / sx).astype(np.int64), 0, nx - 1) * ny
            + np.clip(((y - y0) / sy).astype(np.int64), 0, ny - 1)
        )
        tri_id = np.full(n, -1, dtype=np.int64)
        l1 = np.zeros(n)
        l2 = np.zeros(n)
        W = cand.shape[1]

        # Column-wise NARROWING sweep (chunked to stay cache-resident):
        # candidate column 0 is evaluated for every point of the chunk
        # as flat 1D expressions; each later column only for the points
        # still unresolved whose cell actually has another candidate.
        # On fine grids most cells hold 1-2 real candidates, so total
        # work is ~1.5 columns/point instead of a fixed W0=4-column 2D
        # matrix + argmax (the previous shape — measured 1.9x slower
        # same-window). First-hit-wins is preserved by column order;
        # the NaN sentinel keeps empty-cell lanes hitless in column 0.
        chunk = 262144
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            kk = keys[s:e]
            xs = x[s:e]
            ys = y[s:e]
            idx = None  # None = all lanes of the chunk (column 0)
            for j in range(W):
                if j == 0:
                    t = cand[kk, 0]
                    dx = xs - X3[t]
                    dy = ys - Y3[t]
                else:
                    base = np.arange(e - s, dtype=np.int64) if idx is None else idx
                    idx = base[tri_id[s + base] < 0]
                    if not len(idx):
                        break
                    t = cand[kk[idx], j]
                    live = t != T
                    idx = idx[live]
                    if not len(idx):
                        break
                    t = t[live]
                    dx = xs[idx] - X3[t]
                    dy = ys[idx] - Y3[t]
                lam1 = A11[t] * dx + A12[t] * dy
                lam2 = A21[t] * dx + A22[t] * dy
                lam3 = 1.0 - lam1 - lam2
                hit = (
                    (lam1 >= -EPS) & (lam1 <= 1 + EPS)
                    & (lam2 >= -EPS) & (lam2 <= 1 + EPS)
                    & (lam3 >= 0)
                )
                h = (np.flatnonzero(hit) if idx is None else idx[hit]) + s
                tri_id[h] = t[hit]
                l1[h] = lam1[hit]
                l2[h] = lam2[hit]
        l3 = np.where(tri_id >= 0, 1.0 - l1 - l2, 0.0)
        return tri_id, l1, l2, l3

    def _apply_index(self, forward: bool):
        """Per-triangle contiguous target coords / Δz (T-length arrays,
        cache-resident): one flat gather per interpolation term inside
        `apply` instead of the (triangles[t] → vertices[i, col]) double
        gather into strided vertex-matrix columns — measured ~2x on the
        RFC-6 TIN where apply() cost more than _assign()."""
        key = ("apply", forward)
        if key in self._buckets:
            return self._buckets[key]
        i1, i2, i3 = self.triangles.T
        V = self.vertices

        def col(c):
            return (np.ascontiguousarray(V[i1, c]),
                    np.ascontiguousarray(V[i2, c]),
                    np.ascontiguousarray(V[i3, c]))

        txy = None
        if self.horizontal:
            tx, ty = (2, 3) if forward else (0, 1)
            txy = (col(tx), col(ty))
        dzc = col(4 if self.horizontal else 2) if self.vertical else None
        self._buckets[key] = (txy, dzc)
        return self._buckets[key]

    def apply(self, x: np.ndarray, y: np.ndarray, z: np.ndarray, forward: bool):
        """Returns (x', y', z', outside_mask)."""
        tri_id, l1, l2, l3 = self._assign(x, y, forward)
        outside = tri_id < 0
        t = np.maximum(tri_id, 0)
        txy, dzc = self._apply_index(forward)
        if txy is not None:
            (X1, X2, X3), (Y1, Y2, Y3) = txy
            xo = X1[t] * l1 + X2[t] * l2 + X3[t] * l3
            yo = Y1[t] * l1 + Y2[t] * l2 + Y3[t] * l3
        else:
            xo, yo = x, y
        if dzc is not None:
            D1, D2, D3 = dzc
            dz = D1[t] * l1 + D2[t] * l2 + D3[t] * l3
            zo = z + dz if forward else z - dz
        else:
            zo = z
        xo = np.where(outside, np.inf, xo)
        yo = np.where(outside, np.inf, yo)
        return xo, yo, zo, outside


def load_tin(path: str) -> TinModel:
    with open(path) as f:
        return TinModel(json.load(f))
