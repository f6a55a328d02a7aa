"""Flagship pipeline: geolocate → cs2cs-exact reprojection → cell
encode → point-in-polygon → tile assignment (+ optional write with
per-partition lineage).

This is the north-rule headline: a Common-Crawl-style page table
streams through ray.data.Dataset; every stage is one vectorized
map_batches over Arrow batches; the only side inputs (polygon layer)
are broadcast, so the whole pipeline is shuffle-free and scales
linearly with input blocks. ``text`` bytes ride through untouched
(the per-url byte-identity invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.constants import DEG_TO_RAD, RAD_TO_DEG
from ..core.factory import create_operation
from ..core.op import FWD, Coords
from ..spatial.cells import cell_id
from ..spatial.polygons import PolygonIndex, make_polygons
from ..spatial.tiles import tile_id
from ..stages.geolocate import geolocate_batch_arrow

# DHDN→ETRS89-style datum hop exercising the full kernel stack:
# geodetic → cart → 7-param helmert → cart⁻¹ → geodetic (all fused)
CS2CS_PIPELINE = (
    "+proj=pipeline "
    "+step +proj=cart +ellps=bessel "
    "+step +proj=helmert +exact +x=598.1 +y=73.7 +z=418.2 +rx=0.202 +ry=0.045 "
    "+rz=-2.455 +s=6.7 +convention=position_vector "
    "+step +inv +proj=cart +ellps=GRS80"
)


class FlagshipStage:
    """One fused per-batch stage (actor-poolable): geolocate, reproject,
    cell-encode, PIP, tile-assign. Polygon index built once per actor."""

    def __init__(self, key_col: str = "url", lang_col: str = "lang",
                 cell_level: int = 12, zoom: int = 8,
                 projstring: str = CS2CS_PIPELINE, n_polys: int = 60):
        self.key_col = key_col
        self.lang_col = lang_col
        self.cell_level = cell_level
        self.zoom = zoom
        self.op = create_operation(projstring)
        self.pip = PolygonIndex(make_polygons(n_polys))

    # Process blocks in cache-resident sub-chunks: the kernel chain makes
    # dozens of float64 passes, and at 64k rows (512 KB/array) the working
    # set stays in L2/L3 — measured >2x aggregate throughput on many-core
    # runs vs full-block processing (DRAM-bound otherwise). Swept
    # 8k/16k/32k/64k at 8 and 32 cpus (round 4): 65536 fastest at both
    # levels (+5% over 32k; smaller chunks pay numpy per-call overhead).
    CHUNK = 65536

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows > self.CHUNK:
            parts = [
                self._one(batch.slice(s, self.CHUNK))
                for s in range(0, batch.num_rows, self.CHUNK)
            ]
            return pa.concat_tables(parts)
        return self._one(batch)

    def tile_partial(self, batch: pa.Table) -> pa.Table:
        """Fused kernel + per-batch tile partial aggregate WITHOUT
        materializing the full output table: only the tile array of
        each cache-resident sub-chunk is kept, so the stage's memory
        traffic is the input columns plus one int64 array — the
        aggregate-consumer deployment shape (bench headline).

        At zoom ≤ 10 the per-chunk partial is a DENSE bincount into a
        (2^zoom)² accumulator (512 KB at the default zoom 8 — cache-
        resident) instead of a per-chunk sort + final merge-sort:
        identical (tile, count) pairs in identical ascending order
        (tile ids are monotone in the dense x·n+y key), ~3 ms/64k-
        chunk cheaper. Larger zooms keep the sort path (the dense
        table would be ≥128 MB at zoom 12)."""
        n = np.int64(1) << self.zoom
        dense_ok = self.zoom <= 10
        acc = np.zeros(int(n) * int(n), dtype=np.int64) if dense_ok else None
        parts_t: list = []
        parts_c: list = []
        for s in range(0, batch.num_rows, self.CHUNK):
            sub = batch.slice(s, self.CHUNK)
            lon, lat = self._lonlat(sub)
            coo = Coords(lon * DEG_TO_RAD, lat * DEG_TO_RAD)
            self.op.trans(FWD, coo)
            rlon = coo.x * RAD_TO_DEG
            rlat = coo.y * RAD_TO_DEG
            cell_id(rlon, rlat, self.cell_level)
            self.pip.assign(rlon, rlat)
            tiles = tile_id(rlon, rlat, self.zoom)
            if dense_ok:
                dense = ((tiles >> np.int64(29)) & (n - 1)) * n + (tiles & (n - 1))
                acc += np.bincount(dense, minlength=int(n) * int(n))
            else:
                uniq, cnt = np.unique(tiles, return_counts=True)
                parts_t.append(uniq)
                parts_c.append(cnt)
        if dense_ok:
            hit = np.flatnonzero(acc)
            tiles_out = ((np.int64(self.zoom) << np.int64(58))
                         | ((hit // n) << np.int64(29)) | (hit % n))
            return pa.table({"tile": tiles_out, "n_partial": acc[hit]})
        # vectorized partial merge (no per-tile Python)
        allt = np.concatenate(parts_t) if parts_t else np.empty(0, np.int64)
        allc = np.concatenate(parts_c) if parts_c else np.empty(0, np.int64)
        uniq, inv = np.unique(allt, return_inverse=True)
        sums = np.bincount(inv, weights=allc.astype(np.float64)).astype(np.int64)
        return pa.table({"tile": uniq, "n_partial": sums})

    def _lonlat(self, batch: pa.Table):
        """(lon, lat) numpy arrays for a batch — integer keys go through
        geolocate_ids directly (no Arrow append/re-extract round-trip;
        the per-chunk alloc churn showed up in many-core scaling)."""
        key = batch.column(self.key_col)
        if pa.types.is_integer(key.type):
            from ..stages.geolocate import geolocate_ids

            return geolocate_ids(key.to_numpy())
        gb = geolocate_batch_arrow(batch, self.key_col, self.lang_col)
        return gb.column("lon").to_numpy(), gb.column("lat").to_numpy()

    def _one(self, batch: pa.Table) -> pa.Table:
        batch = geolocate_batch_arrow(batch, self.key_col, self.lang_col)
        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        # cs2cs-epsilon-exact reprojection (radians in/out)
        coo = Coords(lon * DEG_TO_RAD, lat * DEG_TO_RAD)
        self.op.trans(FWD, coo)
        rlon = coo.x * RAD_TO_DEG
        rlat = coo.y * RAD_TO_DEG
        cells = cell_id(rlon, rlat, self.cell_level)
        polys = self.pip.assign(rlon, rlat)
        tiles = tile_id(rlon, rlat, self.zoom)
        out = batch.append_column("reproj_lon", pa.array(rlon, type=pa.float64()))
        out = out.append_column("reproj_lat", pa.array(rlat, type=pa.float64()))
        out = out.append_column("cell", pa.array(cells.astype(np.int64), type=pa.int64()))
        out = out.append_column("poly_id", pa.array(polys, type=pa.int32()))
        out = out.append_column("tile", pa.array(tiles, type=pa.int64()))
        out = out.append_column("reproj_err", pa.array(coo.err, type=pa.int32()))
        return out


_STAGE_CACHE: dict = {}


def _cached_stage(kwargs_key, kwargs):
    stage = _STAGE_CACHE.get(kwargs_key)
    if stage is None:
        stage = FlagshipStage(**kwargs)
        _STAGE_CACHE[kwargs_key] = stage
    return stage


def run_flagship(ds, key_col="url", lang_col="lang", concurrency=None,
                 batch_size=None, **kwargs):
    """Attach the flagship stage to a Dataset.

    Uses stateless tasks with a per-worker-process stage cache (the
    polygon index builds once per worker — same amortization as an
    actor pool, but the scheduler stays fully elastic). batch_size=None
    processes whole blocks zero-copy.
    """
    stage_kwargs = {"key_col": key_col, "lang_col": lang_col, **kwargs}
    key = tuple(sorted(stage_kwargs.items()))

    def fn(batch: pa.Table) -> pa.Table:
        return _cached_stage(key, stage_kwargs)(batch)

    if concurrency is not None:
        return ds.map_batches(
            FlagshipStage,
            fn_constructor_kwargs=stage_kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def tile_stats(ds, driver_merge: bool = True):
    """Per-tile doc counts — partial aggregate inside map_batches bounds
    the merge input to (blocks × distinct tiles) tiny rows; the merge is
    a driver-side pandas groupby by default (the partial stream is ~MBs
    even at cluster scale), or a Ray groupby when driver_merge=False."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column("tile").to_numpy()
        uniq, counts = np.unique(t, return_counts=True)
        return pa.table({"tile": uniq, "n_partial": counts.astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    if driver_merge:
        df = partials.to_pandas()
        out = df.groupby("tile", as_index=False)["n_partial"].sum()
        out = out.rename(columns={"n_partial": "n_docs"})
        return out
    from ray.data.aggregate import Sum

    return partials.groupby("tile").aggregate(Sum("n_partial", alias_name="n_docs"))
