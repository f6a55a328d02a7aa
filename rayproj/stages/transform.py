"""Coordinate-transform stages for ray.data.Dataset.map_batches.

The engine analogue of proj_trans_generic (/root/reference/src/
4D_api.cpp:403-590): zero-copy Arrow columns → NumPy float64 views →
fused kernel chain → appended Arrow columns. One proj-pipeline =
ONE map_batches stage; the Operation object is tiny (resolved floats)
and ships by closure capture, while grid-bearing ops defer their grid
arrays and load once per worker (see ops/gridshift.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.constants import DEG_TO_RAD, RAD_TO_DEG
from ..core.factory import create_operation
from ..core.op import FWD, INV, Coords


class ReprojectBatches:
    """Callable for map_batches: applies a proj-string operation to
    coordinate columns of each Arrow batch.

    Use as a plain function for stateless math ops; pass the CLASS to
    map_batches (actor pool) when the op holds grids so the grid load
    in __init__/first-call is amortized per actor.
    """

    def __init__(
        self,
        projstring: str,
        direction: int = FWD,
        in_cols: tuple = ("lon", "lat"),
        out_cols: tuple = ("x", "y"),
        z_col: str | None = None,
        t_col: str | None = None,
        out_z_col: str | None = None,
        err_col: str = "err",
        angular_in_degrees: bool = True,
        angular_out_degrees: bool = True,
    ):
        self.projstring = projstring
        self.direction = direction
        self.in_cols = in_cols
        self.out_cols = out_cols
        self.z_col = z_col
        self.t_col = t_col
        self.out_z_col = out_z_col
        self.err_col = err_col
        self.angular_in_degrees = angular_in_degrees
        self.angular_out_degrees = angular_out_degrees
        self._op = None

    @property
    def op(self):
        if self._op is None:
            self._op = create_operation(self.projstring)
        return self._op

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_op"] = None  # rebuilt per worker (grids load there)
        return state

    def __call__(self, batch: pa.Table) -> pa.Table:
        op = self.op
        x = batch.column(self.in_cols[0]).to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch.column(self.in_cols[1]).to_numpy(zero_copy_only=False).astype(np.float64)
        z = (
            batch.column(self.z_col).to_numpy(zero_copy_only=False).astype(np.float64)
            if self.z_col
            else None
        )
        t = (
            batch.column(self.t_col).to_numpy(zero_copy_only=False).astype(np.float64)
            if self.t_col
            else None
        )
        if self.angular_in_degrees and op.angular_input(self.direction):
            x = x * DEG_TO_RAD
            y = y * DEG_TO_RAD
        coo = Coords(x, y, z, t)
        op.trans(self.direction, coo)
        ox, oy = coo.x, coo.y
        if self.angular_out_degrees and op.angular_output(self.direction):
            ox = ox * RAD_TO_DEG
            oy = oy * RAD_TO_DEG
        out = batch.append_column(self.out_cols[0], pa.array(ox, type=pa.float64()))
        out = out.append_column(self.out_cols[1], pa.array(oy, type=pa.float64()))
        if self.out_z_col:
            out = out.append_column(self.out_z_col, pa.array(coo.z, type=pa.float64()))
        if self.err_col:
            out = out.append_column(self.err_col, pa.array(coo.err, type=pa.int32()))
        return out


def reproject_stage(ds, projstring: str, stateful: bool = False, concurrency=None,
                    batch_size: int = 65536, **kwargs):
    """Attach a reprojection stage to a Dataset. ``stateful=True`` uses
    an actor pool (grid-bearing pipelines)."""
    fn = ReprojectBatches(projstring, **kwargs)
    if stateful:
        cls = _make_actor_class(fn)
        return ds.map_batches(
            cls, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency or 4,
        )
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def _make_actor_class(fn: ReprojectBatches):
    class _ReprojectActor:
        def __init__(self):
            self.fn = fn
            _ = self.fn.op  # build op + load grids once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            return self.fn(batch)

    return _ReprojectActor
