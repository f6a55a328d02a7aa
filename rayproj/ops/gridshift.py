"""hgridshift / vgridshift operators (stateful side-input stages).

Op-shell semantics per /root/reference/src/transformations/hgridshift.cpp
and vgridshift.cpp: +grids list with @optional and 'null' entries,
t_epoch/t_final time gating, outside-all-grids → PJD_ERR_GRID_AREA;
vgridshift z ± multiplier·interp (default multiplier −1).

Ray Data mapping: grids are loaded lazily on first batch (deferred, like
the reference's defer_grid_opening) and dropped from the pickled state,
so an op object ships to workers as a few hundred bytes and each
actor/worker loads grid arrays exactly once.
"""

from __future__ import annotations

import numpy as np

from ..core.errors import ERR_GRID_AREA, ERR_NO_ARGS, ProjError
from ..core.op import IO_RADIANS, Coords, Operation
from ..state.grids import hgrid_apply, open_hgrid_set, open_vgrid_set, parse_grid_list, vgrid_value
from . import register


class _GridShiftBase(Operation):
    need_ellps = False

    def setup(self) -> None:
        if not self.params.has("grids"):
            raise ProjError(ERR_NO_ARGS, f"{self.name}: +grids parameter missing")
        self.grids_spec = self.params.str_("grids") or ""
        self.t_final = 0.0
        if self.params.has("t_final"):
            raw = self.params.str_("t_final") or ""
            if raw == "now":
                # decimalyear of 'now' (hgridshift.cpp:162-172)
                import time

                lt = time.localtime()
                self.t_final = lt.tm_year + (lt.tm_yday - 1) / 365.0
            else:
                self.t_final = self.params.float_("t_final", 0.0)
        self.t_epoch = self.params.float_("t_epoch", 0.0)
        self.left = IO_RADIANS
        self.right = IO_RADIANS
        self._gridsets = None
        # validate at plan time that the grids exist/parse
        self._load()

    def _load(self):
        if self._gridsets is None:
            self._gridsets = parse_grid_list(self.grids_spec, self._opener)
        return self._gridsets

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_gridsets"] = None  # workers reload from the search path
        return state

    def _time_mask(self, coo: Coords) -> np.ndarray | None:
        """Time gating (hgridshift.cpp:88-104): only rows with
        t < t_epoch (when t_final > t_epoch) are transformed."""
        if self.t_final == 0 or self.t_epoch == 0:
            return None
        if self.t_final > self.t_epoch:
            return coo.t < self.t_epoch
        return np.zeros(len(coo), dtype=bool)


@register
class Hgridshift(_GridShiftBase):
    name = "hgridshift"

    def _opener(self, name: str):
        return open_hgrid_set(name)

    def _apply(self, coo: Coords, forward: bool) -> None:
        gridsets = self._load()
        if not gridsets:
            return
        tm = self._time_mask(coo)
        lam, phi = coo.x, coo.y
        nl, np_, outside = hgrid_apply(gridsets, lam, phi, forward)
        if tm is None:
            coo.set_err(outside, ERR_GRID_AREA)
            coo.x = nl
            coo.y = np_
        else:
            coo.set_err(outside & tm, ERR_GRID_AREA)
            coo.x = np.where(tm, nl, lam)
            coo.y = np.where(tm, np_, phi)

    def _fwd(self, coo: Coords) -> None:
        self._apply(coo, True)

    def _inv(self, coo: Coords) -> None:
        self._apply(coo, False)


@register
class Vgridshift(_GridShiftBase):
    name = "vgridshift"

    def setup(self) -> None:
        super().setup()
        self.multiplier = self.params.float_("multiplier", -1.0)

    def _opener(self, name: str):
        return open_vgrid_set(name)

    def _apply(self, coo: Coords, forward: bool) -> None:
        gridsets = self._load()
        if not gridsets:
            return
        tm = self._time_mask(coo)
        val, outside = vgrid_value(gridsets, coo.x, coo.y, self.multiplier)
        delta = val if forward else -val
        if tm is None:
            coo.set_err(outside, ERR_GRID_AREA)
            coo.z = coo.z + delta
        else:
            coo.set_err(outside & tm, ERR_GRID_AREA)
            coo.z = np.where(tm, coo.z + delta, coo.z)

    def _fwd(self, coo: Coords) -> None:
        self._apply(coo, True)

    def _inv(self, coo: Coords) -> None:
        self._apply(coo, False)


@register
class Tinshift(Operation):
    """Triangulation-based shift (tinshift.cpp + tinshift_impl.hpp).
    The TIN model is the canonical actor-held spatial index: loaded
    once per worker, dropped from pickled state."""

    name = "tinshift"
    need_ellps = True

    def setup(self) -> None:
        from ..core.errors import ERR_INVALID_ARG
        from ..core.resources import find_file

        fname = self.params.str_("file")
        if not fname:
            raise ProjError(ERR_NO_ARGS, "tinshift: +file= required")
        path = find_file(fname)
        if path is None:
            raise ProjError(ERR_INVALID_ARG, f"tinshift: cannot open {fname}")
        self._path = path
        self._model = None
        self._load_model()
        from ..core.op import IO_WHATEVER

        self.left = IO_WHATEVER
        self.right = IO_WHATEVER
        self.skip_fwd_prepare = True
        self.skip_inv_prepare = True
        self.skip_fwd_finalize = True
        self.skip_inv_finalize = True

    def _load_model(self):
        if self._model is None:
            from ..core.errors import ERR_INVALID_ARG
            from ..state.tin import load_tin

            try:
                self._model = load_tin(self._path)
            except Exception as e:
                raise ProjError(ERR_INVALID_ARG, f"tinshift: {e}") from None
        return self._model

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_model"] = None
        return state

    def _apply(self, coo: Coords, forward: bool) -> None:
        m = self._load_model()
        x, y, z, outside = m.apply(coo.x, coo.y, coo.z, forward)
        coo.set_err(outside, ERR_GRID_AREA)
        coo.x, coo.y, coo.z = x, y, z

    def _fwd(self, coo: Coords) -> None:
        self._apply(coo, True)

    def _inv(self, coo: Coords) -> None:
        self._apply(coo, False)
