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


@register
class Deformation(Operation):
    """Kinematic grid shift (deformation.cpp): cartesian coordinates get
    displaced by dt × an ENU velocity field sampled from grids (generic
    3-sample GeoTIFF via +grids, or legacy +xy_grids/+z_grids ct2+gtx,
    mm/yr). ENU→XYZ per Nørbech et al. (deformation.cpp:191-202);
    inverse is the reference's fixed-iteration loop (:210-254)."""

    name = "deformation"
    need_ellps = True

    def setup(self) -> None:
        from ..core.errors import (
            ERR_FAILED_TO_LOAD_GRID,
            ERR_MISSING_ARGS,
            ERR_MUTUALLY_EXCLUSIVE_ARGS,
        )
        from ..core.op import IO_CARTESIAN

        has_xy = self.params.has("xy_grids")
        has_z = self.params.has("z_grids")
        has_g = self.params.has("grids")
        if not has_g and not (has_xy and has_z):
            raise ProjError(ERR_NO_ARGS,
                            "deformation: needs +grids or +xy_grids and +z_grids")
        self._g_spec = self.params.str_("grids") if has_g else None
        self._xy_spec = self.params.str_("xy_grids") if has_xy else None
        self._z_spec = self.params.str_("z_grids") if has_z else None
        self._grids_loaded = False
        self._load()  # validate grid files at plan time (constructor order)
        self.dt = None
        if self.params.has("dt"):
            self.dt = self.params.float_("dt", 0.0)
        if self.params.has("t_obs"):
            raise ProjError(ERR_MISSING_ARGS,
                            "deformation: +t_obs unsupported, use +dt or +t_epoch")
        self.t_epoch = None
        if self.params.has("t_epoch"):
            self.t_epoch = self.params.float_("t_epoch", 0.0)
        if self.dt is None and self.t_epoch is None:
            raise ProjError(ERR_MISSING_ARGS, "deformation: +dt or +t_epoch required")
        if self.dt is not None and self.t_epoch is not None:
            raise ProjError(ERR_MUTUALLY_EXCLUSIVE_ARGS,
                            "deformation: +dt and +t_epoch are mutually exclusive")
        self.left = IO_CARTESIAN
        self.right = IO_CARTESIAN

    def _load(self):
        if not self._grids_loaded:
            from ..core.errors import ERR_FAILED_TO_LOAD_GRID
            from ..state.grids import open_generic_set

            try:
                if self._g_spec is not None:
                    self._ggrids = parse_grid_list(self._g_spec, open_generic_set)
                    self._hgrids = self._vgrids = None
                else:
                    self._ggrids = None
                    self._hgrids = parse_grid_list(self._xy_spec, open_hgrid_set)
                    self._vgrids = parse_grid_list(self._z_spec, open_vgrid_set)
            except ProjError as e:
                raise ProjError(ERR_FAILED_TO_LOAD_GRID, str(e)) from None
            self._grids_loaded = True

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_grids_loaded"] = False
        state["_ggrids"] = state["_hgrids"] = state["_vgrids"] = None
        return state

    def _grid_shift(self, X, Y, Z):
        """get_grid_shift (deformation.cpp:142-208): cartesian→geodetic,
        sample mm/yr ENU velocities, rotate to XYZ m/yr. Returns
        (vx, vy, vz, outside)."""
        from ..state.grids import generic_values_three, hgrid_value, vgrid_value
        from .cart import Cart

        self._load()
        geo = Coords(X.copy(), Y.copy(), Z.copy())
        Cart._inv(self, geo)  # only uses self.ell
        lam, phi = geo.x, geo.y
        if self._ggrids is not None:
            e, n_, u, outside = generic_values_three(self._ggrids, lam, phi)
        else:
            e, n_, outside_h = hgrid_value(self._hgrids, lam, phi)
            u, outside_v = vgrid_value(self._vgrids, lam, phi, 1.0)
            outside = outside_h | outside_v
        # mm/yr → m/yr
        e, n_, u = e / 1000.0, n_ / 1000.0, u / 1000.0
        sp, cp = np.sin(phi), np.cos(phi)
        sl, cl = np.sin(lam), np.cos(lam)
        vx = -sp * cl * n_ - sl * e + cp * cl * u
        vy = -sp * sl * n_ + cl * e + cp * sl * u
        vz = cp * n_ + sp * u
        return vx, vy, vz, outside

    def _dt_vec(self, coo: Coords):
        if self.dt is not None:
            return self.dt
        return coo.t - self.t_epoch

    def _fwd(self, coo: Coords) -> None:
        dt = self._dt_vec(coo)
        vx, vy, vz, outside = self._grid_shift(coo.x, coo.y, coo.z)
        coo.set_err(outside, ERR_GRID_AREA)
        ok = ~outside
        coo.x = np.where(ok, coo.x + dt * vx, coo.x)
        coo.y = np.where(ok, coo.y + dt * vy, coo.y)
        coo.z = np.where(ok, coo.z + dt * vz, coo.z)

    def _inv(self, coo: Coords) -> None:
        """reverse_shift (deformation.cpp:210-254), vectorized with the
        reference's exact (sign-quirky) update and exit conditions."""
        dt = self._dt_vec(coo)
        ix, iy, iz = coo.x, coo.y, coo.z
        vx, vy, vz, outside = self._grid_shift(ix, iy, iz)
        coo.set_err(outside, ERR_GRID_AREA)
        z0 = vz
        x = ix - dt * vx
        y = iy - dt * vy
        z = iz + dt * vz
        active = ~outside
        for _ in range(10):
            if not np.any(active):
                break
            vx, vy, vz, off = self._grid_shift(x, y, z)
            step = active & ~off
            dif_x = np.where(step, x + dt * vx - ix, 0.0)
            dif_y = np.where(step, y + dt * vy - iy, 0.0)
            dif_z = np.where(step, z - dt * vz - iz, 0.0)
            x = x + dif_x
            y = y + dif_y
            z = z + dif_z
            active = step & (np.hypot(dif_x, dif_y) > 1e-8)
        ok = ~outside
        coo.x = np.where(ok, x, ix)
        coo.y = np.where(ok, y, iy)
        coo.z = np.where(ok, iz - dt * z0, iz)


@register
class Defmodel(Operation):
    """+proj=defmodel — deformation-model master file (defmodel.cpp):
    JSON master file describing velocity/step components over generic
    GeoTIFF grids, applied at the coordinate epoch. The parsed model +
    grids are the per-worker state; evaluation is vectorized in
    rayproj.state.defmodel."""

    name = "defmodel"
    need_ellps = True

    def setup(self) -> None:
        from ..core.errors import ERR_INVALID_ARG
        from ..core.resources import find_file
        from ..state.defmodel import ModelError, load_defmodel

        model = self.params.str_("model")
        if not model:
            raise ProjError(ERR_NO_ARGS, "defmodel: +model= should be specified")
        path = find_file(model)
        if path is None:
            raise ProjError(ERR_INVALID_ARG, f"defmodel: cannot open {model}")
        self._path = path
        self._model = None
        try:
            m = self._load()
        except ProjError:
            raise
        from ..core.op import IO_PROJECTED, IO_RADIANS

        if m.is_geographic:
            self.left = self.right = IO_RADIANS
        else:
            self.left = self.right = IO_PROJECTED

    def _load(self):
        if self._model is None:
            from ..core.errors import ERR_INVALID_ARG
            from ..state.defmodel import ModelError, load_defmodel

            try:
                self._model = load_defmodel(self._path, self.ell.a, self.ell.b)
            except ModelError as e:
                raise ProjError(ERR_INVALID_ARG, f"defmodel: invalid model: {e}") from None
        return self._model

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_model"] = None
        return state

    def _fwd(self, coo: Coords) -> None:
        m = self._load()
        x, y, z, ok = m.forward(coo.x, coo.y, coo.z, coo.t)
        coo.set_err(~ok & np.isfinite(coo.x), ERR_GRID_AREA)
        coo.x, coo.y, coo.z = x, y, z

    def _inv(self, coo: Coords) -> None:
        m = self._load()
        x, y, z, ok = m.inverse(coo.x, coo.y, coo.z, coo.t)
        coo.set_err(~ok & np.isfinite(coo.x), ERR_GRID_AREA)
        coo.x, coo.y, coo.z = x, y, z


@register
class Xyzgridshift(Operation):
    """Geocentric translation from a 3-sample grid
    (xyzgridshift.cpp:241-303): cartesian input is converted to
    geodetic (via the op's ellipsoid) to look up (dx, dy, dz) metre
    translations, then shifted. +grid_ref=input_crs (default) applies
    directly forward / iteratively inverse; output_crs (e.g. the
    NTF→RGF93 gr3df97a grid referenced in RGF93) swaps the roles
    (xyzgridshift.cpp:185-214). Iterative adjustment is the reference's
    ≤10-round fixed point (:130-161), vectorized over the batch."""

    name = "xyzgridshift"
    need_ellps = True

    def setup(self) -> None:
        from ..core.errors import ERR_FAILED_TO_LOAD_GRID
        from ..core.op import IO_CARTESIAN

        if not self.params.has("grids"):
            raise ProjError(ERR_NO_ARGS, "xyzgridshift: +grids parameter missing")
        self._g_spec = self.params.str_("grids") or ""
        grid_ref = self.params.str_("grid_ref", "input_crs")
        if grid_ref not in ("input_crs", "output_crs"):
            raise ProjError(ERR_NO_ARGS,
                            f"xyzgridshift: unsupported grid_ref {grid_ref}")
        self.grid_ref_is_input = grid_ref == "input_crs"
        self.multiplier = self.params.float_("multiplier", 1.0)
        self._ggrids = None
        self._load()  # validate at plan time
        self.left = IO_CARTESIAN
        self.right = IO_CARTESIAN

    def _load(self):
        if self._ggrids is None:
            from ..core.errors import ERR_FAILED_TO_LOAD_GRID
            from ..state.grids import open_generic_set

            try:
                self._ggrids = parse_grid_list(self._g_spec, open_generic_set)
            except ProjError as e:
                raise ProjError(ERR_FAILED_TO_LOAD_GRID, str(e)) from None
        return self._ggrids

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_ggrids"] = None
        return state

    def _grid_values(self, X, Y, Z):
        """get_grid_values (xyzgridshift.cpp:60-122): cart⁻¹ then
        bilinear 3-sample lookup × multiplier."""
        from ..state.grids import generic_values_three
        from .cart import Cart

        geo = Coords(X.copy(), Y.copy(), Z.copy())
        Cart._inv(self, geo)  # only uses self.ell
        dx, dy, dz, outside = generic_values_three(
            self._ggrids, geo.x, geo.y,
            wanted=("x_translation", "y_translation", "z_translation"),
            expected_unit="metre",
        )
        m = self.multiplier
        return dx * m, dy * m, dz * m, outside

    def _direct(self, coo: Coords, factor: float) -> None:
        dx, dy, dz, outside = self._grid_values(coo.x, coo.y, coo.z)
        coo.set_err(outside, ERR_GRID_AREA)
        ok = ~outside
        coo.x = np.where(ok, coo.x + factor * dx, coo.x)
        coo.y = np.where(ok, coo.y + factor * dy, coo.y)
        coo.z = np.where(ok, coo.z + factor * dz, coo.z)

    def _iterative(self, coo: Coords, factor: float) -> None:
        x0, y0, z0 = coo.x.copy(), coo.y.copy(), coo.z.copy()
        x, y, z = coo.x, coo.y, coo.z
        outside = np.zeros(len(coo), dtype=bool)
        for _ in range(10):
            dx, dy, dz, outside = self._grid_values(x, y, z)
            dx *= factor
            dy *= factor
            dz *= factor
            err = ((x - x0) - dx) ** 2 + ((y - y0) - dy) ** 2 + ((z - z0) - dz) ** 2
            x = x0 + dx
            y = y0 + dy
            z = z0 + dz
            if np.all((err[~outside] < 1e-10) if outside.any() else (err < 1e-10)):
                break
        coo.set_err(outside, ERR_GRID_AREA)
        ok = ~outside
        coo.x = np.where(ok, x, coo.x)
        coo.y = np.where(ok, y, coo.y)
        coo.z = np.where(ok, z, coo.z)

    def _fwd(self, coo: Coords) -> None:
        if self.grid_ref_is_input:
            self._direct(coo, 1.0)
        else:
            self._iterative(coo, 1.0)

    def _inv(self, coo: Coords) -> None:
        if self.grid_ref_is_input:
            self._iterative(coo, -1.0)
        else:
            self._direct(coo, -1.0)
