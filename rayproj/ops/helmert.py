"""Helmert transformation (3/4/6/7/14-parameter) + Molodensky-Badekas.

Re-derived from /root/reference/src/transformations/helmert.cpp:
parameter struct :67-88, 14-param time propagation P(t)=P(epoch)+Ṗ·Δt
(:106-159), exact vs small-angle rotation matrix and the
position_vector/coordinate_frame transposition (:162-320), fwd
x' = T + (1+s·1e-6)·R·(x−refp) (:363-399), inverse via transpose
(:403-436), 4D wrapper rebuilding R per distinct t (:439-472),
constructors :555-686 (helmert) and :689-748 (molobadekas).

Vectorization: 3×3 matrix applied as array expressions; for
time-dependent batches rows are grouped by unique epoch so R is built
once per distinct t (mirrors the reference's rebuild-on-change cache).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.constants import DEG_TO_RAD
from ..core.errors import (
    ERR_INVALID_ARG,
    ERR_INVALID_SCALE,
    ERR_MISSING_ARGS,
    ProjError,
)
from ..core.op import IO_CARTESIAN, IO_PROJECTED, Coords, Operation
from . import register

ARCSEC_TO_RAD = DEG_TO_RAD / 3600.0


def _rot_matrix(o: float, p: float, k: float, exact: bool, position_vector: bool) -> np.ndarray:
    if exact:
        cf, sf = math.cos(o), math.sin(o)
        ct, st = math.cos(p), math.sin(p)
        cp, sp = math.cos(k), math.sin(k)
        R = np.array(
            [
                [ct * cp, cf * sp + sf * st * cp, sf * sp - cf * st * cp],
                [-ct * sp, cf * cp - sf * st * sp, sf * cp + cf * st * sp],
                [st, -sf * ct, cf * ct],
            ]
        )
    else:
        R = np.array([[1.0, k, -p], [-k, 1.0, o], [p, -o, 1.0]])
    if position_vector:
        R = R.T.copy()
    return R


@register
class Helmert(Operation):
    name = "helmert"
    need_ellps = False

    def setup(self) -> None:
        p = self.params
        self.left = IO_CARTESIAN
        self.right = IO_CARTESIAN
        # translations / rotations / scale at reference epoch
        self.x_0 = p.float_("x", 0.0)
        self.y_0 = p.float_("y", 0.0)
        self.z_0 = p.float_("z", 0.0)
        self.rx_0 = p.float_("rx", 0.0) * ARCSEC_TO_RAD
        self.ry_0 = p.float_("ry", 0.0) * ARCSEC_TO_RAD
        self.rz_0 = p.float_("rz", 0.0) * ARCSEC_TO_RAD
        self.exact = p.bool_("exact", False)
        self.scale_0 = 0.0
        self.theta_0 = 0.0
        self.fourparam = False

        # the reference wires the 2D fwd/inv interface only for the
        # 4-parameter (+theta) form (helmert.cpp:565-570); a linking op
        # (ob_tran) using the 2D interface otherwise gets EINVAL
        self.has_2d_interface = p.has("theta")
        if p.has("theta"):
            self.left = IO_PROJECTED
            self.right = IO_PROJECTED

        if p.has("transpose"):
            raise ProjError(ERR_INVALID_ARG, "transpose is no longer valid")

        if p.has("towgs84") and self.datum_params is not None:
            d = self.datum_params
            self.x_0, self.y_0, self.z_0 = d[0], d[1], d[2]
            self.rx_0, self.ry_0, self.rz_0 = d[3], d[4], d[5]
            self.scale_0 = 0.0 if d[6] == 0 else (d[6] - 1) * 1e6

        if p.has("theta"):
            self.theta_0 = p.float_("theta") * ARCSEC_TO_RAD
            self.fourparam = True
            self.scale_0 = 1.0

        if p.has("s"):
            self.scale_0 = p.float_("s")
            if self.scale_0 <= -1.0e6:
                raise ProjError(ERR_INVALID_SCALE)
            if p.has("theta") and self.scale_0 == 0.0:
                raise ProjError(ERR_INVALID_SCALE)

        # rates
        self.dx = p.float_("dx", 0.0)
        self.dy = p.float_("dy", 0.0)
        self.dz = p.float_("dz", 0.0)
        self.drx = p.float_("drx", 0.0) * ARCSEC_TO_RAD
        self.dry = p.float_("dry", 0.0) * ARCSEC_TO_RAD
        self.drz = p.float_("drz", 0.0) * ARCSEC_TO_RAD
        self.dtheta = p.float_("dtheta", 0.0) * ARCSEC_TO_RAD
        self.ds = p.float_("ds", 0.0)
        self.t_epoch = p.float_("t_epoch", 0.0)

        self.refp = np.zeros(3)
        self.no_rotation = (
            self.rx_0 == 0 and self.ry_0 == 0 and self.rz_0 == 0
            and self.drx == 0 and self.dry == 0 and self.drz == 0
        )
        self._read_convention()
        self.kinematic = any(
            v != 0 for v in (self.dx, self.dy, self.dz, self.drx, self.dry, self.drz, self.ds, self.dtheta)
        )

    def _read_convention(self) -> None:
        self.is_position_vector = False
        if not self.no_rotation:
            conv = self.params.str_("convention")
            if not conv:
                raise ProjError(ERR_MISSING_ARGS, "helmert: missing convention")
            if conv == "position_vector":
                self.is_position_vector = True
            elif conv == "coordinate_frame":
                self.is_position_vector = False
            else:
                raise ProjError(ERR_INVALID_ARG, conv)
            if self.params.has("towgs84") and not self.is_position_vector:
                raise ProjError(ERR_INVALID_ARG, "towgs84 requires position_vector")

    def _params_at(self, t_obs: float):
        dt = t_obs - self.t_epoch
        T = np.array([self.x_0 + self.dx * dt, self.y_0 + self.dy * dt, self.z_0 + self.dz * dt])
        o = self.rx_0 + self.drx * dt
        p_ = self.ry_0 + self.dry * dt
        k = self.rz_0 + self.drz * dt
        scale = self.scale_0 + self.ds * dt
        theta = self.theta_0 + self.dtheta * dt
        R = _rot_matrix(o, p_, k, self.exact, self.is_position_vector)
        return T, R, scale, theta

    def _apply(self, coo: Coords, forward: bool) -> None:
        t = coo.t
        t_eff = np.where(np.isinf(t), self.t_epoch, t)
        if self.kinematic:
            uniq = np.unique(t_eff)
        else:
            uniq = np.array([self.t_epoch])
        for tv in uniq:
            mask = slice(None) if not self.kinematic else (t_eff == tv)
            T, R, scale, theta = self._params_at(float(tv))
            x, y, z = coo.x[mask], coo.y[mask], coo.z[mask]
            if self.fourparam:
                # np scalar trig/division for C IEEE parity: cos(inf) is
                # NaN and x/0 is inf in helmert.cpp's build, never a
                # Python ValueError/ZeroDivisionError
                if forward:
                    cr = float(np.cos(np.float64(theta))) * scale
                    sr = float(np.sin(np.float64(theta))) * scale
                    nx = cr * x + sr * y + T[0]
                    ny = -sr * x + cr * y + T[1]
                else:
                    cr = float(np.cos(np.float64(theta)) / np.float64(scale))
                    sr = float(np.sin(np.float64(theta)) / np.float64(scale))
                    xx = x - T[0]
                    yy = y - T[1]
                    nx = xx * cr - yy * sr
                    ny = xx * sr + yy * cr
                nz = z
            elif self.no_rotation and scale == 0:
                s = 1.0 if forward else -1.0
                nx, ny, nz = x + s * T[0], y + s * T[1], z + s * T[2]
            else:
                # In-place accumulation with the SAME operand
                # association as the naive sc*(R·(p−refp))+T /
                # Rᵀ·((p−T)/sc)+refp expressions → bit-identical;
                # x−0.0 is bitwise x (±0, NaN included), so the refp
                # shift is skipped entirely for plain helmert where
                # refp == 0 (Molodensky-Badekas keeps it).
                sc = 1 + scale * 1e-6
                shift = bool(self.refp.any())
                if forward:
                    X = x - self.refp[0] if shift else x
                    Y = y - self.refp[1] if shift else y
                    Z = z - self.refp[2] if shift else z
                    rows = ((R[0, 0], R[0, 1], R[0, 2]),
                            (R[1, 0], R[1, 1], R[1, 2]),
                            (R[2, 0], R[2, 1], R[2, 2]))
                    tail = (T[0], T[1], T[2])
                else:
                    X = x - T[0]
                    X /= sc
                    Y = y - T[1]
                    Y /= sc
                    Z = z - T[2]
                    Z /= sc
                    rows = ((R[0, 0], R[1, 0], R[2, 0]),
                            (R[0, 1], R[1, 1], R[2, 1]),
                            (R[0, 2], R[1, 2], R[2, 2]))
                    tail = (self.refp[0], self.refp[1], self.refp[2])
                out3 = []
                tmp = np.empty_like(X)
                for (r0, r1, r2), t0 in zip(rows, tail):
                    acc = r0 * X
                    np.multiply(r1, Y, out=tmp)
                    acc += tmp
                    np.multiply(r2, Z, out=tmp)
                    acc += tmp
                    if forward:
                        acc *= sc
                    acc += t0
                    out3.append(acc)
                nx, ny, nz = out3
            if isinstance(mask, slice):
                coo.x, coo.y, coo.z = (np.asarray(nx), np.asarray(ny),
                                       np.asarray(nz))
            else:
                coo.x[mask] = nx
                coo.y[mask] = ny
                coo.z[mask] = nz

    def _fwd(self, coo: Coords) -> None:
        self._apply(coo, True)

    def _inv(self, coo: Coords) -> None:
        self._apply(coo, False)


@register
class Molobadekas(Helmert):
    """Helmert about a reference point refp (Molodensky-Badekas)."""

    name = "molobadekas"

    def setup(self) -> None:
        p = self.params
        self.left = IO_CARTESIAN
        self.right = IO_CARTESIAN
        self.x_0 = p.float_("x", 0.0)
        self.y_0 = p.float_("y", 0.0)
        self.z_0 = p.float_("z", 0.0)
        self.rx_0 = p.float_("rx", 0.0) * ARCSEC_TO_RAD
        self.ry_0 = p.float_("ry", 0.0) * ARCSEC_TO_RAD
        self.rz_0 = p.float_("rz", 0.0) * ARCSEC_TO_RAD
        self.exact = p.bool_("exact", False)
        self.scale_0 = p.float_("s", 0.0)
        self.theta_0 = 0.0
        self.fourparam = False
        self.dx = self.dy = self.dz = 0.0
        self.drx = self.dry = self.drz = 0.0
        self.ds = self.dtheta = 0.0
        self.t_epoch = 0.0
        # molobadekas always requires an explicit convention
        # (helmert.cpp:689-748 never sets no_rotation)
        self.no_rotation = False
        self._read_convention()
        self.refp = np.array(
            [p.float_("px", 0.0), p.float_("py", 0.0), p.float_("pz", 0.0)]
        )
        # refp folded into the translation (helmert.cpp:737-744)
        self.x_0 += self.refp[0]
        self.y_0 += self.refp[1]
        self.z_0 += self.refp[2]
        self.kinematic = False
