"""Axis reordering / sign flipping.

Semantics per /root/reference/src/conversions/axisswap.cpp: +order=1,-2
/ +axis=enu specs; dimensionality bound to the number of axes given
(2D swap leaves z,t untouched, etc.); prepare/finalize always skipped
(:303-306). In Arrow terms this is a free column permutation.
"""

from __future__ import annotations

from ..core.errors import ERR_AXIS, ProjError
from ..core.op import IO_RADIANS, IO_WHATEVER, Coords, Operation
from . import register


@register
class Axisswap(Operation):
    name = "axisswap"
    need_ellps = False

    def setup(self) -> None:
        params = self.params
        has_order = params.has("order")
        has_axis = params.has("axis")
        if has_order == has_axis:
            raise ProjError(ERR_AXIS, "+order and +axis are mutually exclusive")

        axis = [4, 5, 6, 7]
        sign = [1, 1, 1, 1]
        n = 0
        if has_order:
            order = params.str_("order") or ""
            if any(ch not in "1234-," for ch in order):
                raise ProjError(ERR_AXIS, order)
            for tok in order.split(","):
                if n >= 4 or not tok:
                    break
                v = int(tok)
                idx = abs(v) - 1
                if idx > 3:
                    raise ProjError(ERR_AXIS, order)
                axis[n] = idx
                sign[n] = 1 if v > 0 else -1
                n += 1
        else:
            spec = params.str_("axis") or ""
            if len(spec) != 3:
                raise ProjError(ERR_AXIS, spec)
            table = {"w": (0, -1), "e": (0, 1), "s": (1, -1), "n": (1, 1), "d": (2, -1), "u": (2, 1)}
            for i, ch in enumerate(spec):
                if ch not in table:
                    raise ProjError(ERR_AXIS, spec)
                axis[i], sign[i] = table[ch]
            n = 3

        seen = [a for a in axis if a < 4]
        if len(seen) != len(set(seen)):
            raise ProjError(ERR_AXIS, "duplicate axes")

        self.ndim = 0
        if n == 4:
            self.ndim = 4
        elif n == 3 and all(a < 3 for a in axis[:3]):
            self.ndim = 3
        elif n == 2 and all(a < 2 for a in axis[:2]):
            self.ndim = 2
        if self.ndim == 0:
            raise ProjError(ERR_AXIS, "bad axis order")
        self.axis = axis
        self.sign = sign

        if params.bool_("angularunits"):
            self.left = IO_RADIANS
            self.right = IO_RADIANS
        else:
            self.left = IO_WHATEVER
            self.right = IO_WHATEVER
        self.skip_fwd_prepare = True
        self.skip_fwd_finalize = True
        self.skip_inv_prepare = True
        self.skip_inv_finalize = True

    def _lanes(self, coo: Coords):
        return [coo.x, coo.y, coo.z, coo.t]

    def _fwd(self, coo: Coords) -> None:
        lanes = self._lanes(coo)
        out = list(lanes)
        for i in range(self.ndim):
            out[i] = lanes[self.axis[i]] * self.sign[i]
        coo.x, coo.y, coo.z, coo.t = out

    def _inv(self, coo: Coords) -> None:
        lanes = self._lanes(coo)
        out = list(lanes)
        for i in range(self.ndim):
            out[self.axis[i]] = lanes[i] * self.sign[i]
        coo.x, coo.y, coo.z, coo.t = out
