"""Horner polynomial evaluation (Danish KMS/SDFE gen_pol family).

Semantics per /root/reference/src/transformations/horner.cpp:89-513
(the Poder/Engsager "gen_pol" double 2D Horner scheme, plus the
complex-polynomial variant): separately-supplied forward and inverse
coefficient sets evaluated about false origins, with a square
region-of-validity check (+range, default 500 km).

Real polynomial (deg g, (g+1)(g+2)/2 coefficients per axis): the
classic dual Horner recurrence reading coefficients backwards, summing
tiny high-order terms first for numerical stability
(horner.cpp:184-291). Complex polynomial (2*deg+2 coefficients):
C_out = sum c_k * z^k with z = n + i*e evaluated by complex Horner
(horner.cpp:313-385), with optional +uneg/+vneg axis flips.

All arithmetic is elementwise over the coordinate arrays — the
coefficient loops are O(deg^2) scalar-indexed vector ops, so the
kernel is fully vectorized over the batch.
"""

from __future__ import annotations

import numpy as np

from ..core.errors import ERR_GRID_AREA, ERR_MISSING_ARGS, ProjError
from ..core.op import IO_PROJECTED, Coords, Operation
from . import register


def _parse_list(params, key: str, n: int) -> np.ndarray:
    raw = params.raw(key)
    if raw is None:
        raise ProjError(ERR_MISSING_ARGS, f"horner: +{key}= required")
    vals = [float(v) for v in str(raw).split(",") if v != ""]
    if len(vals) != n:
        raise ProjError(
            ERR_MISSING_ARGS, f"horner: +{key} needs {n} coefficients, got {len(vals)}"
        )
    return np.asarray(vals, dtype=np.float64)


@register
class Horner(Operation):
    name = "horner"
    need_ellps = True

    def setup(self) -> None:
        p = self.params
        self.left = IO_PROJECTED
        self.right = IO_PROJECTED
        if not p.has("deg"):
            raise ProjError(ERR_MISSING_ARGS, "horner: +deg= required")
        self.order = p.int_("deg")
        if self.order < 0 or self.order > 10000:
            raise ProjError(ERR_MISSING_ARGS, f"horner: unreasonable degree {self.order}")
        self.complex_poly = p.has("fwd_c") or p.has("inv_c")
        if self.complex_poly:
            n = 2 * self.order + 2
            self.fwd_c = _parse_list(p, "fwd_c", n)
            self.inv_c = _parse_list(p, "inv_c", n)
            self.uneg = p.has("uneg")
            self.vneg = p.has("vneg")
        else:
            n = (self.order + 1) * (self.order + 2) // 2
            self.fwd_u = _parse_list(p, "fwd_u", n)
            self.fwd_v = _parse_list(p, "fwd_v", n)
            self.inv_u = _parse_list(p, "inv_u", n)
            self.inv_v = _parse_list(p, "inv_v", n)
        self.fwd_origin = _parse_list(p, "fwd_origin", 2)
        self.inv_origin = _parse_list(p, "inv_origin", 2)
        self.range = p.float_("range", 500000.0)

    # -- kernels -----------------------------------------------------------

    def _eval_real(self, tcx: np.ndarray, tcy: np.ndarray, e, n):
        """Dual Horner scheme (horner.cpp:266-284): coefficient arrays
        read backwards; E is a polynomial Horner-nested in n with inner
        polynomials in e, N the transpose."""
        g = self.order
        iu = len(tcx)
        iv = len(tcy)
        iv -= 1
        N = tcy[iv]
        iu -= 1
        E = tcx[iu]
        for r in range(g, 0, -1):
            iv -= 1
            u = tcy[iv]
            iu -= 1
            v = tcx[iu]
            for _c in range(g, r - 1, -1):
                iv -= 1
                u = n * u + tcy[iv]
                iu -= 1
                v = e * v + tcx[iu]
            N = e * N + u
            E = n * E + v
        return E, N

    def _eval_complex(self, coefs: np.ndarray, e, n):
        """Complex Horner (horner.cpp:373-380): C = sum c_k z^k with
        z = n + i*e, coefficient pairs read backwards."""
        i = len(coefs)
        i -= 1
        E = coefs[i]
        i -= 1
        N = coefs[i]
        while i > 0:
            i -= 1
            w = n * E + e * N + coefs[i]
            i -= 1
            N = n * N - e * E + coefs[i]
            E = w
        return E, N

    def _apply(self, coo: Coords, origin: np.ndarray, fwd: bool) -> None:
        e = coo.x - origin[0]
        n = coo.y - origin[1]
        bad = (np.abs(n) > self.range) | (np.abs(e) > self.range)
        coo.set_err(bad, ERR_GRID_AREA)
        if self.complex_poly:
            if self.uneg:
                e = -e
            if self.vneg:
                n = -n
            coefs = self.fwd_c if fwd else self.inv_c
            E, N = self._eval_complex(coefs, e, n)
        else:
            tcx = self.fwd_u if fwd else self.inv_u
            tcy = self.fwd_v if fwd else self.inv_v
            E, N = self._eval_real(tcx, tcy, e, n)
        coo.x = np.broadcast_to(np.asarray(E, dtype=np.float64), coo.x.shape).copy() \
            if np.ndim(E) == 0 else E
        coo.y = np.broadcast_to(np.asarray(N, dtype=np.float64), coo.y.shape).copy() \
            if np.ndim(N) == 0 else N

    def _fwd(self, coo: Coords) -> None:
        self._apply(coo, self.fwd_origin, True)

    def _inv(self, coo: Coords) -> None:
        self._apply(coo, self.inv_origin, False)
