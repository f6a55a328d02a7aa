"""Projection scale-factor analysis (proj -V / proj_factors).

Semantics per /root/reference/src/factors.cpp + deriv.cpp: four-point
numerical derivatives of the RAW forward kernel (classic units of a)
at step h (default 1e-5 rad), then meridional/parallel scales h·k with
the ellipsoidal correction, convergence, areal scale, Tissot ellipse
axes and angular distortion ω. Vectorized over point arrays — the
four kernel evaluations run on whole batches.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..mathx import adjlon
from .constants import M_HALFPI
from .op import Coords, INV, Operation

DEFAULT_H = 1e-5
EPS = 1.0e-12


@dataclass
class Factors:
    h: np.ndarray          # meridional scale
    k: np.ndarray          # parallel scale
    s: np.ndarray          # areal scale
    omega: np.ndarray      # max angular distortion (rad)
    conv: np.ndarray       # meridian convergence (rad)
    thetap: np.ndarray     # meridian/parallel intersection angle
    a: np.ndarray          # Tissot semi-major
    b: np.ndarray          # Tissot semi-minor
    der: tuple             # (x_l, x_p, y_l, y_p)
    ok: np.ndarray         # per-point validity


def _raw_fwd(op: Operation, lam: np.ndarray, phi: np.ndarray):
    coo = Coords(lam.copy(), phi.copy())
    with np.errstate(all="ignore"):
        op._fwd(coo)
    bad = ~np.isfinite(coo.x) | ~np.isfinite(coo.y) | (coo.err != 0)
    return coo.x, coo.y, bad


def factors(op: Operation, lam: np.ndarray, phi: np.ndarray,
            h: float = DEFAULT_H) -> Factors:
    """pj_factors (factors.cpp:15-103), vectorized."""
    lam = np.asarray(lam, dtype=np.float64).copy()
    phi = np.asarray(phi, dtype=np.float64).copy()
    n = len(lam)
    ok = ~(((np.abs(phi) - M_HALFPI) > EPS) | (np.abs(lam) > 10.0))
    h = abs(h) if abs(h) >= EPS else DEFAULT_H

    if op.geoc:
        coo = Coords(lam.copy(), phi.copy())
        op._geocentric_latitude(INV, coo)
        lam, phi = coo.x, coo.y
    # nudge off the pole so the derivative exists (factors.cpp:55-57)
    over_pole = np.abs(phi) > (M_HALFPI - h)
    phi = np.where(over_pole, np.sign(phi) * (M_HALFPI - h), phi)
    lam = lam - op.lam0
    if not op.over:
        lam = adjlon(lam)

    # four-point derivative (deriv.cpp:9-70)
    x1, y1, b1 = _raw_fwd(op, lam + h, phi + h)
    x2, y2, b2 = _raw_fwd(op, lam + h, phi - h)
    x3, y3, b3 = _raw_fwd(op, lam - h, phi - h)
    x4, y4, b4 = _raw_fwd(op, lam - h, phi + h)
    ok &= ~(b1 | b2 | b3 | b4)
    d = 4.0 * h
    with np.errstate(all="ignore"):
        x_l = (x1 + x2 - x3 - x4) / d
        y_l = (y1 + y2 - y3 - y4) / d
        x_p = (x1 - x2 - x3 + x4) / d
        y_p = (y1 - y2 - y3 + y4) / d

    with np.errstate(all="ignore"):
        cosphi = np.cos(phi)
        fh = np.hypot(x_p, y_p)
        fk = np.hypot(x_l, y_l) / cosphi
        if op.ell.es != 0.0:
            t = np.sin(phi)
            t = 1.0 - op.ell.es * t * t
            nn = np.sqrt(t)
            fh = fh * (t * nn / op.ell.one_es)
            fk = fk * nn
            r = t * t / op.ell.one_es
        else:
            r = 1.0
        conv = -np.arctan2(x_p, y_p)
        s = (y_p * x_l - x_p * y_l) * r / cosphi
        thetap = np.arcsin(np.clip(s / (fh * fk), -1.0, 1.0))
        t2 = fk * fk + fh * fh
        fa = np.sqrt(np.maximum(t2 + 2.0 * s, 0.0))
        tb = t2 - 2.0 * s
        tb = np.where(tb > 0, np.sqrt(np.maximum(tb, 0.0)), 0.0)
        b_ax = 0.5 * (fa - tb)
        a_ax = 0.5 * (fa + tb)
        omega = 2.0 * np.arcsin(np.clip((a_ax - b_ax) / (a_ax + b_ax), -1.0, 1.0))

    return Factors(h=fh, k=fk, s=s, omega=omega, conv=conv, thetap=thetap,
                   a=a_ax, b=b_ax, der=(x_l, x_p, y_l, y_p), ok=ok)
