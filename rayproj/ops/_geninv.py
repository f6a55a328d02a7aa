"""Shared vectorized generic 2D inverse (generic_inverse.cpp:44-114).

Newton iteration with finite-difference Jacobian, refreshed only while
the residual exceeds 1e-6 (the reference's skip-when-close rule), step
clamped to ±0.3 and the iterate clamped to the λ/φ domain. Used by the
projections whose reference implementation calls pj_generic_inverse_2d
(adams_ws2, wink2, ...).
"""

from __future__ import annotations

import numpy as np

from ..core.constants import M_HALFPI, M_PI


def generic_inverse_2d(fwd, X, Y, lam0, phi0, iterations: int = 15):
    """fwd(lam, phi) -> (x, y) arrays. Returns (lam, phi, converged)."""
    lam = np.asarray(lam0, dtype=np.float64).copy()
    phi = np.asarray(phi0, dtype=np.float64).copy()
    dl_X = np.zeros_like(lam)
    dl_Y = np.zeros_like(lam)
    dp_X = np.zeros_like(lam)
    dp_Y = np.zeros_like(lam)
    active = np.isfinite(X) & np.isfinite(Y) & np.isfinite(lam) & np.isfinite(phi)
    converged = np.zeros_like(active)
    for _ in range(iterations):
        if not np.any(active):
            break
        la, pa = lam[active], phi[active]
        xa, ya = fwd(la, pa)
        deltaX = xa - X[active]
        deltaY = ya - Y[active]
        done = (np.abs(deltaX) < 1e-10) & (np.abs(deltaY) < 1e-10)
        recompute = (np.abs(deltaX) > 1e-6) | (np.abs(deltaY) > 1e-6)
        if np.any(recompute):
            dLam = np.where(la > 0, -1e-6, 1e-6)
            x2, y2 = fwd(la + dLam, pa)
            dXl = (x2 - xa) / dLam
            dYl = (y2 - ya) / dLam
            dPhi = np.where(pa > 0, -1e-6, 1e-6)
            x3, y3 = fwd(la, pa + dPhi)
            dXp = (x3 - xa) / dPhi
            dYp = (y3 - ya) / dPhi
            det = dXl * dYp - dXp * dYl
            with np.errstate(divide="ignore", invalid="ignore"):
                nl_X = np.where(det != 0, dYp / det, dl_X[active])
                nl_Y = np.where(det != 0, -dXp / det, dl_Y[active])
                np_X = np.where(det != 0, -dYl / det, dp_X[active])
                np_Y = np.where(det != 0, dXl / det, dp_Y[active])
            upd = recompute
            tmp = dl_X[active]; tmp[upd] = nl_X[upd]; dl_X[active] = tmp
            tmp = dl_Y[active]; tmp[upd] = nl_Y[upd]; dl_Y[active] = tmp
            tmp = dp_X[active]; tmp[upd] = np_X[upd]; dp_X[active] = tmp
            tmp = dp_Y[active]; tmp[upd] = np_Y[upd]; dp_Y[active] = tmp
        delta_lam = np.clip(deltaX * dl_X[active] + deltaY * dl_Y[active], -0.3, 0.3)
        delta_phi = np.clip(deltaX * dp_X[active] + deltaY * dp_Y[active], -0.3, 0.3)
        la = np.where(X[active] != 0, np.clip(la - delta_lam, -M_PI, M_PI), la)
        pa = np.where(Y[active] != 0, np.clip(pa - delta_phi, -M_HALFPI, M_HALFPI), pa)
        lam[active] = la
        phi[active] = pa
        idx = np.flatnonzero(active)
        converged[idx[done]] = True
        active[idx[done]] = False
    return lam, phi, converged
