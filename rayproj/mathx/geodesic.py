"""Vectorized geodesic direct & inverse problems (Karney's method).

Algorithm structure per C. F. F. Karney, "Algorithms for geodesics",
J. Geod. 87, 43–55 (2013) — the same method the reference embeds
(/root/reference/src/geodesic.c). The integral expansions come from
mathx.series (derived at import with exact rational arithmetic and
validated against quadrature, not transcribed).

All angles in RADIANS. Vectorized over NumPy arrays; the inverse
problem uses Newton on the azimuth with a bisection safeguard, robust
away from the exactly-antipodal singular set.
"""

from __future__ import annotations

import math

import numpy as np

from .series import GeodSeries

_SERIES_CACHE: dict = {}


def _series_for(n: float) -> GeodSeries:
    gs = _SERIES_CACHE.get(n)
    if gs is None:
        gs = GeodSeries(n)
        _SERIES_CACHE[n] = gs
    return gs


def _norm_ang(x):
    return np.arctan2(np.sin(x), np.cos(x))


def _solve_triangle(sbet, cbet, salp, calp):
    """Given β and α at a point → α₀, σ, ω components."""
    salp0 = salp * cbet
    calp0 = np.hypot(calp, salp * sbet)
    # σ: atan2(sinβ, cosα·cosβ); handle equatorial start with α=±90°
    ssig = sbet
    csig = calp * cbet
    both_zero = (ssig == 0) & (csig == 0)
    csig = np.where(both_zero, 1.0, csig)
    sig = np.arctan2(ssig, csig)
    somg = salp0 * ssig
    comg = csig
    omg = np.arctan2(somg, comg)
    return salp0, calp0, sig, omg


def geod_direct(a: float, f: float, lat1, lon1, azi1, s12):
    """Direct problem: → (lat2, lon2, azi2), radians."""
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    azi1 = np.asarray(azi1, dtype=np.float64)
    s12 = np.asarray(s12, dtype=np.float64)
    b = a * (1 - f)
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    n = f / (2 - f)
    gs = _series_for(n)

    sbet1 = (1 - f) * np.sin(lat1)
    cbet1 = np.cos(lat1)
    norm = np.hypot(sbet1, cbet1)
    sbet1 /= norm
    cbet1 = np.maximum(cbet1 / norm, 1e-15)

    salp1 = np.sin(azi1)
    calp1 = np.cos(azi1)
    salp0, calp0, sig1, omg1 = _solve_triangle(sbet1, cbet1, salp1, calp1)

    k2 = ep2 * calp0 * calp0
    sq = np.sqrt(1 + k2)
    eps = (sq - 1) / (sq + 1)

    I1_1 = gs.I1_val(eps, sig1)
    tau2 = (b * I1_1 + s12) / (b * gs.A1(eps))
    sig2 = gs.sigma_from_tau(eps, tau2)

    ssig2 = np.sin(sig2)
    csig2 = np.cos(sig2)
    sbet2 = calp0 * ssig2
    cbet2 = np.hypot(salp0, calp0 * csig2)
    lat2 = np.arctan2(sbet2, (1 - f) * cbet2)
    omg2 = np.arctan2(salp0 * ssig2, csig2)
    lam1 = omg1 - f * salp0 * gs.I3_val(eps, sig1)
    lam2 = omg2 - f * salp0 * gs.I3_val(eps, sig2)
    lon2 = _norm_ang(lon1 + (lam2 - lam1))
    azi2 = np.arctan2(salp0, calp0 * csig2)
    return lat2, lon2, azi2


def _lambda12(gs, f, eps_fn, sbet1, cbet1, sbet2, cbet2, salp1, calp1):
    """Given α₁ candidates → (λ12, σ1, σ2, eps, salp0, calp0, and the
    reduced-length quantity needed for Newton's derivative)."""
    salp0, calp0, sig1, omg1 = _solve_triangle(sbet1, cbet1, salp1, calp1)
    # at point 2: sinα₂ = sinα₀ / cosβ₂ (Clairaut), cosα₂ from triangle
    salp2 = salp0 / cbet2
    # cos²α₂ = (calp0² - ... ) robust form (Karney eq. 38-ish):
    calp2_sq = (calp1 * cbet1) ** 2 + np.where(
        cbet1 < np.abs(sbet1),
        (cbet2 - cbet1) * (cbet1 + cbet2),
        (sbet1 - sbet2) * (sbet1 + sbet2),
    )
    calp2 = np.sqrt(np.maximum(calp2_sq, 0.0)) / cbet2
    ssig2 = sbet2
    csig2 = calp2 * cbet2
    sig2 = np.arctan2(ssig2, csig2)
    omg2 = np.arctan2(salp0 * ssig2, csig2)

    eps = eps_fn(calp0)
    lam1 = omg1 - f * salp0 * gs.I3_val(eps, sig1)
    lam2 = omg2 - f * salp0 * gs.I3_val(eps, sig2)
    lam12 = lam2 - lam1

    # reduced length m12 / b for the Newton derivative
    ssig1 = np.sin(sig1)
    csig1 = np.cos(sig1)
    k2 = 4 * eps / (1 - eps) ** 2
    w1 = np.sqrt(1 + k2 * ssig1 * ssig1)
    w2 = np.sqrt(1 + k2 * np.sin(sig2) ** 2)
    J1 = gs.I1_val(eps, sig1) - gs.I2_val(eps, sig1)
    J2 = gs.I1_val(eps, sig2) - gs.I2_val(eps, sig2)
    m12_b = (
        w2 * csig1 * np.sin(sig2)
        - w1 * ssig1 * np.cos(sig2)
        - csig1 * np.cos(sig2) * (J2 - J1)
    )
    return lam12, sig1, sig2, eps, salp0, calp0, salp2, calp2, m12_b


def geod_inverse(a: float, f: float, lat1, lon1, lat2, lon2):
    """Inverse problem: → (s12, azi1, azi2), radians. Not intended for
    exactly-antipodal pairs (the aeqd antipode is an error case anyway)."""
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    b = a * (1 - f)
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    n = f / (2 - f)
    gs = _series_for(n)

    lam12 = _norm_ang(lon2 - lon1)
    lonsign = np.where(lam12 >= 0, 1.0, -1.0)
    lam12_t = np.abs(lam12)

    # canonicalize (Karney §4): point 1 has the larger |lat| and lies
    # in the southern hemisphere; remember the transforms to undo
    swap = np.abs(lat2) > np.abs(lat1)
    p1 = np.where(swap, lat2, lat1)
    p2 = np.where(swap, lat1, lat2)
    lonsign = np.where(swap, -lonsign, lonsign)
    latsign = np.where(p1 > 0, -1.0, 1.0)
    p1 = p1 * latsign
    p2 = p2 * latsign

    sbet1 = (1 - f) * np.sin(p1)
    cbet1 = np.cos(p1)
    h1 = np.hypot(sbet1, cbet1)
    sbet1, cbet1 = sbet1 / h1, np.maximum(cbet1 / h1, 1e-15)
    sbet2 = (1 - f) * np.sin(p2)
    cbet2 = np.cos(p2)
    h2 = np.hypot(sbet2, cbet2)
    sbet2, cbet2 = sbet2 / h2, np.maximum(cbet2 / h2, 1e-15)

    # near-equatorial pairs: the general solver's α₁ window collapses
    # to ~|β|, below float bisection reach — the equator-path answer is
    # exact to ~a·|β| ≤ 6 µm at this threshold
    EQ_TOL = 1e-12
    equatorial = (
        (np.abs(sbet1) < EQ_TOL) & (np.abs(sbet2) < EQ_TOL)
        & (lam12_t <= (1 - f) * math.pi)
    )

    def eps_fn(calp0):
        k2 = ep2 * calp0 * calp0
        sq = np.sqrt(1 + k2)
        return (sq - 1) / (sq + 1)

    # initial azimuth guess on the auxiliary sphere
    wbar = np.sqrt(1 - e2 * (0.5 * (cbet1 + cbet2)) ** 2)
    omg12 = lam12_t / wbar
    somg, comg = np.sin(omg12), np.cos(omg12)
    salp1 = cbet2 * somg
    calp1 = cbet1 * sbet2 - sbet1 * cbet2 * comg
    norm = np.hypot(salp1, calp1)
    norm = np.where(norm == 0, 1.0, norm)
    alp1 = np.arctan2(salp1 / norm, calp1 / norm)
    alp1 = np.clip(alp1, 1e-12, math.pi - 1e-12)

    lo = np.zeros_like(alp1)
    hi = np.full_like(alp1, math.pi)
    for _ in range(70):
        salp1 = np.sin(alp1)
        calp1 = np.cos(alp1)
        l12, sig1, sig2, eps, salp0, calp0, salp2, calp2, m12_b = _lambda12(
            gs, f, eps_fn, sbet1, cbet1, sbet2, cbet2, salp1, calp1
        )
        err = l12 - lam12_t
        hi = np.where(err > 0, np.minimum(hi, alp1), hi)
        lo = np.where(err <= 0, np.maximum(lo, alp1), lo)
        with np.errstate(divide="ignore", invalid="ignore"):
            dl = m12_b / (calp2 * cbet2)
            step = err / dl
        new = alp1 - np.where(np.isfinite(step), step, 0.0)
        outside = ~np.isfinite(new) | (new <= lo) | (new >= hi)
        new = np.where(outside, 0.5 * (lo + hi), new)
        if np.all(np.abs(new - alp1) < 1e-15):
            alp1 = new
            break
        alp1 = new
    salp1 = np.sin(alp1)
    calp1 = np.cos(alp1)
    l12, sig1, sig2, eps, salp0, calp0, salp2, calp2, m12_b = _lambda12(
        gs, f, eps_fn, sbet1, cbet1, sbet2, cbet2, salp1, calp1
    )
    s12 = b * (gs.I1_val(eps, sig2) - gs.I1_val(eps, sig1))

    # equatorial special case: the geodesic runs along the equator
    s12 = np.where(equatorial, a * lam12_t, s12)
    salp1 = np.where(equatorial, 1.0, salp1)
    calp1 = np.where(equatorial, 0.0, calp1)
    salp2 = np.where(equatorial, 1.0, salp2)
    calp2 = np.where(equatorial, 0.0, calp2)

    # undo canonicalization (Karney §4 tail): if swapped, exchange the
    # azimuth pair, then scale sines by swapp·lonsign and cosines by
    # swapp·latsign
    swapp = np.where(swap, -1.0, 1.0)
    sa1 = np.where(swap, salp2, salp1) * swapp * lonsign
    ca1 = np.where(swap, calp2, calp1) * swapp * latsign
    sa2 = np.where(swap, salp1, salp2) * swapp * lonsign
    ca2 = np.where(swap, calp1, calp2) * swapp * latsign
    azi1 = np.arctan2(sa1, ca1)
    azi2 = np.arctan2(sa2, ca2)
    # nan/inf inputs give nan outputs (geodtest.cpp GeodSolve14: inverse
    # must not "ignore lon12 = nan" — without this the bisection
    # converges to a definite-looking garbage azimuth)
    bad = ~(np.isfinite(lat1) & np.isfinite(lon1)
            & np.isfinite(lat2) & np.isfinite(lon2))
    if np.any(bad):
        s12 = np.where(bad, np.nan, s12)
        azi1 = np.where(bad, np.nan, azi1)
        azi2 = np.where(bad, np.nan, azi2)
    return s12, azi1, azi2
