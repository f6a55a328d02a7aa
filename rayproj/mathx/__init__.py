"""Vectorized (NumPy) re-derivations of the reference's shared math helpers.

Semantics per /root/reference/src/{adjlon,tsfn,msfn,qsfn,phi2,mlfn,aasincos}.cpp
and src/mlfn.hpp. All functions take/return float64 ndarrays; per-point
iterative loops become masked fixed-point iterations that keep converged
lanes frozen, reproducing the scalar iteration sequences.

NaN/inf lanes propagate through untouched (in-band error model).
"""

from __future__ import annotations

import numpy as np

M_PI = np.pi
M_HALFPI = 0.5 * np.pi
M_FORTPI = 0.25 * np.pi
M_TWOPI = 2.0 * np.pi


def adjlon(lon: np.ndarray) -> np.ndarray:
    """Wrap longitude to ±pi, with 1e-12 dateline slack (adjlon.cpp:6-22)."""
    lon = np.asarray(lon, dtype=np.float64)
    out = lon.copy()
    with np.errstate(invalid="ignore"):
        need = np.abs(lon) >= M_PI + 1e-12
    if np.any(need):
        v = lon[need] + M_PI
        v -= M_TWOPI * np.floor(v / M_TWOPI)
        out[need] = v - M_PI
    return out


def tsfn(phi: np.ndarray, sinphi: np.ndarray, e: float) -> np.ndarray:
    """exp(-isometric latitude): tan(pi/4 - phi/2) / ((1-e sinphi)/(1+e sinphi))^(e/2)."""
    con = e * sinphi
    denom = 1.0 + con
    with np.errstate(divide="ignore", invalid="ignore"):
        r = np.tan(0.5 * (M_HALFPI - phi)) / np.power((1.0 - con) / denom, 0.5 * e)
        r = np.where(denom == 0.0, np.inf, r)
    return r


def msfn(sinphi: np.ndarray, cosphi: np.ndarray, es: float) -> np.ndarray:
    return cosphi / np.sqrt(1.0 - es * sinphi * sinphi)


def qsfn(sinphi: np.ndarray, e: float, one_es: float) -> np.ndarray:
    """Authalic latitude helper q (qsfn.cpp:8-23)."""
    if e >= 1.0e-7:
        con = e * sinphi
        div1 = 1.0 - con * con
        div2 = 1.0 + con
        with np.errstate(divide="ignore", invalid="ignore"):
            r = one_es * (sinphi / div1 - (0.5 / e) * np.log((1.0 - con) / div2))
            r = np.where((div1 == 0.0) | (div2 == 0.0), np.inf, r)
        return r
    return sinphi + sinphi


def phi2(ts0: np.ndarray, e: float) -> tuple[np.ndarray, np.ndarray]:
    """Inverse isometric latitude (phi2.cpp:11-68).

    Iterates ts = ts0 * ((1 - e sinPhi)/(1 + e sinPhi))^(e/2) with
    sinPhi = (1-ts^2)/(1+ts^2); tol 1e-10 on 2*(ts-old_ts), max 15 iters.
    Returns (phi, nonconverged_mask).
    """
    ts0 = np.asarray(ts0, dtype=np.float64)
    eccnth = 0.5 * e
    ts = ts0.copy()
    # non-finite lanes iterate once so IEEE propagation matches the
    # C loop (phi2.cpp): pow(nan, 0) == 1 keeps phi2(inf, 0) == -pi/2
    # while phi2(inf, inf) decays to nan (pj_phi2_test.cpp:65-84)
    active = np.ones(ts0.shape, dtype=bool)
    n_left = np.full(ts0.shape, 15, dtype=np.int32)
    for _ in range(15):
        if not np.any(active):
            break
        t = ts[active]
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            sin_phi = (1.0 - t * t) / (1.0 + t * t)
            con = e * sin_phi
            new_t = ts0[active] * np.power((1.0 - con) / (1.0 + con), eccnth)
            dphi = 2.0 * (new_t - t)
        ts[active] = new_t
        n_left[active] -= 1
        sub_active = (np.abs(dphi) > 1.0e-10) & (n_left[active] > 0)
        # also stop iterating non-finite lanes
        sub_active &= np.isfinite(new_t)
        idx = np.flatnonzero(active)
        active[idx[~sub_active]] = False
    nonconv = n_left <= 0
    return M_HALFPI - 2.0 * np.arctan(ts), nonconv


def enfn(es: float) -> np.ndarray:
    """Meridional-distance series coefficients (mlfn.cpp:26-45)."""
    C00, C02, C04, C06, C08 = 1.0, 0.25, 0.046875, 0.01953125, 0.01068115234375
    C22, C44, C46, C48 = 0.75, 0.46875, 0.01302083333333333333, 0.00712076822916666666
    C66, C68, C88 = 0.36458333333333333333, 0.00569661458333333333, 0.3076171875
    en = np.empty(5, dtype=np.float64)
    en[0] = C00 - es * (C02 + es * (C04 + es * (C06 + es * C08)))
    en[1] = es * (C22 - es * (C04 + es * (C06 + es * C08)))
    t = es * es
    en[2] = t * (C44 - es * (C46 + es * C48))
    t *= es
    en[3] = t * (C66 - es * C68)
    en[4] = t * es * C88
    return en


def mlfn(phi: np.ndarray, sphi: np.ndarray, cphi: np.ndarray, en: np.ndarray) -> np.ndarray:
    """Meridional distance (mlfn.hpp inline_pj_mlfn)."""
    cphi = cphi * sphi
    sphi = sphi * sphi
    return en[0] * phi - cphi * (en[1] + sphi * (en[2] + sphi * (en[3] + sphi * en[4])))


def inv_mlfn(arg: np.ndarray, es: float, en: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse meridional distance via Newton iteration
    (mlfn.hpp inline_pj_inv_mlfn): tol 1e-11 on the update, max 10 iters.
    Uses full sin/cos recomputation each step (the reference's
    small-angle shortcuts are float-identical to ~1e-14; we keep exact).
    Returns (phi, nonconverged_mask)."""
    arg = np.asarray(arg, dtype=np.float64)
    k = 1.0 / (1.0 - es)
    phi = arg.copy()
    active = np.isfinite(arg)
    converged = ~active  # non-finite lanes are "done" (and marked non-error)
    for _ in range(10):
        if not np.any(active):
            break
        p = phi[active]
        s = np.sin(p)
        c = np.cos(p)
        t = 1.0 - es * s * s
        t = (mlfn(p, s, c, en) - arg[active]) * (t * np.sqrt(t)) * k
        p = p - t
        phi[active] = p
        done = np.abs(t) < 1e-11
        idx = np.flatnonzero(active)
        converged[idx[done]] = True
        active[idx[done]] = False
    nonconv = ~converged & np.isfinite(arg)
    return phi, nonconv


def aasin(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Clamped arcsine (aasincos.cpp): |v| slightly >1 clamps; far >1 errors."""
    v = np.asarray(v, dtype=np.float64)
    av = np.abs(v)
    err = av > 1.0 + 1e-10
    clamped = np.clip(v, -1.0, 1.0)
    with np.errstate(invalid="ignore"):
        out = np.arcsin(clamped)
    out = np.where(err, np.where(v < 0, -M_HALFPI, M_HALFPI), out)
    return out, err


def aacos(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(v, dtype=np.float64)
    av = np.abs(v)
    err = av > 1.0 + 1e-10
    clamped = np.clip(v, -1.0, 1.0)
    with np.errstate(invalid="ignore"):
        out = np.arccos(clamped)
    out = np.where(err, np.where(v < 0, M_PI, 0.0), out)
    return out, err


def asqrt(v: np.ndarray) -> np.ndarray:
    return np.sqrt(np.maximum(v, 0.0))


def hypot(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return np.hypot(x, y)


def authset(es: float) -> np.ndarray:
    """Authalic→geodetic latitude series coefficients (auth.cpp:9-32)."""
    P00, P01, P02 = 0.33333333333333333333, 0.17222222222222222222, 0.10257936507936507937
    P10, P11, P20 = 0.06388888888888888888, 0.06640211640211640212, 0.01677689594356261023
    apa = np.empty(3)
    apa[0] = es * P00
    t = es * es
    apa[0] += t * P01
    apa[1] = t * P10
    t *= es
    apa[0] += t * P02
    apa[1] += t * P11
    apa[2] = t * P20
    return apa


def authlat(beta: np.ndarray, apa: np.ndarray) -> np.ndarray:
    """Geodetic latitude from authalic latitude (auth.cpp:33-38)."""
    t = beta + beta
    return beta + apa[0] * np.sin(t) + apa[1] * np.sin(t + t) + apa[2] * np.sin(t + t + t)


class Gauss:
    """Gaussian sphere mapping (gauss.cpp): ellipsoid ↔ conformal sphere."""

    def __init__(self, e: float, phi0: float):
        import math as _m

        es = e * e
        self.e = e
        sphi = _m.sin(phi0)
        cphi2 = _m.cos(phi0) ** 2
        self.rc = _m.sqrt(1.0 - es) / (1.0 - es * sphi * sphi)
        self.C = _m.sqrt(1.0 + es * cphi2 * cphi2 / (1.0 - es))
        self.chi = _m.asin(sphi / self.C)
        self.ratexp = 0.5 * self.C * e
        srat0 = ((1.0 - e * sphi) / (1.0 + e * sphi)) ** self.ratexp
        if 0.5 * phi0 + M_FORTPI < 1e-10:
            self.K = 1.0 / srat0
        else:
            self.K = _m.tan(0.5 * self.chi + M_FORTPI) / (
                _m.tan(0.5 * phi0 + M_FORTPI) ** self.C * srat0
            )

    def _srat(self, esinp, ratexp):
        return np.power((1.0 - esinp) / (1.0 + esinp), ratexp)

    def fwd(self, lam: np.ndarray, phi: np.ndarray):
        sphi = 2.0 * np.arctan(
            self.K
            * np.power(np.tan(0.5 * phi + M_FORTPI), self.C)
            * self._srat(self.e * np.sin(phi), self.ratexp)
        ) - M_HALFPI
        return self.C * lam, sphi

    def inv(self, slam: np.ndarray, sphi: np.ndarray):
        """Fixed-point inverse (gauss.cpp:86-105), max 20 iters, tol 1e-14.
        Returns (lam, phi, nonconverged)."""
        lam = slam / self.C
        num = np.power(np.tan(0.5 * sphi + M_FORTPI) / self.K, 1.0 / self.C)
        cur = sphi.copy()
        phi = cur.copy()
        active = np.isfinite(sphi)
        converged = ~active
        for _ in range(20):
            if not np.any(active):
                break
            p = 2.0 * np.arctan(
                num[active] * self._srat(self.e * np.sin(cur[active]), -0.5 * self.e)
            ) - M_HALFPI
            done = np.abs(p - cur[active]) < 1e-14
            phi[active] = p
            cur[active] = p
            idx = np.flatnonzero(active)
            converged[idx[done]] = True
            active[idx[done]] = False
        return lam, phi, ~converged & np.isfinite(sphi)


# ---------------------------------------------------------------------------
# Geodesic meridional distance (proj_mdist.cpp) — exact series, used by
# rouss.
# ---------------------------------------------------------------------------


def mdist_ini(es: float):
    """proj_mdist_ini (proj_mdist.cpp:34-78): series coefficients."""
    MAXI = 20
    ens = es
    numf = twon1 = denfi = 1.0
    denf = 1.0
    twon = 4.0
    E = [1.0]
    Es = 1.0
    El = 1.0
    i = 1
    while i < MAXI:
        numf *= twon1 * twon1
        den = twon * denf * denf * twon1
        T = numf / den
        E.append(T * ens)
        Es -= E[i]
        ens *= es
        twon *= 4.0
        denfi += 1.0
        denf *= denfi
        twon1 += 2.0
        i += 1
        if Es == El:
            break
        El = Es
    nb = i - 1
    b = [0.0] * i
    # the reference reassigns Es = 1 - Es before the b loop (proj_mdist.cpp:64)
    Es_run = 1.0 - Es
    b[0] = Es_run
    numf = denf = 1.0
    numfi = 2.0
    denfi = 3.0
    for j in range(1, i):
        Es_run -= E[j]
        numf *= numfi
        denf *= denfi
        b[j] = Es_run * numf / denf
        numfi += 2.0
        denfi += 2.0
    return {"nb": nb, "es": es, "E": Es, "b": np.array(b)}


def mdist(phi, sphi, cphi, md):
    """proj_mdist: geodesic meridional distance."""
    sc = sphi * cphi
    sphi2 = sphi * sphi
    D = phi * md["E"] - md["es"] * sc / np.sqrt(1.0 - md["es"] * sphi2)
    b = md["b"]
    s = np.full_like(np.asarray(phi, dtype=np.float64), b[md["nb"]])
    for i in range(md["nb"] - 1, -1, -1):
        s = b[i] + sphi2 * s
    return D + sc * s


def inv_mdist(dist, md):
    """proj_inv_mdist: Newton; returns (phi, nonconverged_mask)."""
    dist = np.asarray(dist, dtype=np.float64)
    k = 1.0 / (1.0 - md["es"])
    phi = dist.copy()
    active = np.isfinite(phi)
    nonconv = active.copy()
    for _ in range(20):
        if not np.any(active):
            break
        s = np.sin(phi[active])
        t = 1.0 - md["es"] * s * s
        step = (mdist(phi[active], s, np.cos(phi[active]), md) - dist[active]) \
            * (t * np.sqrt(t)) * k
        phi[active] = phi[active] - step
        done = np.abs(step) < 1e-14
        idx = np.flatnonzero(active)
        nonconv[idx[done]] = False
        active[idx[done]] = False
    return phi, nonconv
