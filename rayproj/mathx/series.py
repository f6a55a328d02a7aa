"""Exact derivation of the geodesic integral expansions.

Instead of transcribing Karney's series coefficients, we derive them at
import time with exact rational arithmetic over trigonometric
polynomials: a series element is eps^m · poly(n) · cos(2lσ). This keeps
the engine free of hand-copied magic numbers — the expansion of

    sqrt(1 + k² sin²σ) = sqrt(1 − 2·eps·cos2σ + eps²) / (1 − eps)

(k² = 4·eps/(1−eps)²) and its reciprocal / I3 combination are computed
from first principles (Karney 2013, "Algorithms for geodesics", §5 —
the *method*; the numbers fall out of the algebra).

Produces, for a requested order N:
  I1: distance integral   ∫√(1+k²sin²σ)dσ  = A1·(σ + Σ C1l·sin2lσ)
  I2: 1/√ integral                          = A2·(σ + Σ C2l·sin2lσ)
  I3: longitude integral (n-dependent)      = A3·(σ + Σ C3l·sin2lσ)
as float polynomial tables evaluated per ellipsoid.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

ORDER = 8  # eps order kept (≥6 matches the reference's accuracy)

# A trig series: dict[(m, l)] -> coeff, meaning coeff · eps^m · cos(2lσ).
# coeff is a Poly-in-n: dict[j] -> Fraction for n^j (pure numbers use {0: c}).


def _pmul(a: dict, b: dict) -> dict:
    out: dict = {}
    for i, ca in a.items():
        for j, cb in b.items():
            out[i + j] = out.get(i + j, Fraction(0)) + ca * cb
    return {k: v for k, v in out.items() if v != 0}


def _padd(a: dict, b: dict) -> dict:
    out = dict(a)
    for j, cb in b.items():
        out[j] = out.get(j, Fraction(0)) + cb
    return {k: v for k, v in out.items() if v != 0}


def _pscale(a: dict, s: Fraction) -> dict:
    return {j: c * s for j, c in a.items() if c * s != 0}


def _tmul_simple(A: dict, B: dict, order: int) -> dict:
    """Cleaner multiply: expand cos products correctly."""
    out: dict = {}
    for (m1, l1), c1 in A.items():
        for (m2, l2), c2 in B.items():
            m = m1 + m2
            if m > order:
                continue
            c = _pmul(c1, c2)
            if l1 == 0 or l2 == 0:
                terms = [(l1 + l2, Fraction(1))]
            else:
                terms = [(l1 + l2, Fraction(1, 2)), (abs(l1 - l2), Fraction(1, 2))]
            for l, w in terms:
                key = (m, l)
                out[key] = _padd(out.get(key, {}), _pscale(c, w))
    return {k: v for k, v in out.items() if v}


def _tadd(A: dict, B: dict) -> dict:
    out = dict(A)
    for k, c in B.items():
        out[k] = _padd(out.get(k, {}), c)
    return {k: v for k, v in out.items() if v}


def _tscale(A: dict, s: Fraction) -> dict:
    return {k: _pscale(c, s) for k, c in A.items()}


_ONE = {(0, 0): {0: Fraction(1)}}


def _sqrt_series(order: int) -> dict:
    """sqrt(1 − 2·eps·cos2σ + eps²) = Π? — use sqrt(1−u) Taylor with
    u = 2·eps·cos2σ − eps²."""
    u = {(1, 1): {0: Fraction(2)}, (2, 0): {0: Fraction(-1)}}
    # sqrt(1-u) = Σ_k binom(1/2, k) (−u)^k
    out = dict(_ONE)
    term = dict(_ONE)  # u^k accumulator
    coef = Fraction(1)
    for k in range(1, order + 1):
        term = _tmul_simple(term, u, order)
        # binom(1/2, k)·(−1)^k = −(2k−2)! / (2^(2k−1)·k!·(k−1)!)  — build
        # recursively: c_k = c_{k−1} · (3−2k)/(2k) then times (−1):
        coef = coef * Fraction(2 * k - 3, 2 * k) if k > 1 else Fraction(-1, 2)
        # sqrt(1-u): coefficient of u^k is (-1)^k binom(1/2,k); combined
        # sign folds into the recursion below.
        out = _tadd(out, _tscale(term, coef))
    return out


def _recip(A: dict, order: int) -> dict:
    """1/A for trig series with constant leading coefficient."""
    a0 = A.get((0, 0), {}).get(0)
    assert a0 is not None
    inv0 = Fraction(1) / a0
    # Newton-ish: iterate R ← R·(2 − A·R)
    R = {(0, 0): {0: inv0}}
    for _ in range(order.bit_length() + 2):
        AR = _tmul_simple(A, R, order)
        two_minus = _tadd(_tscale(AR, Fraction(-1)), {(0, 0): {0: Fraction(2)}})
        R = _tmul_simple(R, two_minus, order)
    return R


def _integrate(A: dict):
    """∫A dσ = A00·σ + Σ (c_{m,l}/(2l))·sin2lσ. Returns (A_poly[m] for
    the σ coefficient per eps power, and sin table dict[(m,l)]→poly)."""
    sigma_coeff: dict[int, dict] = {}
    sin_tab: dict = {}
    for (m, l), c in A.items():
        if l == 0:
            sigma_coeff[m] = _padd(sigma_coeff.get(m, {}), c)
        else:
            sin_tab[(m, l)] = _padd(sin_tab.get(m, {}), _pscale(c, Fraction(1, 2 * l)))
    return sigma_coeff, sin_tab


def _derive(order: int = ORDER):
    S = _sqrt_series(order)  # sqrt(1 − 2 eps cos2σ + eps²)
    geom = {(m, 0): {0: Fraction(1)} for m in range(order + 1)}  # 1/(1−eps)
    # I1 integrand: S/(1−eps)
    I1 = _tmul_simple(S, geom, order)
    # I2 integrand: (1−eps)/S
    invS = _recip(S, order)
    one_minus = {(0, 0): {0: Fraction(1)}, (1, 0): {0: Fraction(-1)}}
    I2 = _tmul_simple(invS, one_minus, order)
    # I3 integrand: 2(1−eps) / ((1+n)(1−eps) + (1−n)·S)
    n1 = {(0, 0): {0: Fraction(1), 1: Fraction(1)}}   # (1+n)
    n2 = {(0, 0): {0: Fraction(1), 1: Fraction(-1)}}  # (1−n)
    D = _tadd(_tmul_simple(n1, one_minus, order), _tmul_simple(n2, S, order))
    I3 = _tmul_simple(_tscale(_tmul_simple(_recip(D, order), one_minus, order), Fraction(2)), _ONE, order)
    return tuple(_integrate(X) for X in (I1, I2, I3))


_I1_TAB, _I2_TAB, _I3_TAB = _derive()


def _eval_tables(tab, n_val: float, order: int = ORDER):
    """→ (sigma_poly desc-float tuple, [(l, desc-float tuple), ...]) for
    a given n. Coefficients are plain DESCENDING float tuples so the
    hot evaluators run a bare Horner loop — same multiply/add sequence
    as np.polyval (bit-identical results) without polyval's per-call
    list→array coercion and zeros_like allocation, which dominated the
    geodesic kernels (~25 µs/call × millions of calls in the gie
    corpus and the geod CLI)."""
    sigma_c, sin_tab = tab
    sig = np.zeros(order + 1)
    for m, poly in sigma_c.items():
        sig[m] = float(sum(float(c) * n_val ** j for j, c in poly.items()))
    sins: dict[int, np.ndarray] = {}
    for (m, l), poly in sin_tab.items():
        arr = sins.setdefault(l, np.zeros(order + 1))
        arr[m] = float(sum(float(c) * n_val ** j for j, c in poly.items()))
    sig_desc = tuple(float(v) for v in sig[::-1])
    sins_desc = [(l, tuple(float(v) for v in arr[::-1]))
                 for l, arr in sins.items()]
    return sig_desc, sins_desc


def _horner(coefs, x):
    """Horner over DESCENDING float coefficients — the same operation
    sequence as np.polyval (r = r*x + c, highest first)."""
    r = coefs[0] * x + coefs[1] if len(coefs) > 1 else coefs[0] * np.ones_like(x)
    for c in coefs[2:]:
        r = r * x + c
    return r


class GeodSeries:
    """Per-ellipsoid evaluated series for I1, I2, I3."""

    def __init__(self, n_val: float):
        self.I1 = _eval_tables(_I1_TAB, n_val)
        self.I2 = _eval_tables(_I2_TAB, n_val)
        self.I3 = _eval_tables(_I3_TAB, n_val)

    @staticmethod
    def _eval(tab, eps: np.ndarray, sigma: np.ndarray) -> np.ndarray:
        sig, sins = tab
        A = _horner(sig, eps)
        out = A * sigma
        for l, coefs in sins:
            out = out + _horner(coefs, eps) * np.sin(2 * l * sigma)
        return out

    @staticmethod
    def _A(tab, eps: np.ndarray) -> np.ndarray:
        return _horner(tab[0], eps)

    def I1_val(self, eps, sigma):
        return self._eval(self.I1, eps, sigma)

    def I2_val(self, eps, sigma):
        return self._eval(self.I2, eps, sigma)

    def I3_val(self, eps, sigma):
        return self._eval(self.I3, eps, sigma)

    def A1(self, eps):
        return self._A(self.I1, eps)

    def sigma_from_tau(self, eps, tau):
        """Invert I1/A1: Newton from σ₀ = τ (3–5 iterations)."""
        sig, sins = self.I1
        A = _horner(sig, eps)
        sigma = tau.copy()
        for _ in range(6):
            f = A * sigma
            df = A.copy() if isinstance(A, np.ndarray) else np.full_like(sigma, A)
            for l, coefs in sins:
                cl = _horner(coefs, eps)
                f = f + cl * np.sin(2 * l * sigma)
                df = df + 2 * l * cl * np.cos(2 * l * sigma)
            sigma = sigma - (f - A * tau) / df
        return sigma
