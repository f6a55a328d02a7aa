"""Bit-identity of the buffer-reuse cart kernels vs the naive form.

The production `Cart._fwd/_inv` (rayproj/ops/cart.py) are written with
in-place buffer reuse, masked assignment instead of full-width
``np.where``, and a lazy polar fallback — but keep the exact operand
association of the straightforward expressions (math per reference
src/conversions/cart.cpp:132-215). These tests pin that contract:
results must be BIT-identical (NaNs included) to the naive
re-evaluation below on randoms, poles, axis/degenerate points and the
zero vector, for both an ellipsoid and a sphere.
"""

from __future__ import annotations

import numpy as np
import pytest

from rayproj.core.constants import M_HALFPI
from rayproj.core.factory import create_operation
from rayproj.core.op import Coords


def naive_fwd(ell, lam, phi, h):
    a, es = ell.a, ell.es
    cosphi = np.cos(phi)
    sinphi = np.sin(phi)
    N = a / np.sqrt(1 - es * sinphi * sinphi) if es != 0 else np.full_like(phi, a)
    x = (N + h) * cosphi * np.cos(lam)
    y = (N + h) * cosphi * np.sin(lam)
    z = (N * (1 - es) + h) * sinphi
    return x, y, z


def naive_inv(ell, X, Y, Z):
    a, b, es, e2s = ell.a, ell.b, ell.es, ell.e2s
    p = np.hypot(X, Y)
    y_theta = Z * a
    x_theta = p * b
    norm = np.hypot(y_theta, x_theta)
    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.where(norm == 0, 1.0, x_theta / norm)
        s = np.where(norm == 0, 0.0, y_theta / norm)
    y_phi = Z + e2s * b * s * s * s
    x_phi = p - es * a * c * c * c
    norm_phi = np.hypot(y_phi, x_phi)
    with np.errstate(divide="ignore", invalid="ignore"):
        cosphi = np.where(norm_phi == 0, 1.0, x_phi / norm_phi)
        sinphi = np.where(norm_phi == 0, 0.0, y_phi / norm_phi)
    degenerate = x_phi <= 0
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.where(
            degenerate,
            np.where(Z >= 0, M_HALFPI, -M_HALFPI),
            np.arctan(y_phi / x_phi),
        )
    cosphi = np.where(degenerate, 0.0, cosphi)
    sinphi = np.where(degenerate, np.where(Z >= 0, 1.0, -1.0), sinphi)
    lam = np.arctan2(Y, X)
    near_pole = cosphi < 1e-6
    r = np.hypot(a * a * cosphi, b * b * sinphi) / np.hypot(a * cosphi, b * sinphi)
    N = a / np.sqrt(1 - es * sinphi * sinphi) if es != 0 else np.full_like(phi, a)
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.where(near_pole, np.abs(Z) - r, p / cosphi - N)
    return lam, phi, z


def _cart(defn):
    op = create_operation(defn)
    # pipeline-less bare op
    return op


def _angular_fixture(rng, n=4096):
    lam = rng.uniform(-np.pi, np.pi, n)
    phi = rng.uniform(-M_HALFPI, M_HALFPI, n)
    h = rng.uniform(-1e4, 1e5, n)
    # exact poles, near-poles (inside the 89.99994 deg fallback band),
    # equator, zero height
    lam[:8] = [0.0, 1.0, -2.0, 3.0, 0.5, -0.5, np.pi, -np.pi]
    phi[:2] = [M_HALFPI, -M_HALFPI]
    phi[2:4] = [M_HALFPI - 1e-9, -(M_HALFPI - 1e-9)]
    phi[4:6] = [M_HALFPI - 5e-7, 0.0]
    h[:8] = 0.0
    return lam, phi, h


@pytest.mark.parametrize("defn", ["+proj=cart +ellps=GRS80",
                                  "+proj=cart +ellps=bessel",
                                  "+proj=cart +R=6371000"])
def test_fwd_bit_identical(defn):
    op = _cart(defn)
    rng = np.random.default_rng(11)
    lam, phi, h = _angular_fixture(rng)
    coo = Coords(lam.copy(), phi.copy(), h.copy())
    op._fwd(coo)
    ex, ey, ez = naive_fwd(op.ell, lam, phi, h)
    np.testing.assert_array_equal(coo.x, ex)
    np.testing.assert_array_equal(coo.y, ey)
    np.testing.assert_array_equal(coo.z, ez)


@pytest.mark.parametrize("defn", ["+proj=cart +ellps=GRS80",
                                  "+proj=cart +ellps=bessel",
                                  "+proj=cart +R=6371000"])
def test_inv_bit_identical(defn):
    op = _cart(defn)
    rng = np.random.default_rng(13)
    lam, phi, h = _angular_fixture(rng)
    X, Y, Z = naive_fwd(op.ell, lam, phi, h)
    # degenerate/edge cartesian lanes: origin (norm==0), the polar
    # axis (X=Y=0, hits x_phi<=0), points on the equatorial plane,
    # and a NaN lane
    X[:6] = [0.0, 0.0, 0.0, op.ell.a, 0.0, np.nan]
    Y[:6] = [0.0, 0.0, 0.0, 0.0, op.ell.b, np.nan]
    Z[:6] = [0.0, op.ell.b, -op.ell.b, 0.0, 0.0, np.nan]
    coo = Coords(X.copy(), Y.copy(), Z.copy())
    op._inv(coo)
    el, ep, ez = naive_inv(op.ell, X, Y, Z)
    np.testing.assert_array_equal(coo.x, el)
    np.testing.assert_array_equal(coo.y, ep)
    np.testing.assert_array_equal(coo.z, ez)


def test_roundtrip_tolerance():
    """fwd∘inv returns the input to sub-mm (sanity on top of
    bit-identity — catches a naive-form bug replicated into both)."""
    op = _cart("+proj=cart +ellps=GRS80")
    rng = np.random.default_rng(17)
    lam, phi, h = _angular_fixture(rng)
    coo = Coords(lam.copy(), phi.copy(), h.copy())
    op._fwd(coo)
    op._inv(coo)
    keep = np.abs(phi) < M_HALFPI - 1e-6  # polar fallback loses lam
    np.testing.assert_allclose(coo.x[keep], lam[keep], atol=1e-12)
    np.testing.assert_allclose(coo.y[keep], phi[keep], atol=1e-12)
    np.testing.assert_allclose(coo.z[keep], h[keep], atol=1e-7)
