"""Fit the fast_sin / fast_cos polynomial coefficients (ops/fast_math.py).

Minimax-flavored fit: iterated weighted least squares on dense Chebyshev
nodes over [-pi, pi] (Lawson's algorithm — reweighting by the error drives
the LS solution toward the equioscillating minimax polynomial).

    sin(x) ~ x * P(x^2),  P of degree 5 in x^2  (degree-11 odd poly)
    cos(x) ~ Q(x^2),      Q of degree 6 in x^2  (degree-12 even poly)

Run:  python tools/fit_sin_poly.py
Prints the coefficients (highest order last, matching the _C* / _D*
constants in ops/fast_math.py) and the achieved max abs error.
"""
from __future__ import annotations

import numpy as np


def lawson_fit(x, y, basis, iters=60):
    """Weighted LS iterated with Lawson weight updates -> near-minimax."""
    A = np.stack([b(x) for b in basis], axis=1)
    w = np.ones_like(x)
    coef = None
    for _ in range(iters):
        Aw = A * w[:, None]
        coef, *_ = np.linalg.lstsq(Aw, y * w, rcond=None)
        err = np.abs(A @ coef - y)
        w = w * (1.0 + err / max(err.max(), 1e-300))
        w /= w.max()
    return coef


def fit_sin(degree=5, n=20001):
    # Chebyshev nodes on [-pi, pi]
    k = np.arange(n, dtype=np.float64)
    x = np.pi * np.cos(np.pi * (2 * k + 1) / (2 * n))
    x = x[np.abs(x) > 1e-9]  # avoid the 0/0 at the origin (sin(x)/x -> 1)
    y = np.sin(x) / x  # fit P(x^2) to sin(x)/x
    basis = [(lambda d: (lambda t: t ** (2 * d)))(d) for d in range(degree + 1)]
    return lawson_fit(x, y, basis)


def fit_cos(degree=6, n=20001):
    k = np.arange(n, dtype=np.float64)
    x = np.pi * np.cos(np.pi * (2 * k + 1) / (2 * n))
    y = np.cos(x)
    basis = [(lambda d: (lambda t: t ** (2 * d)))(d) for d in range(degree + 1)]
    return lawson_fit(x, y, basis)


def check(coefs, fn, odd):
    xs = np.linspace(-np.pi, np.pi, 400001)
    p = np.zeros_like(xs)
    for c in coefs[::-1]:
        p = p * xs**2 + c
    approx = xs * p if odd else p
    return np.abs(approx - fn(xs)).max()


if __name__ == "__main__":
    cs = fit_sin()
    print("sin coefficients (C0..C5):")
    for c in cs:
        print(f"  {c!r}")
    print(f"max |err| over [-pi,pi]: {check(cs, np.sin, odd=True):.3e}")

    cd = fit_cos()
    print("cos coefficients (D0..D6):")
    for c in cd:
        print(f"  {c!r}")
    print(f"max |err| over [-pi,pi]: {check(cd, np.cos, odd=False):.3e}")
