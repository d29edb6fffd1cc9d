"""Fast transcendental approximations for the VPU.

XLA's `sin` on TPU does generic double-word range reduction and measures
~15 G evals/s on v5e; SIREN's hot path evaluates H·W·width·depth sines per
step, making sin — not the MXU matmuls — the bottleneck (profiled in
BASELINE.md). `fast_sin` is a degree-11 odd minimax polynomial on [-π, π]
after a single-fma range reduction:

    r = x - 2π·round(x/2π);  sin(x) ≈ r·P(r²)

Max abs error 9.2e-6 over |x| ≤ 50 (coefficients fitted by iterated
weighted least squares on Chebyshev nodes; see tools/fit_sin_poly.py) —
two orders of magnitude below bfloat16 resolution and far below the
training noise floor, at ~7x the throughput of XLA's sin (107 vs 15 G/s
measured on v5e). Used by default in the SIREN forward; exact sin is
available via SirenConfig(fast_sine=False).

Note on range: float32 round(x/2π) loses relative precision for |x| ≳ 1e4;
SIREN pre-activations are O(ω₀·|Wx+b|) ≈ O(30·3) in practice, so the
reduction is exact to float32 for this workload.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["fast_sin", "fast_cos"]

_INV2PI = 0.15915494309189535
_2PI = 6.283185307179586
# sin(x) = x * P(x^2): degree-11 odd minimax on [-pi, pi]
_C0 = 0.9999996030550975
_C1 = -0.1666655332933119
_C2 = 0.008332407064488198
_C3 = -0.00019808729483123406
_C4 = 2.6998131630169804e-06
_C5 = -2.036590317570578e-08


def fast_sin(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    r = x - _2PI * jnp.round(x * _INV2PI)
    r2 = r * r
    p = _C5
    for c in (_C4, _C3, _C2, _C1, _C0):
        p = p * r2 + c
    return r * p


# cos(x) = Q(x^2): degree-12 even minimax on [-pi, pi], max err 1.1e-8
_D0 = 0.9999999892018047
_D1 = -0.4999998918402563
_D2 = 0.04166649019185378
_D3 = -0.0013887807813544165
_D4 = 2.4769966014001128e-05
_D5 = -2.707977385440803e-07
_D6 = 1.7247600397804802e-09


def fast_cos(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    r = x - _2PI * jnp.round(x * _INV2PI)
    r2 = r * r
    p = _D6
    for c in (_D5, _D4, _D3, _D2, _D1, _D0):
        p = p * r2 + c
    return p
