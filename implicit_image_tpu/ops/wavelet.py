"""2-D single-level db3 DWT / IDWT in pure XLA (conv-based lifting).

TPU-native replacement for the reference's `pytorch_wavelets`
DWTForward/DWTInverse(wave="db3", mode="zero") used by WaveletSiren
(reference models/wavelet_siren.py:61-62,90). Implemented as separable
strided convolutions (analysis) and transposed convolutions (synthesis)
with zero padding — the standard PyWavelets convention:

  analysis:  full conv with the decomposition filter, downsample odd
             indices -> length floor((N + L - 1) / 2)
  synthesis: upsample by 2, full conv with the reconstruction filter,
             crop L-2 from both ends -> length 2M - L + 2

For even N this is a perfect-reconstruction pair (verified in
tests/test_wavelet.py). Filters are the Daubechies-3 coefficients.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dwt2", "idwt2", "dwt_coeff_len", "DB3_DEC_LO"]

# Daubechies-3 decomposition low-pass filter (PyWavelets ordering).
DB3_DEC_LO = np.array(
    [
        0.035226291882100656,
        -0.08544127388224149,
        -0.13501102001039084,
        0.4598775021193313,
        0.8068915093133388,
        0.3326705529509569,
    ],
    dtype=np.float64,
)


def _filters():
    dec_lo = DB3_DEC_LO
    # QMF relation, PyWavelets sign convention (pywt.Wavelet('db3').dec_hi):
    # dec_hi[n] = (-1)^(n+1) * dec_lo[L-1-n]
    dec_hi = np.array(
        [((-1.0) ** (n + 1)) * dec_lo[len(dec_lo) - 1 - n] for n in range(len(dec_lo))]
    )
    rec_lo = dec_lo[::-1].copy()
    rec_hi = dec_hi[::-1].copy()
    return dec_lo, dec_hi, rec_lo, rec_hi


_L = len(DB3_DEC_LO)


def dwt_coeff_len(n: int) -> int:
    """Coefficient length for zero-padded DWT of a length-n signal."""
    return (n + _L - 1) // 2


def _conv_axis(x: jnp.ndarray, filt: np.ndarray, axis: int) -> jnp.ndarray:
    """Full convolution + odd-index downsample along one spatial axis.

    x: (H, W). Returns the analysis coefficients along `axis`.
    """
    L = len(filt)
    # XLA convs correlate; flip to convolve.
    k = jnp.asarray(filt[::-1].copy(), x.dtype)
    lhs = x[None, None, :, :]
    if axis == 0:
        rhs = k[None, None, :, None]
        pad = ((L - 2, L - 1), (0, 0))
        strides = (2, 1)
    else:
        rhs = k[None, None, None, :]
        pad = ((0, 0), (L - 2, L - 1))
        strides = (1, 2)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=strides, padding=pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def _iconv_axis(x: jnp.ndarray, filt: np.ndarray, axis: int, out_len: int) -> jnp.ndarray:
    """Upsample-by-2 full convolution, cropped to out_len, along one axis."""
    L = len(filt)
    k = jnp.asarray(filt[::-1].copy(), x.dtype)
    lhs = x[None, None, :, :]
    if axis == 0:
        rhs = k[None, None, :, None]
        pad = ((L - 1, L - 1), (0, 0))
        dil = (2, 1)
    else:
        rhs = k[None, None, None, :]
        pad = ((0, 0), (L - 1, L - 1))
        dil = (1, 2)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding=pad,
        lhs_dilation=dil,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    start = L - 2
    if axis == 0:
        return jax.lax.dynamic_slice_in_dim(out, start, out_len, axis=0)
    return jax.lax.dynamic_slice_in_dim(out, start, out_len, axis=1)


def dwt2(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-level 2-D db3 DWT of (H, W) -> (LL, LH, HL, HH).

    Band order matches pytorch_wavelets' Yh stacking: LH (horizontal
    detail), HL (vertical detail), HH (diagonal).
    """
    dec_lo, dec_hi, _, _ = _filters()
    lo_r = _conv_axis(x, dec_lo, axis=0)
    hi_r = _conv_axis(x, dec_hi, axis=0)
    ll = _conv_axis(lo_r, dec_lo, axis=1)
    lh = _conv_axis(lo_r, dec_hi, axis=1)
    hl = _conv_axis(hi_r, dec_lo, axis=1)
    hh = _conv_axis(hi_r, dec_hi, axis=1)
    return ll, lh, hl, hh


def idwt2(
    ll: jnp.ndarray,
    lh: jnp.ndarray,
    hl: jnp.ndarray,
    hh: jnp.ndarray,
    out_shape: Tuple[int, int],
) -> jnp.ndarray:
    """Single-level 2-D db3 inverse DWT -> (H, W) == out_shape."""
    _, _, rec_lo, rec_hi = _filters()
    h, w = out_shape
    lo_r = _iconv_axis(ll, rec_lo, axis=1, out_len=w) + _iconv_axis(
        lh, rec_hi, axis=1, out_len=w
    )
    hi_r = _iconv_axis(hl, rec_lo, axis=1, out_len=w) + _iconv_axis(
        hh, rec_hi, axis=1, out_len=w
    )
    return _iconv_axis(lo_r, rec_lo, axis=0, out_len=h) + _iconv_axis(
        hi_r, rec_hi, axis=0, out_len=h
    )
