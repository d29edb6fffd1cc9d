"""SSIM / MS-SSIM metric tests (ops/ssim.py).

Gold check: an INDEPENDENT numpy implementation (explicit separable
sliding-window convolution, no JAX) reproduces the jitted metric to 1e-5.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from implicit_image_tpu.ops.ssim import _gaussian_kernel, ms_ssim, ssim


def _np_blur_valid(img, k):
    """Separable VALID convolution, plain numpy (H, W, C)."""
    r = len(k)
    h, w, c = img.shape
    out_h = np.zeros((h - r + 1, w, c))
    for i in range(r):
        out_h += k[i] * img[i : i + h - r + 1]
    out = np.zeros((h - r + 1, w - r + 1, c))
    for j in range(r):
        out += k[j] * out_h[:, j : j + w - r + 1]
    return out


def _np_ssim(x, y, win=11, sigma=1.5):
    k = _gaussian_kernel(win, sigma).astype(np.float64)
    c1, c2 = 0.01**2, 0.03**2
    mx, my = _np_blur_valid(x, k), _np_blur_valid(y, k)
    vx = _np_blur_valid(x * x, k) - mx * mx
    vy = _np_blur_valid(y * y, k) - my * my
    cov = _np_blur_valid(x * y, k) - mx * my
    num = (2 * mx * my + c1) * (2 * cov + c2)
    den = (mx * mx + my * my + c1) * (vx + vy + c2)
    return float(np.mean(num / den))


def _pair(seed=0, h=48, w=48, noise=0.03):
    rng = np.random.default_rng(seed)
    x = rng.random((h, w, 3))
    y = np.clip(x + rng.normal(0, noise, x.shape), 0, 1)
    return x, y


def test_ssim_identity_is_one():
    x, _ = _pair()
    assert float(ssim(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(1.0, abs=1e-6)


def test_ssim_matches_independent_numpy_gold():
    x, y = _pair()
    ours = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    gold = _np_ssim(x.astype(np.float64), y.astype(np.float64))
    assert ours == pytest.approx(gold, abs=1e-5)
    assert 0.5 < ours < 1.0  # mild noise: high but not perfect


def test_ssim_orders_by_distortion():
    x, y1 = _pair(noise=0.01)
    _, y2 = _pair(noise=0.10)
    s1 = float(ssim(jnp.asarray(x), jnp.asarray(y1)))
    s2 = float(ssim(jnp.asarray(x), jnp.asarray(y2)))
    assert s1 > s2


def test_ms_ssim_identity_and_ordering():
    x, y = _pair(h=192, w=192, noise=0.05)
    one = float(ms_ssim(jnp.asarray(x), jnp.asarray(x)))
    assert one == pytest.approx(1.0, abs=1e-5)
    noisy = float(ms_ssim(jnp.asarray(x), jnp.asarray(y)))
    assert 0.0 < noisy < one
    # blur hurts MS-SSIM more at fine scales than coarse: a heavily
    # noise-corrupted image must score below a mildly corrupted one
    _, y_mild = _pair(h=192, w=192, noise=0.01)
    assert float(ms_ssim(jnp.asarray(x), jnp.asarray(y_mild))) > noisy


def test_ms_ssim_levels_guard_and_truncation():
    x, y = _pair(h=64, w=64, noise=0.05)
    with pytest.raises(ValueError, match="too small"):
        ms_ssim(jnp.asarray(x), jnp.asarray(y), levels=5)
    # 3 levels fit 64px (11 * 2^2 = 44 <= 64) and renormalize weights
    v = float(ms_ssim(jnp.asarray(x), jnp.asarray(y), levels=3))
    assert 0.0 < v <= 1.0


def test_ssim_jit_and_grad_safe():
    """The metric is differentiable (usable as an auxiliary loss)."""
    import jax

    x, y = _pair(h=32, w=32)
    g = jax.grad(lambda a: ssim(a, jnp.asarray(y)))(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()


def test_rate_distortion_ms_ssim_axis():
    """visualize/rate_distortion.py accepts metric='ms_ssim' for both the
    codec ladders and the run store."""
    rng = np.random.default_rng(3)
    img = rng.random((64, 64, 3)).astype(np.float32)
    from implicit_image_tpu.visualize.rate_distortion import (
        traditional_rate_distortion,
    )

    pts = traditional_rate_distortion(img, "jpg", metric="ms_ssim")
    assert pts and all(0.0 < v <= 1.0 for _, v in pts)
    # higher quality -> higher MS-SSIM at the ladder extremes
    assert pts[-1][1] >= pts[0][1]
