"""SSIM / MS-SSIM — perceptual distortion metrics (beyond reference).

The reference evaluates PSNR only (train_helper.py:41-59); codec
comparisons conventionally also report MS-SSIM (Wang, Simoncelli &
Bovik 2003), which correlates much better with perceived quality at the
rates this framework targets. Definitions follow the original papers:

  * SSIM (Wang et al. 2004): 11×11 Gaussian window σ=1.5,
    C1=(0.01·L)², C2=(0.03·L)², L=1 for [0,1] images; population
    (not sample) covariance, per-channel then averaged.
  * MS-SSIM: 5 scales, weights (0.0448, 0.2856, 0.3001, 0.2363,
    0.1333); 2×2 average-pool downsampling between scales; the product
    of per-scale contrast·structure terms times the coarsest scale's
    luminance, each raised to its weight.

TPU shape: the Gaussian window is separable, so each blur is two rank-1
convolutions along H then W (`lax.conv_general_dilated` with a depthwise
feature_group_count) — pure fused elementwise + small convs, jittable and
vmappable; `ssim`/`ms_ssim` run fine inside a compiled eval.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ssim", "ms_ssim"]

_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur of an (H, W, C) image, VALID padding."""
    c = img.shape[-1]
    x = img.transpose(2, 0, 1)[:, None]  # (C, 1, H, W)
    kh = jnp.broadcast_to(kernel[None, None, :, None], (c, 1, kernel.size, 1))
    kw = jnp.broadcast_to(kernel[None, None, None, :], (c, 1, 1, kernel.size))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    # depthwise: one group per channel, batch axis carries the channels.
    # precision=HIGHEST is load-bearing on TPU: the default precision runs
    # convs as bf16 MXU passes, and the metric's E[x²]−E[x]² cancellation
    # then produces variances wrong enough to push SSIM terms >1 (measured
    # MS-SSIM 1.0086 on a 45 dB pair before the fix). The windows are
    # 11-tap — full-precision cost is negligible.
    x = jax.lax.conv_general_dilated(
        x.reshape(1, c, *x.shape[2:]), kh.reshape(c, 1, kernel.size, 1),
        (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kw.reshape(c, 1, 1, kernel.size),
        (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return x[0].transpose(1, 2, 0)  # (H', W', C)


def _ssim_terms(x, y, kernel, c1, c2):
    """Per-pixel (luminance·contrast-structure, contrast-structure) maps."""
    mu_x, mu_y = _blur(x, kernel), _blur(y, kernel)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    var_x = _blur(x * x, kernel) - mu_xx
    var_y = _blur(y * y, kernel) - mu_yy
    cov = _blur(x * y, kernel) - mu_xy
    cs = (2.0 * cov + c2) / (var_x + var_y + c2)
    lum = (2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)
    return lum * cs, cs


@partial(jax.jit, static_argnums=(2, 3))
def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    win_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM between two (H, W, C) images in [0, 1]."""
    kernel = jnp.asarray(_gaussian_kernel(win_size, sigma))
    c1, c2 = 0.01**2, 0.03**2
    full, _ = _ssim_terms(
        pred.astype(jnp.float32), target.astype(jnp.float32), kernel, c1, c2
    )
    return jnp.mean(full)


def _avg_pool2(img: jnp.ndarray) -> jnp.ndarray:
    """2×2 average pool (odd trailing row/col dropped, the conventional
    MS-SSIM downsampler)."""
    h, w, c = img.shape
    h2, w2 = h // 2, w // 2
    x = img[: h2 * 2, : w2 * 2]
    return x.reshape(h2, 2, w2, 2, c).mean(axis=(1, 3))


@partial(jax.jit, static_argnums=(2, 3, 4))
def ms_ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    levels: int = 5,
    win_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Multi-scale SSIM of two (H, W, C) images in [0, 1].

    Requires min(H, W) ≥ win_size · 2^(levels-1); pass a smaller `levels`
    for small images (weights are renormalized over the kept scales).
    """
    h, w = pred.shape[:2]
    if min(h, w) < win_size * 2 ** (levels - 1):
        raise ValueError(
            f"image {h}x{w} too small for {levels} MS-SSIM levels with "
            f"win_size={win_size}; reduce levels"
        )
    weights = np.asarray(_MS_WEIGHTS[:levels], np.float32)
    if levels < 5:  # renormalize kept scales (standard truncation rule)
        weights = weights / weights.sum()
    kernel = jnp.asarray(_gaussian_kernel(win_size, sigma))
    c1, c2 = 0.01**2, 0.03**2

    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    score = jnp.asarray(1.0, jnp.float32)
    for lvl in range(levels):
        full, cs = _ssim_terms(x, y, kernel, c1, c2)
        if lvl == levels - 1:
            score = score * jnp.maximum(jnp.mean(full), 0.0) ** weights[lvl]
        else:
            score = score * jnp.maximum(jnp.mean(cs), 0.0) ** weights[lvl]
            x, y = _avg_pool2(x), _avg_pool2(y)
    return score
