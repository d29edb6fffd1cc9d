"""Distortion metrics — protocol parity with the reference.

Reference definitions (train_helper.py:41-59):
  * float PSNR  = 10 * log10(1 / MSE) on [0,1] prediction vs ground truth
  * 8-bit PSNR  = 10 * log10(255^2 / MSE_8bit) where both images are scaled
    by 255 and cast to int with TRUNCATION (torch `.int()`), not rounding.
    The truncation quirk is replicated deliberately: it is the metric the
    reference's R-D curves were measured with.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["mse", "psnr", "psnr_8bit", "eval_metrics"]


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(diff * diff)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Float PSNR on [0,1] images (reference train_helper.py:54-55)."""
    return 10.0 * jnp.log10(1.0 / mse(pred, target))


def psnr_8bit(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """8-bit PSNR with int truncation (reference train_helper.py:51-57)."""
    pred_8 = (pred * 255.0).astype(jnp.int32)
    target_8 = (target * 255.0).astype(jnp.int32)
    diff = (target_8 - pred_8).astype(jnp.float32)
    mse_8 = jnp.mean(diff * diff)
    return 10.0 * jnp.log10(255.0**2 / mse_8)


def eval_metrics(pred: jnp.ndarray, target: jnp.ndarray):
    """(loss, PSNR, PSNR_8bit) triple, mirroring eval_epoch's returns."""
    loss = mse(pred, target)
    return loss, 10.0 * jnp.log10(1.0 / loss), psnr_8bit(pred, target)
