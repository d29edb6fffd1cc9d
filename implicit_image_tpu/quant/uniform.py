"""Uniform affine fake-quantization — the QAT path.

The reference's QAT path delegates to torch.quantization with the fbgemm
qconfig (quant/context.py:35-47): per-tensor asymmetric uint8 affine
fake-quant on weights and activations, finalized by `convert`. Torch's
machinery does not exist on TPU; the capability is rebuilt as pure
straight-through-estimator fake-quant transforms:

  * `fake_quant(x, bits)` — observe min/max, quantize-dequantize with STE
    (rounding passes gradients through unchanged).
  * convert stores per-layer uint8 codes + (scale, zero_point), the moral
    equivalent of torch's quantized Linear packed params.

Unlike the k-means path (codebook indices), uniform quantization admits a
closed-form codebook: centroids = scale * (q - zero_point) for q in
[0, 2^bits). Convert therefore emits the SAME (labels, centroids) layout as
the k-means path so the entropy-coding bitstream handles both uniformly.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from implicit_image_tpu.quant.kmeans import LayerCodebook

__all__ = ["fake_quant", "uniform_quantize_weight"]


def _qparams(x: jnp.ndarray, bits: int):
    qmax = float(2**bits - 1)
    lo = jnp.minimum(jnp.min(x), 0.0)  # fbgemm-style: range includes 0
    hi = jnp.maximum(jnp.max(x), 0.0)
    scale = jnp.maximum((hi - lo) / qmax, 1e-12)
    zero_point = jnp.clip(jnp.round(-lo / scale), 0.0, qmax)
    return scale, zero_point, qmax


def fake_quant(x: jnp.ndarray, bits: int = 8) -> jnp.ndarray:
    """Quantize-dequantize with a straight-through gradient."""
    scale, zero_point, qmax = _qparams(x, bits)
    q = jnp.clip(jnp.round(x / scale + zero_point), 0.0, qmax)
    xq = (q - zero_point) * scale
    return x + jax.lax.stop_gradient(xq - x)


def uniform_quantize_weight(
    weight: jnp.ndarray, bits: int = 8
) -> Tuple[jnp.ndarray, LayerCodebook]:
    """Snap a weight tensor to the uniform grid; emit codebook form.

    Returns (snapped_weight, LayerCodebook) with
    centroids[q] = (q - zero_point) * scale, labels = q codes.
    """
    scale, zero_point, qmax = _qparams(weight, bits)
    q = jnp.clip(jnp.round(weight / scale + zero_point), 0.0, qmax).astype(jnp.int32)
    centroids = (jnp.arange(2**bits, dtype=weight.dtype) - zero_point) * scale
    snapped = centroids[q]
    return snapped, LayerCodebook(centroids=centroids, labels=q)
