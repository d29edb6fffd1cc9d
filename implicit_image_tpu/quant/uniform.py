"""Uniform fake-quantization — the QAT path (fbgemm semantics).

The reference's QAT path delegates to torch.quantization with the fbgemm
qconfig (quant/context.py:35-47). fbgemm's default QAT qconfig is:

  * weights: PER-CHANNEL SYMMETRIC int8 fake-quant over the output
    channel (torch default_per_channel_weight_fake_quant —
    MovingAveragePerChannelMinMaxObserver, qscheme per_channel_symmetric,
    [-128, 127]); QAT re-observes every step, so the effective weight
    qparams are the current min/max (averaging only matters across
    batches for activations),
  * activations: per-tensor affine uint8 with a moving-average min/max
    observer (averaging_constant 0.01).

Torch's machinery does not exist on TPU; the capability is rebuilt as
pure straight-through-estimator transforms gold-tested against torch's
own observers/fake-quant ops (tests/test_quant.py):

  * `fake_quant_per_channel(w, bits)` — the fbgemm weight scheme (the
    QAT default, QuantConfig.qscheme="per_channel").
  * `fake_quant(x, bits)` — per-tensor affine (qscheme="per_tensor",
    round-1's stand-in, kept for back-compat), also the activation form.
  * `ObserverState`/`observe_minmax` — MovingAverageMinMaxObserver
    semantics for activation ranges.
  * convert: per-tensor layers emit the same (labels, centroids) layout
    as k-means; per-channel layers emit (int8 codes, per-channel scales)
    — `PerChannelCodebook`, handled natively by the bitstream container.

Activation fake-quant never reaches the bitstream (only weights are
stored); `observe_minmax` + `fake_quant` give simulated-inference
activation quantization where a caller wants it.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from implicit_image_tpu.quant.kmeans import LayerCodebook

__all__ = [
    "fake_quant",
    "uniform_quantize_weight",
    "fake_quant_per_channel",
    "per_channel_quantize_weight",
    "PerChannelCodebook",
    "ObserverState",
    "observe_minmax",
]


class PerChannelCodebook(NamedTuple):
    """fbgemm-style per-channel symmetric weight quantization result.

    codes: int8 codes with the weight's shape (in, out); scales: (out,)
    per-output-channel scales. weight = codes * scales[None, :].
    """

    codes: jnp.ndarray
    scales: jnp.ndarray


class ObserverState(NamedTuple):
    """MovingAverageMinMaxObserver state (torch semantics: first batch
    initializes min/max, later batches EMA with averaging_constant)."""

    min_val: jnp.ndarray  # scalar
    max_val: jnp.ndarray  # scalar
    initialized: jnp.ndarray  # bool scalar


def observer_init() -> ObserverState:
    return ObserverState(
        min_val=jnp.zeros(()), max_val=jnp.zeros(()),
        initialized=jnp.zeros((), bool),
    )


def observe_minmax(
    state: ObserverState, x: jnp.ndarray, averaging_constant: float = 0.01
) -> ObserverState:
    bmin, bmax = jnp.min(x), jnp.max(x)
    c = averaging_constant
    new_min = jnp.where(
        state.initialized, state.min_val + c * (bmin - state.min_val), bmin
    )
    new_max = jnp.where(
        state.initialized, state.max_val + c * (bmax - state.max_val), bmax
    )
    return ObserverState(new_min, new_max, jnp.ones((), bool))


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


def _per_channel_qparams(weight: jnp.ndarray, bits: int, axis: int = 1):
    """Symmetric per-channel scales (torch per_channel_symmetric over the
    OUTPUT channel; our weight layout is (in, out) so axis=1). torch's
    formula: scale = max(-min, max) / ((qmax - qmin) / 2) with
    [qmin, qmax] = [-2^(b-1), 2^(b-1)-1] — i.e. amax / 127.5 for int8
    (verified equal to MovingAveragePerChannelMinMaxObserver.
    calculate_qparams in tests/test_quant.py)."""
    reduce_axes = tuple(i for i in range(weight.ndim) if i != axis)
    lo = jnp.min(weight, axis=reduce_axes)
    hi = jnp.max(weight, axis=reduce_axes)
    qmax = float(2 ** (bits - 1) - 1)
    amax = jnp.maximum(jnp.maximum(-lo, hi), 0.0)
    scale = jnp.maximum(amax / ((2.0**bits - 1.0) / 2.0), 1e-12)
    return scale, qmax


def fake_quant_per_channel(
    weight: jnp.ndarray, bits: int = 8, axis: int = 1
) -> jnp.ndarray:
    """fbgemm weight scheme: per-channel symmetric quantize-dequantize
    with a straight-through gradient (default_per_channel_weight_fake_
    quant semantics; QAT re-observes min/max every step)."""
    scale, qmax = _per_channel_qparams(weight, bits, axis)
    shape = [1] * weight.ndim
    shape[axis] = -1
    s = scale.reshape(shape)
    q = jnp.clip(jnp.round(weight / s), -qmax - 1, qmax)
    wq = q * s
    return weight + jax.lax.stop_gradient(wq - weight)


def per_channel_quantize_weight(
    weight: jnp.ndarray, bits: int = 8, axis: int = 1
) -> Tuple[jnp.ndarray, PerChannelCodebook]:
    """Snap to the per-channel symmetric grid; emit (codes, scales) for
    the bitstream container (coding/linear_state_dict stores int8 codes +
    per-channel scales; decode is codes * scales)."""
    scale, qmax = _per_channel_qparams(weight, bits, axis)
    shape = [1] * weight.ndim
    shape[axis] = -1
    s = scale.reshape(shape)
    q = jnp.clip(jnp.round(weight / s), -qmax - 1, qmax)
    snapped = q * s
    return snapped, PerChannelCodebook(
        codes=q.astype(jnp.int8), scales=scale.astype(weight.dtype)
    )
