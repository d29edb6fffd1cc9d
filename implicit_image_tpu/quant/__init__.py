"""Quantization subsystem — functional equivalent of the reference's
`with Quantize(model, optim, cfg) as q: ... q.convert()` context
(quant/context.py:10-53).

Pipeline position (compress.py:172-240): after the (sparse) fit, a fresh
optimizer is built in quantize mode, the model trains `num_steps` more steps
with weights snapped to the codebook every forward, and `convert()`
freezes (labels, centroids) per quantized layer.

Functional design: `quantize_params` is a pure transform applied inside the
quant-phase train step (training/quant_phase.py); `convert` maps final
params -> a QuantizedParams pytree consumed by the entropy coder
(coding/). `skip_layers` mirrors conf/quant/kmeans.yaml's skip_ll
(first & last Linear kept full precision).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax.numpy as jnp

from implicit_image_tpu.quant.kmeans import (
    LayerCodebook,
    ecvq_refine,
    kmeans_fit,
    quantize_weight,
)
from implicit_image_tpu.quant.uniform import (
    ObserverState,
    PerChannelCodebook,
    fake_quant,
    fake_quant_per_channel,
    observe_minmax,
    per_channel_quantize_weight,
    uniform_quantize_weight,
)

__all__ = [
    "QuantConfig",
    "LayerCodebook",
    "PerChannelCodebook",
    "ObserverState",
    "observe_minmax",
    "kmeans_fit",
    "quantize_weight",
    "ecvq_refine",
    "uniform_quantize_weight",
    "per_channel_quantize_weight",
    "fake_quant",
    "fake_quant_per_channel",
    "quantize_params",
    "convert",
    "dequantize",
    "quantized_layer_indices",
]


@dataclass(frozen=True)
class QuantConfig:
    """Mirrors conf/quant/{kmeans,qat}.yaml."""

    name: str = "KMeans"  # "KMeans" | "QAT"
    bits: int = 8
    num_steps: int = 100
    log_steps: int = 10
    lloyd_iters: int = 5
    # Entropy-constrained assignment (ECVQ) strength; 0 = plain k-means
    # (reference parity). λ≈1 trades ~one mean quant error per label bit —
    # see quant/kmeans.py ecvq_refine. KMeans mode only.
    ecvq_lambda: float = 0.0
    ecvq_iters: int = 10
    # Layer indices (into the params tuple) kept full precision; None means
    # the first and last weight-bearing layers, the reference's default
    # skip_ll = [layers.0.linear, layers.7.linear] (conf/quant/kmeans.yaml).
    skip_layers: Optional[Tuple[int, ...]] = None
    # QAT weight scheme: "per_channel" = fbgemm's default QAT qconfig
    # (per-output-channel symmetric int8, quant/uniform.py, gold-tested
    # vs torch.quantization); "per_tensor" = round-1's affine stand-in.
    qscheme: str = "per_channel"
    # Finetune base lr; None = inherit optim.lr, the reference's behavior
    # (compress.py:174-177 builds the quant optimizer from cfg.optim).
    # Setting it decouples the finetune step size from the fit's — the
    # lever that lets a cosine-annealed fit keep its converged params
    # through the codebook finetune (BASELINE.md cosine A/B: fresh Adam
    # at the fit lr drifts an annealed model ~1 dB).
    lr: Optional[float] = None
    # Per-layer codebook-size override, indexed by params-tuple position:
    # entry i (when not None) replaces `bits` for layer i. Beyond-reference
    # R-D lever — the reference codes EVERY layer at the same bit width
    # (conf/quant/kmeans.yaml bits: 8; 9 for two images) while layer
    # sensitivity varies by >10x; quant/allocate.py searches this space
    # (quant.bit_alloc=auto). KMeans mode only. The container needs no
    # format change: centroid counts are per-tensor in the manifest.
    bits_per_layer: Optional[Tuple[Optional[int], ...]] = None
    # Finetune-target row subsample: optimize the codebooks against every
    # `row_stride`-th image row instead of the full grid. Encoder-side
    # only (the bitstream and the decoded image are full-resolution);
    # centroid gradients are sums over thousands of member weights, so a
    # 4x row subsample was measured R-D neutral at the flagship point
    # while cutting the finetune wall ~2x (BASELINE.md "Quant-phase
    # breakdown"). A row subset of a tensor-product grid is itself a
    # tensor product, so CoordX keeps its separable fast path. 1 = full
    # grid (reference parity).
    row_stride: int = 1

    def __post_init__(self):
        assert self.name in ("KMeans", "QAT"), self.name
        assert self.qscheme in ("per_channel", "per_tensor"), self.qscheme
        assert int(self.row_stride) >= 1, self.row_stride
        if self.bits_per_layer is not None:
            assert self.name == "KMeans", "bits_per_layer is KMeans-only"
            assert all(
                b is None or 2 <= int(b) <= 16 for b in self.bits_per_layer
            ), self.bits_per_layer

    def layer_bits(self, i: int) -> int:
        """Codebook bits for params-layer i (bits_per_layer override,
        else the global `bits`)."""
        bpl = self.bits_per_layer
        if bpl is not None and i < len(bpl) and bpl[i] is not None:
            return int(bpl[i])
        return self.bits


def quantized_layer_indices(params, cfg: QuantConfig) -> List[int]:
    """Weight-bearing layer indices subject to quantization.

    Besides the reference's first/last skip, layers with fewer weights
    than codebook entries are kept full precision — k-means with more
    centroids than points degenerates and the labels+centroids container
    cannot beat the raw tensor (e.g. CoordX's 1×C branch-entry layers)."""
    widx = [i for i, layer in enumerate(params) if "w" in layer]
    if cfg.skip_layers is not None:
        skip = set(cfg.skip_layers)
    else:
        skip = {widx[0], widx[-1]} if widx else set()
    skip |= {i for i in widx if params[i]["w"].size < 2 ** cfg.layer_bits(i)}
    return [i for i in widx if i not in skip]


def _snap(weight: jnp.ndarray, cfg: QuantConfig, i: int = -1):
    bits = cfg.layer_bits(i) if i >= 0 else cfg.bits
    if cfg.name == "KMeans":
        return quantize_weight(weight, bits, cfg.lloyd_iters)
    if cfg.qscheme == "per_channel":
        return per_channel_quantize_weight(weight, bits)
    return uniform_quantize_weight(weight, bits)


def quantize_params(params, cfg: QuantConfig):
    """Snap every quantized layer's weights to its codebook (pure).

    The forward-pre-hook re-clustering of the reference (kmeans.py:65-71),
    applied functionally once per quant-phase train step.
    """
    qidx = set(quantized_layer_indices(params, cfg))
    out = []
    for i, layer in enumerate(params):
        if i in qidx:
            snapped, _ = _snap(layer["w"], cfg, i)
            out.append({**layer, "w": snapped})
        else:
            out.append(layer)
    return tuple(out)


def convert(params, cfg: QuantConfig):
    """Finalize quantization — reference q.convert() / update_weights()
    (kmeans.py:73-100). Returns (snapped_params, codebooks) where
    codebooks[i] is a LayerCodebook for quantized layers, None otherwise.
    """
    qidx = set(quantized_layer_indices(params, cfg))
    out, books = [], []
    for i, layer in enumerate(params):
        if i in qidx:
            snapped, book = _snap(layer["w"], cfg, i)
            out.append({**layer, "w": snapped})
            books.append(book)
        else:
            out.append(layer)
            books.append(None)
    return tuple(out), tuple(books)


def dequantize(labels: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """weight = centroids[labels] (reference entropy_coding/__init__.py:170-185)."""
    return jnp.asarray(centroids)[jnp.asarray(labels).astype(jnp.int32)]
