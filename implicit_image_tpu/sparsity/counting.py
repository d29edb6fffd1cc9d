"""Sparse FLOPs / parameter-size accounting.

Capability parity with reference `masking/counting/` (MicroNet-challenge
counting: ops.py get_inference_FLOPs :13-87, micronet_challenge.count_ops
:161-285, get_sparse_size :120-138). The reference probes activation shapes
with forward hooks and walks nn.Modules; here the params pytree and masks
give everything directly.

Semantics preserved from the reference:
  * per-SAMPLE FLOPs for fully-connected layers (the reference counts one
    input sample; callers multiply by H·W for a full-grid pass)
  * a dot product of effective length n counts n mults + (n-1) adds;
    sparsity scales the effective fan-in (count_ops FullyConnected branch)
  * bias adds one addition per output; activation costs 1 mult ('relu'
    accounting — the reference applies the relu cost to SIREN's sine too)
  * sparse storage = nnz·param_bits + 1 bit/element mask (get_sparse_size)

Additionally `xla_cost_analysis` exposes the compiler's own cost model for
any jitted function — the TPU-native complement the reference lacked.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "layer_flops",
    "inference_flops",
    "dense_flops",
    "sparse_param_bits",
    "xla_cost_analysis",
]


def layer_flops(
    fan_in: int,
    fan_out: int,
    sparsity: float = 0.0,
    has_bias: bool = True,
    activation: bool = True,
) -> Tuple[float, float]:
    """(mults, adds) per input sample for one (possibly sparse) FC layer."""
    n_elements = fan_in * (1.0 - sparsity)
    mults = n_elements * fan_out
    adds = (n_elements - 1.0) * fan_out
    if has_bias:
        adds += fan_out
    if activation:
        mults += fan_out  # 'relu' accounting (micronet_challenge.py:106-110)
    return mults, adds


def _mask_sparsity(weight, mask) -> float:
    arr = np.asarray(weight if mask is None else mask)
    return float((arr == 0).sum() / arr.size)


def inference_flops(params, masks: Optional[Sequence] = None) -> float:
    """Per-sample forward FLOPs at the ACTUAL weight sparsity
    (reference Masking.inference_FLOPs, core.py:362-384)."""
    total = 0.0
    n = len(params)
    widx = [i for i, layer in enumerate(params) if "w" in layer]
    for j, i in enumerate(widx):
        layer = params[i]
        fan_in, fan_out = layer["w"].shape[-2], layer["w"].shape[-1]
        mask = masks[i] if masks is not None else None
        s = _mask_sparsity(layer["w"], mask)
        mults, adds = layer_flops(
            fan_in,
            fan_out,
            sparsity=s,
            has_bias="b" in layer,
            activation=(j < len(widx) - 1),
        )
        total += mults + adds
    return total


def dense_flops(params) -> float:
    """Per-sample forward FLOPs of the dense model (core.py:229)."""
    dense_params = tuple(
        {k: np.asarray(v) * 0 + 1.0 for k, v in layer.items()} for layer in params
    )
    return inference_flops(dense_params, None)


def sparse_param_bits(params, masks=None, param_bits: int = 32) -> float:
    """Bits to store the (sparse) weights+biases (get_sparse_size)."""
    total = 0.0
    for i, layer in enumerate(params):
        for k, v in layer.items():
            arr = np.asarray(v)
            if k == "w" and masks is not None and masks[i] is not None:
                s = _mask_sparsity(v, masks[i])
            else:
                s = float((arr == 0).sum() / arr.size)
            bits = arr.size * param_bits * (1.0 - s)
            if s > 0:
                bits += arr.size  # 1-bit mask
            total += bits
    return total


def xla_cost_analysis(fn, *example_args) -> dict:
    """The compiler's cost model for a jitted fn: flops / bytes accessed.

    TPU-native replacement for hook-based probing: jit(...).lower().compile()
    .cost_analysis() (SURVEY.md §5).
    """
    import jax

    compiled = jax.jit(fn).lower(*example_args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return dict(ca) if ca else {}
