"""Prune functions — jittable, rank-based (static shapes, dynamic k).

Capability parity with reference `masking/funcs/prune.py` registry
{magnitude, global-magnitude, struct-magnitude-max, struct-magnitude-mean}:
  * magnitude_prune (prune.py:24-51): zero the k smallest |w| where
    k = zeros + ceil(prune_rate * nonzeros).
  * global_magnitude_prune (prune.py:54-104): the reference searches a
    global threshold iteratively (approximate, up to `tolerance`); here we
    compute the EXACT global top-k via ranking — deterministic, jittable,
    and strictly tighter than the reference's adaptive search.
  * struct_magnitude_prune (prune.py:107-154): channel-structured variant
    for 4D kernels.

TPU-native encoding of "sort + take k smallest" with a *traced* k: ranks via
double argsort (one XLA sort, static shape) compared against the dynamic
scalar k. Layer tensors here are ≤ width² floats, so sorts are negligible
next to the (H·W × width) fit matmuls.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp

__all__ = [
    "ranks_ascending",
    "ranks_descending",
    "magnitude_prune",
    "global_magnitude_prune",
    "struct_magnitude_prune",
    "registry_names",
]

registry_names = (
    "magnitude",
    "global-magnitude",
    "struct-magnitude-max",
    "struct-magnitude-mean",
)


def ranks_ascending(x: jnp.ndarray) -> jnp.ndarray:
    """rank[i] = position of x[i] in the ascending sort (ties broken by index)."""
    flat = x.reshape(-1)
    order = jnp.argsort(flat)
    return jnp.zeros_like(order).at[order].set(jnp.arange(flat.size)).reshape(x.shape)


def ranks_descending(x: jnp.ndarray) -> jnp.ndarray:
    return ranks_ascending(-x)


def magnitude_prune(
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    prune_rate: jnp.ndarray,
    nonzeros: jnp.ndarray,
) -> jnp.ndarray:
    """Layer-wise magnitude pruning (reference prune.py:24-51).

    num_remove = ceil(prune_rate * nonzeros); the k = zeros + num_remove
    smallest-|w| positions are zeroed. Masked-out entries score -1 so they
    always occupy the lowest ranks (the reference relies on masked weights
    being exactly 0 for the same effect).
    """
    numel = mask.size
    num_remove = jnp.ceil(prune_rate * nonzeros)
    zeros = numel - nonzeros
    k = zeros + num_remove
    scores = jnp.where(mask > 0, jnp.abs(weight), -1.0)
    ranks = ranks_ascending(scores)
    return mask * (ranks >= k).astype(mask.dtype)


def global_magnitude_prune(
    masks: Sequence[Optional[jnp.ndarray]],
    weights: Sequence[jnp.ndarray],
    prune_rate: jnp.ndarray,
    baseline_nonzero: jnp.ndarray,
) -> Tuple[List[Optional[jnp.ndarray]], jnp.ndarray]:
    """Exact global magnitude (L1) pruning across all masked layers.

    tokill = ceil(prune_rate * baseline_nonzero) weights with globally
    smallest |w| are removed (reference prune.py:54-104 approximates this
    with an adaptive threshold; we rank exactly). Returns (new_masks,
    total_removed).
    """
    live = [i for i, m in enumerate(masks) if m is not None]
    scores = jnp.concatenate(
        [
            jnp.where(masks[i] > 0, jnp.abs(weights[i]), -1.0).reshape(-1)
            for i in live
        ]
    )
    total_nonzero = sum(jnp.sum(masks[i]) for i in live)
    tokill = jnp.ceil(prune_rate * baseline_nonzero)
    keep_k = total_nonzero - tokill
    ranks = ranks_descending(scores)
    keep = (ranks < keep_k).astype(jnp.float32)

    new_masks: List[Optional[jnp.ndarray]] = list(masks)
    offset = 0
    for i in live:
        n = masks[i].size
        new_masks[i] = masks[i] * keep[offset : offset + n].reshape(masks[i].shape)
        offset += n
    total_removed = total_nonzero - sum(jnp.sum(new_masks[i]) for i in live)
    return new_masks, total_removed


def struct_magnitude_prune(
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    prune_rate: jnp.ndarray,
    nonzeros: jnp.ndarray,
    criterion: str = "mean",
) -> jnp.ndarray:
    """Channel-structured magnitude pruning for 4D kernels
    (reference prune.py:107-154): reduce each (h, w) kernel to one score,
    zero the k smallest kernels entirely.
    """
    assert weight.ndim == 4, "struct pruning requires 4D kernels"
    c_in, c_out, h, w = weight.shape
    kernel_size = h * w
    red = jnp.abs(weight).reshape(c_in * c_out, kernel_size)
    if criterion == "mean":
        scores = jnp.mean(red, axis=-1)
    elif criterion == "max":
        scores = jnp.max(red, axis=-1)
    else:
        raise KeyError(criterion)
    kernel_live = (mask.reshape(c_in * c_out, kernel_size).sum(axis=-1) > 0)
    scores = jnp.where(kernel_live, scores, -1.0)

    num_remove = jnp.ceil(prune_rate * nonzeros / kernel_size)
    num_zero_kernels = (c_in * c_out) - kernel_live.sum()
    k = num_zero_kernels + num_remove
    ranks = ranks_ascending(scores)
    keep = (ranks >= k).astype(mask.dtype).reshape(c_in, c_out, 1, 1)
    return mask * keep
