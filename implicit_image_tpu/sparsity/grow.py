"""Growth functions — jittable, rank-based regrowth among masked-out weights.

Capability parity with reference `masking/funcs/grow.py` registry
{absolute-gradient, momentum, random, none, struct-absolute-gradient-*}:
  * abs_grad_growth (grow.py:58-97) — RigL: regrow the top-|grad| positions
    among currently-masked weights; new weights initialized to 0.
  * momentum_growth (grow.py:25-55) — SNFS: same with the optimizer's
    momentum statistic (Adam: exp_avg / (sqrt(exp_avg_sq)+1e-8)).
  * random_growth (grow.py:100-137) — Bernoulli(num_growth / n_zeros) on the
    masked-out set (probabilistic; count deviations are absorbed by the
    exponential-smoothing adjustment in core).
  * no_growth, struct variants for 4D kernels.

Each returns (new_mask, new_weight); regrown weights are zeroed so they
start from 0 exactly as the reference does.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from implicit_image_tpu.sparsity.prune import ranks_descending

__all__ = [
    "abs_grad_growth",
    "momentum_growth",
    "random_growth",
    "no_growth",
    "struct_abs_grad_growth",
    "registry_names",
]

registry_names = (
    "absolute-gradient",
    "momentum",
    "random",
    "none",
    "struct-absolute-gradient-mean",
    "struct-absolute-gradient-min",
)


def _score_growth(
    mask: jnp.ndarray, weight: jnp.ndarray, score: jnp.ndarray, num_growth
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grow the top-`num_growth` positions of `score` among mask==0 entries."""
    is_zero = mask == 0
    n_zeros = is_zero.sum()
    # Masked-in entries score -1 so only true holes can be grown (the
    # reference zeroes their score instead; ties at 0 there can waste growth
    # on already-live weights — strictly fewer regrown, never more).
    s = jnp.where(is_zero, jnp.abs(score), -1.0)
    ranks = ranks_descending(s)
    grow = is_zero & (ranks < jnp.minimum(num_growth, n_zeros))
    new_mask = jnp.maximum(mask, grow.astype(mask.dtype))
    new_weight = jnp.where(grow, 0.0, weight)
    return new_mask, new_weight


def abs_grad_growth(mask, weight, grad, num_growth, key=None):
    """RigL regrowth by largest |grad| among holes (grow.py:58-97)."""
    return _score_growth(mask, weight, grad, num_growth)


def momentum_growth(mask, weight, momentum, num_growth, key=None):
    """SNFS regrowth by largest |momentum| among holes (grow.py:25-55)."""
    return _score_growth(mask, weight, momentum, num_growth)


def random_growth(mask, weight, score, num_growth, key):
    """Probabilistic regrowth (grow.py:100-137)."""
    is_zero = mask == 0
    n = is_zero.sum()
    prob = jnp.where(n > 0, num_growth / jnp.maximum(n, 1), 0.0)
    grow = is_zero & (jax.random.uniform(key, mask.shape) < prob)
    new_mask = jnp.maximum(mask, grow.astype(mask.dtype))
    new_weight = jnp.where(grow, 0.0, weight)
    # reference also re-zeroes any still-masked weights (grow.py:133)
    new_weight = jnp.where(new_mask == 0, 0.0, new_weight)
    return new_mask, new_weight


def no_growth(mask, weight, score, num_growth, key=None):
    return mask, weight


def struct_abs_grad_growth(mask, weight, grad, num_growth, key=None, criterion="mean"):
    """Channel-structured regrowth for 4D kernels (grow.py:160-204)."""
    assert weight.ndim == 4
    c_in, c_out, h, w = weight.shape
    kernel_size = h * w
    red = jnp.abs(grad).reshape(c_in * c_out, kernel_size)
    scores = jnp.mean(red, axis=-1) if criterion == "mean" else jnp.min(red, axis=-1)
    kernel_zero = mask.reshape(c_in * c_out, kernel_size).sum(axis=-1) == 0
    s = jnp.where(kernel_zero, scores, -1.0)
    ranks = ranks_descending(s)
    n_grow_kernels = num_growth / kernel_size
    grow = (kernel_zero & (ranks < n_grow_kernels)).reshape(c_in, c_out, 1, 1)
    new_mask = jnp.maximum(mask, jnp.broadcast_to(grow, mask.shape).astype(mask.dtype))
    new_weight = jnp.where(jnp.broadcast_to(grow, weight.shape), 0.0, weight)
    return new_mask, new_weight
