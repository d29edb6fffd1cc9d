"""Redistribution statistics — per-layer share of regrowth.

Capability parity with reference `masking/funcs/redistribute.py` registry
{momentum, grad, nonzero, none}: an unnormalized per-layer statistic;
normalizing across layers gives the regrowth distribution.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "momentum_redistribution",
    "grad_redistribution",
    "nonzero_redistribution",
    "registry_names",
]

registry_names = ("momentum", "grad", "nonzero", "none")


def momentum_redistribution(mask, weight, grad, momentum) -> jnp.ndarray:
    """mean |momentum| over surviving weights (redistribute.py:19-39)."""
    live = mask > 0
    total = jnp.sum(jnp.abs(momentum) * live)
    return total / jnp.maximum(live.sum(), 1)


def grad_redistribution(mask, weight, grad, momentum) -> jnp.ndarray:
    """mean |grad| over surviving weights (redistribute.py:42-61)."""
    live = mask > 0
    total = jnp.sum(jnp.abs(grad) * live)
    return total / jnp.maximum(live.sum(), 1)


def nonzero_redistribution(mask, weight, grad, momentum) -> jnp.ndarray:
    """Surviving-weight count; preserves the existing distribution
    (redistribute.py:64-86)."""
    return jnp.sum(mask > 0).astype(jnp.float32)
