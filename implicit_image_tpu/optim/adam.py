"""Functional Adam with torch-compatible semantics.

The reference trains with `torch.optim.Adam` (train_helper.py:72-78, lr 3e-4)
and the sparsity subsystem reads Adam's raw first/second-moment buffers to
drive momentum growth/redistribution (core.py:474-493:
momentum = exp_avg / (sqrt(exp_avg_sq) + 1e-8)). A hand-rolled functional
Adam keeps those buffers as a plain pytree the mask-update transform can
read and mask — something optax hides inside opaque state.

Update rule matches torch.optim.Adam exactly:
    mu  <- b1*mu + (1-b1)*g
    nu  <- b2*nu + (1-b2)*g^2
    p   <- p - lr * (mu/(1-b1^t)) / (sqrt(nu/(1-b2^t)) + eps)

Frozen leaves: any param dict leaf not stored under a TRAINABLE_KEYS key
(e.g. the Fourier encoding matrix "B") receives no update. "centroids" is
trainable for the quant phase's codebook finetune
(training/quant_phase.py), where the k-means codebook replaces "w".
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["AdamState", "adam_init", "adam_update", "adam_momentum"]

TRAINABLE_KEYS = ("w", "b", "centroids")


class AdamState(NamedTuple):
    mu: Any
    nu: Any
    count: jnp.ndarray


def _is_layer(x) -> bool:
    return isinstance(x, dict)


def tree_map_layers(fn, *trees):
    """Map fn(key, *leaves) over layer-dict leaves of tuple-of-dict pytrees."""
    out = []
    for layers in zip(*trees):
        layer0 = layers[0]
        out.append(
            {k: fn(k, *(layer[k] for layer in layers)) for k in layer0.keys()}
        )
    return tuple(out)


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params), count=jnp.zeros((), jnp.int32))


def adam_update(
    grads,
    state: AdamState,
    params,
    lr,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t

    def upd_mu(key, mu, g):
        if key not in TRAINABLE_KEYS:
            return mu
        return b1 * mu + (1.0 - b1) * g

    def upd_nu(key, nu, g):
        if key not in TRAINABLE_KEYS:
            return nu
        return b2 * nu + (1.0 - b2) * (g * g)

    def upd_p(key, p, mu, nu):
        if key not in TRAINABLE_KEYS:
            return p
        m_hat = mu / bc1
        denom = jnp.sqrt(nu / bc2) + eps
        return p - lr * m_hat / denom

    mu = tree_map_layers(upd_mu, state.mu, grads)
    nu = tree_map_layers(upd_nu, state.nu, grads)
    new_params = tree_map_layers(upd_p, params, mu, nu)
    return new_params, AdamState(mu=mu, nu=nu, count=count)


def adam_momentum(state, layer: int, key: str = "w") -> jnp.ndarray:
    """Reference `get_momentum_for_weight` (core.py:474-493): Adam's
    exp_avg/sqrt(exp_avg_sq) for AdamState, the raw momentum buffer for
    SGD-like optimizers (Shampoo here)."""
    if isinstance(state, AdamState):
        mu = state.mu[layer][key]
        nu = state.nu[layer][key]
        return mu / (jnp.sqrt(nu) + 1e-8)
    # ShampooState (momentum_buf mirrors torch SGD's momentum_buffer)
    return state.momentum_buf[layer][key]
