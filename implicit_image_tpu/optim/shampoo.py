"""Functional Shampoo preconditioner (Gupta et al. 2018).

The reference exposes `torch_optimizer.Shampoo` as its second optimizer
choice (train_helper.py:72-78; conf/optim/shampoo.yaml: lr 0.1, momentum
0.9, eps 1e-4, update_freq 1). This is a TPU-native functional port of
torch_optimizer's exact update semantics:

    g   <- (1 - momentum) * grad + momentum * buf     (buf = PREVIOUS
                                                        preconditioned grad)
    g   <- g + weight_decay * p
    per dim i:  P_i += mat_i(g) @ mat_i(g)^T
                g    = P_i^(-1/order) @ mat_i(g)       (order = g.ndim)
    buf <- g                                           (store preconditioned)
    p   <- p - lr * g

Note torch_optimizer applies P^(-1/order) per dimension (NOT the paper's
P^(-1/(2*order))) and blends momentum as an EMA of the preconditioned
gradient — both matched here so `optim=shampoo` behaves like the
reference's. Measured caveat: at the reference's own operating point
(lr 0.1, eps 1e-4, SIREN weight scale ~sqrt(6/fan_in)/30) those raw
semantics DIVERGE within a few steps (early preconditioners amplify weak
directions by up to eps^{-1/2}); `graft_norm=True` (default) rescales the
preconditioned direction to the momentum-gradient's norm per leaf — the
grafting trick from distributed Shampoo (Anil et al. 2020) — which keeps
the direction information and makes the reference's lr usable.

All state lives in an explicit pytree so the fit loop stays a single
compiled program; eigendecompositions on the (width x width)
preconditioners are negligible next to the (H*W x width) forward matmuls.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from implicit_image_tpu.optim.adam import TRAINABLE_KEYS, tree_map_layers

__all__ = ["ShampooState", "shampoo_init", "shampoo_update"]


class ShampooState(NamedTuple):
    momentum_buf: Any  # previous PRECONDITIONED gradient per leaf
    preconds: Any  # per-leaf tuple of (dim_i x dim_i) Gram matrices
    inv_preconds: Any  # cached P^(-1/order), refreshed every update_freq steps
    count: jnp.ndarray


def _init_preconds(key, p, eps):
    if key not in TRAINABLE_KEYS:
        return ()
    return tuple(eps * jnp.eye(d, dtype=jnp.float32) for d in p.shape)


def shampoo_init(params, epsilon: float = 1e-4) -> ShampooState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    preconds = tree_map_layers(lambda k, p: _init_preconds(k, p, epsilon), params)
    inv = tree_map_layers(
        lambda k, p: tuple(jnp.eye(d, dtype=jnp.float32) for d in p.shape)
        if k in TRAINABLE_KEYS
        else (),
        params,
    )
    return ShampooState(
        momentum_buf=zeros,
        preconds=preconds,
        inv_preconds=inv,
        count=jnp.zeros((), jnp.int32),
    )


def _matricize(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Move `dim` to the front and flatten the rest."""
    perm = (dim,) + tuple(i for i in range(x.ndim) if i != dim)
    return jnp.transpose(x, perm).reshape(x.shape[dim], -1)


def _inv_root(mat: jnp.ndarray, order: int) -> jnp.ndarray:
    """Symmetric PSD matrix^(-1/order) via eigendecomposition."""
    w, v = jnp.linalg.eigh(mat.astype(jnp.float32))
    w = jnp.maximum(w, 1e-12)
    return (v * w ** (-1.0 / order)) @ v.T


def shampoo_update(
    grads,
    state: ShampooState,
    params,
    lr,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    graft_norm: bool = True,
    update_freq: int = 1,
):
    count = state.count + 1
    # torch_optimizer refreshes inv_precond when step % update_freq == 0
    # (step counts from 0, so the first step always refreshes)
    refresh = (state.count % max(1, int(update_freq))) == 0

    new_preconds = []
    new_params = []
    new_buf = []
    new_inv = []
    for layer_p, layer_g, layer_b, layer_pc, layer_inv in zip(
        params, grads, state.momentum_buf, state.preconds, state.inv_preconds
    ):
        out_pc, out_p, out_b, out_inv = {}, {}, {}, {}
        for k in layer_p.keys():
            p, g, buf, pcs = layer_p[k], layer_g[k], layer_b[k], layer_pc[k]
            invs = layer_inv[k]
            if k not in TRAINABLE_KEYS:
                out_pc[k], out_p[k], out_b[k], out_inv[k] = pcs, p, buf, invs
                continue
            if momentum > 0.0:
                # EMA with the previous PRECONDITIONED grad
                # (torch_optimizer shampoo.py: grad.mul_(1-m).add_(buf, m));
                # torch initializes momentum_buffer = grad.clone() on first
                # touch, so step 0's blend is just g
                blended = (1.0 - momentum) * g + momentum * buf
                g = jnp.where(state.count == 0, g, blended)
            if weight_decay:
                g = g + weight_decay * p
            g_blend = g
            order = max(g.ndim, 1)
            upd_pcs = []
            upd_invs = []
            for dim in range(g.ndim):
                mat = _matricize(g, dim)
                pc = pcs[dim] + mat @ mat.T
                upd_pcs.append(pc)
                inv = jax.lax.cond(
                    refresh,
                    lambda pc=pc: _inv_root(pc, order),
                    lambda dim=dim: invs[dim],
                )
                upd_invs.append(inv)
                g_mat = inv @ mat
                # un-matricize
                shape = (g.shape[dim],) + tuple(
                    g.shape[i] for i in range(g.ndim) if i != dim
                )
                inv_perm = list(range(1, dim + 1)) + [0] + list(range(dim + 1, g.ndim))
                g = jnp.transpose(g_mat.reshape(shape), inv_perm)
            if graft_norm:
                # keep the preconditioned DIRECTION, graft the momentum
                # gradient's NORM (distributed-Shampoo grafting)
                gn = jnp.sqrt(jnp.sum(g_blend * g_blend))
                pn = jnp.sqrt(jnp.sum(g * g))
                g = g * (gn / jnp.maximum(pn, 1e-16))
            out_pc[k] = tuple(upd_pcs)
            out_inv[k] = tuple(upd_invs)
            out_b[k] = g  # store preconditioned grad as the momentum buffer
            out_p[k] = p - lr * g
        new_preconds.append(out_pc)
        new_params.append(out_p)
        new_buf.append(out_b)
        new_inv.append(out_inv)

    return tuple(new_params), ShampooState(
        momentum_buf=tuple(new_buf),
        preconds=tuple(new_preconds),
        inv_preconds=tuple(new_inv),
        count=count,
    )
