"""Functional Shampoo preconditioner (Gupta et al. 2018).

The reference exposes `torch_optimizer.Shampoo` as its second optimizer
choice (train_helper.py:72-78; conf/optim/shampoo.yaml: lr 0.1, momentum
0.9, eps 1e-4, update_freq 1). This is a TPU-native functional equivalent:
per-dimension Kronecker preconditioners L_i accumulated as Gram matrices of
the matricized gradient, applied as L_i^{-1/(2*order)} via eigendecomposition.

All state lives in an explicit pytree so the fit loop stays a single
compiled program. Eigendecompositions on the (width x width) preconditioners
are negligible next to the (H*W x width) forward matmuls.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from implicit_image_tpu.optim.adam import TRAINABLE_KEYS, tree_map_layers

__all__ = ["ShampooState", "shampoo_init", "shampoo_update"]


class ShampooState(NamedTuple):
    momentum_buf: Any
    preconds: Any  # per-leaf tuple of (dim_i x dim_i) Gram matrices
    count: jnp.ndarray


def _init_preconds(key, p, eps):
    if key not in TRAINABLE_KEYS:
        return ()
    return tuple(eps * jnp.eye(d, dtype=jnp.float32) for d in p.shape)


def shampoo_init(params, epsilon: float = 1e-4) -> ShampooState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    preconds = tree_map_layers(lambda k, p: _init_preconds(k, p, epsilon), params)
    return ShampooState(momentum_buf=zeros, preconds=preconds, count=jnp.zeros((), jnp.int32))


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
):
    count = state.count + 1

    def upd_buf(key, buf, g):
        if key not in TRAINABLE_KEYS:
            return buf
        return momentum * buf + g

    new_buf = tree_map_layers(upd_buf, state.momentum_buf, grads)

    new_preconds = []
    new_params = []
    for layer_p, layer_b, layer_pc in zip(params, new_buf, state.preconds):
        out_pc, out_p = {}, {}
        for k in layer_p.keys():
            p, g, pcs = layer_p[k], layer_b[k], layer_pc[k]
            if k not in TRAINABLE_KEYS:
                out_pc[k], out_p[k] = pcs, p
                continue
            if weight_decay:
                g = g + weight_decay * p
            order = max(g.ndim, 1)
            upd_pcs = []
            for dim in range(g.ndim):
                mat = _matricize(g, dim)
                pc = pcs[dim] + mat @ mat.T
                upd_pcs.append(pc)
                g_mat = _inv_root(pc, 2 * order) @ mat
                # un-matricize
                shape = (g.shape[dim],) + tuple(
                    g.shape[i] for i in range(g.ndim) if i != dim
                )
                inv_perm = list(range(1, dim + 1)) + [0] + list(range(dim + 1, g.ndim))
                g = jnp.transpose(g_mat.reshape(shape), inv_perm)
            out_pc[k] = tuple(upd_pcs)
            out_p[k] = p - lr * g
        new_preconds.append(out_pc)
        new_params.append(out_p)

    return tuple(new_params), ShampooState(
        momentum_buf=new_buf, preconds=tuple(new_preconds), count=count
    )
