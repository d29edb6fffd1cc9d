"""Fourier-feature positional-encoding MLP (pure-function JAX model).

Capability parity with the reference's `implicit_image/models/fourier.py`:
  * frozen random encoding B ~ N(0,1) * map_scale of shape
    (input_size, map_size//2)                                (fourier.py:18-20)
  * encoding(x) = concat[sin(2πx @ B), cos(2πx @ B)]         (fourier.py:22-25)
  * ReLU MLP with depth-1 linear layers, sigmoid output      (fourier.py:45-57)
  * Small-Dense width scaling by sqrt(density)               (fourier.py:43)
  * torch nn.Linear default init: W, b ~ U(±1/sqrt(fan_in))

The frozen encoding matrix B is carried in the params pytree (it is part of
the compressed payload, as in the reference's state_dict) but is excluded
from gradients and masking by the training loop (`trainable=False` marker).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["FourierConfig", "init_fourier", "fourier_apply", "fourier_apply_flat"]


@dataclass(frozen=True)
class FourierConfig:
    """Static architecture config (defaults mirror conf/mlp/fourier.yaml)."""

    input_size: int = 2
    output_size: int = 3
    depth: int = 8
    hidden_size: int = 128
    map_size: int = 256
    map_scale: float = 16.0
    small_dense_density: float = 1.0

    def __post_init__(self):
        assert self.map_size % 2 == 0, "Need even map size"

    @property
    def effective_hidden(self) -> int:
        return int(self.hidden_size * math.sqrt(self.small_dense_density))

    @property
    def layer_dims(self) -> Sequence[Tuple[int, int]]:
        h = self.effective_hidden
        dims = [(self.map_size, h)]
        dims += [(h, h)] * (self.depth - 3)
        dims += [(h, self.output_size)]
        return dims


def init_fourier(key: jax.Array, cfg: FourierConfig, dtype=jnp.float32):
    """Init: frozen Gaussian B + torch-default-init linear stack."""
    key, bk = jax.random.split(key)
    encoding_b = (
        jax.random.normal(bk, (cfg.input_size, cfg.map_size // 2), dtype)
        * cfg.map_scale
    )
    params = [{"B": encoding_b}]  # frozen; no "w" key => skipped by optimizers
    for fan_in, fan_out in cfg.layer_dims:
        key, wk, bk2 = jax.random.split(key, 3)
        bound = 1.0 / math.sqrt(fan_in)
        params.append(
            {
                "w": jax.random.uniform(
                    wk, (fan_in, fan_out), dtype, minval=-bound, maxval=bound
                ),
                "b": jax.random.uniform(
                    bk2, (fan_out,), dtype, minval=-bound, maxval=bound
                ),
            }
        )
    return tuple(params)


def fourier_apply_flat(
    params, coords: jnp.ndarray, cfg: FourierConfig, compute_dtype=None
) -> jnp.ndarray:
    """Forward over flat coordinates (N, input_size) -> (N, output_size)."""
    encoding_b = params[0]["B"]
    layers = params[1:]
    xp = (2.0 * jnp.pi * coords) @ encoding_b
    x = jnp.concatenate([jnp.sin(xp), jnp.cos(xp)], axis=-1)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    n = len(layers)
    for i, layer in enumerate(layers):
        w, b = layer["w"], layer["b"]
        if compute_dtype is not None:
            w, b = w.astype(compute_dtype), b.astype(compute_dtype)
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        if i < n - 1:
            x = jnp.maximum(x, 0.0)
            if compute_dtype is not None:
                x = x.astype(compute_dtype)
    return jax.nn.sigmoid(x.astype(jnp.float32))


def fourier_apply(
    params, grid: jnp.ndarray, cfg: FourierConfig, compute_dtype=None
) -> jnp.ndarray:
    h, w, c = grid.shape
    out = fourier_apply_flat(params, grid.reshape(h * w, c), cfg, compute_dtype)
    return out.reshape(h, w, -1)
