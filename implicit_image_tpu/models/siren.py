"""SIREN — sine-activation coordinate MLP, as a pure-function JAX model.

Capability parity with the reference's `implicit_image/models/siren.py`
(SineLayer :9-68, Siren :71-134) with exact init/ω₀ semantics:
  * first layer weights  ~ U(±1/fan_in)                  (siren.py:46-47)
  * hidden layer weights ~ U(±sqrt(6/fan_in)/ω₀)         (siren.py:48-49)
  * biases ~ U(±1/sqrt(fan_in))   (torch nn.Linear default, not re-init)
  * activation sin(ω₀ · (x@W + b)); last layer linear when outermost_linear
  * input [0,1] -> [-1,1]; output x/2 + 0.5              (siren.py:128-131)
  * Small-Dense: hidden width scaled by sqrt(density)    (siren.py:88)
  * per-layer `scaler` bound retained for Feathermap     (siren.py:54)

TPU-native design: parameters are a tuple of {"w": (fan_in, fan_out),
"b": (fan_out,)} dicts — (fan_in, fan_out) layout so the forward pass is a
chain of (N_pixels × fan_in) @ (fan_in × fan_out) matmuls that XLA tiles
straight onto the MXU with the pixel axis as the large dimension. The whole
forward is jit/vmap/shard_map-compatible (pure, static shapes).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["SirenConfig", "init_siren", "siren_apply", "siren_apply_flat"]

Params = Tuple[dict, ...]


@dataclass(frozen=True)
class SirenConfig:
    """Static architecture config (defaults mirror conf/mlp/siren.yaml)."""

    input_size: int = 2
    output_size: int = 3
    depth: int = 8
    hidden_size: int = 128
    first_omega_0: float = 50.0
    hidden_omega_0: float = 30.0
    outermost_linear: bool = True
    small_dense_density: float = 1.0
    # degree-11 polynomial sine (ops/fast_math.py): ~7x XLA's sin on the
    # VPU, max abs err 9e-6 — the default; set False for bit-exact jnp.sin.
    fast_sine: bool = True

    @property
    def effective_hidden(self) -> int:
        # Small-Dense width compensation (reference siren.py:88)
        return int(self.hidden_size * math.sqrt(self.small_dense_density))

    @property
    def layer_dims(self) -> Sequence[Tuple[int, int]]:
        h = self.effective_hidden
        dims = [(self.input_size, h)]
        dims += [(h, h)] * (self.depth - 2)
        dims += [(h, self.output_size)]
        return dims

    @property
    def omegas(self) -> Sequence[float]:
        return [self.first_omega_0] + [self.hidden_omega_0] * (self.depth - 1)

    def weight_bound(self, layer: int) -> float:
        """U(±bound) init bound; also the Feathermap `scaler` (siren.py:44-54)."""
        fan_in = self.layer_dims[layer][0]
        if layer == 0:
            return 1.0 / fan_in
        return math.sqrt(6.0 / fan_in) / self.omegas[layer]


def init_siren(key: jax.Array, cfg: SirenConfig, dtype=jnp.float32) -> Params:
    """SIREN initialization with the reference's exact bounds."""
    params = []
    for layer, (fan_in, fan_out) in enumerate(cfg.layer_dims):
        key, wk, bk = jax.random.split(key, 3)
        wb = cfg.weight_bound(layer)
        bb = 1.0 / math.sqrt(fan_in)  # torch nn.Linear default bias init
        params.append(
            {
                "w": jax.random.uniform(
                    wk, (fan_in, fan_out), dtype, minval=-wb, maxval=wb
                ),
                "b": jax.random.uniform(bk, (fan_out,), dtype, minval=-bb, maxval=bb),
            }
        )
    return tuple(params)


def siren_apply_flat(
    params: Params,
    coords: jnp.ndarray,
    cfg: SirenConfig,
    compute_dtype=None,
) -> jnp.ndarray:
    """Forward over flat coordinates (N, input_size) -> (N, output_size).

    Matches reference siren.py:123-134: coords in [0,1] are remapped to
    [-1,1]; every layer but (optionally) the last applies sin(ω₀·x);
    output is mapped from [-1,1] back to [0,1].
    """
    from implicit_image_tpu.ops.fast_math import fast_sin

    sin_fn = fast_sin if cfg.fast_sine else jnp.sin
    x = (coords - 0.5) * 2.0
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    n_layers = len(params)
    for i, layer in enumerate(params):
        w, b = layer["w"], layer["b"]
        if compute_dtype is not None:
            w, b = w.astype(compute_dtype), b.astype(compute_dtype)
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        is_last = i == n_layers - 1
        if not (is_last and cfg.outermost_linear):
            x = sin_fn(cfg.omegas[i] * x)
        if compute_dtype is not None and not is_last:
            x = x.astype(compute_dtype)
    return x.astype(jnp.float32) / 2.0 + 0.5


def siren_apply(
    params: Params, grid: jnp.ndarray, cfg: SirenConfig, compute_dtype=None
) -> jnp.ndarray:
    """Forward over an (H, W, input_size) grid -> (H, W, output_size)."""
    h, w, c = grid.shape
    out = siren_apply_flat(params, grid.reshape(h * w, c), cfg, compute_dtype)
    return out.reshape(h, w, -1)
