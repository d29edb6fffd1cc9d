"""CoordX — split coordinate-MLP (Liang et al., ICLR 2022, arXiv:2201.12425).

Beyond-reference model family (the reference's zoo is siren/fourier/
wavelet_siren only): the early layers are FACTORIZED over the coordinate
axes. Each 1-D branch embeds one coordinate with SIREN-style sine layers
— O(H + W) work — the branch features are fused elementwise, and only the
late layers run per-pixel — O(H·W). For a 512² grid the branch work is
~260× cheaper than running those same layers per-pixel, so wall-clock per
step approaches (fused depth / total depth) of an equal-width SIREN while
keeping the parameter count in the same regime.

TPU mapping: branch matmuls are (W × C)/(H × C) chains (small, VPU/MXU
fringe); the per-pixel fused chain is the same (H·W × C) @ (C × C) matmul
ladder as SIREN and stays MXU-bound. The factorized `coordx_apply` fast
path requires a separable (tensor-product) grid — exactly what
data.get_grid produces and what the fit/decode paths use; `coordx_apply_flat`
is the generic any-coordinate path (no factorization savings) used by
eval, pixel_chunks, and arbitrary-coordinate rendering.

SIREN init semantics are kept per layer (first-layer U(±1/fan_in), hidden
U(±√(6/fan_in)/ω), sin(ω·) activations, [0,1]→[−1,1] input map, x/2+0.5
output map — reference siren.py:44-54,123-134). Product fusion of two
sine features halves the second moment, so fused features are scaled by
√2 to restore SIREN's activation statistics before the late layers.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["CoordXConfig", "init_coordx", "coordx_apply", "coordx_apply_flat"]

Params = Tuple[dict, ...]


@dataclass(frozen=True)
class CoordXConfig:
    """Static architecture config (conf/mlp/coordx.yaml).

    depth counts weight layers along the per-pixel analogue path:
    split_depth branch layers + (depth - split_depth - 1) fused hidden
    layers + 1 output layer. Params live in ONE flat tuple —
    [x-branch × split_depth, y-branch × split_depth, fused...] — so the
    sparsity masks, k-means codebooks, and the bitstream container treat
    CoordX layers exactly like any other {"w","b"} layer.
    """

    input_size: int = 2
    output_size: int = 3
    depth: int = 8
    hidden_size: int = 128
    split_depth: int = 3
    first_omega_0: float = 50.0
    hidden_omega_0: float = 30.0
    outermost_linear: bool = True
    small_dense_density: float = 1.0
    fast_sine: bool = True
    fusion: str = "product"  # "product" | "sum"

    def __post_init__(self):
        assert self.input_size == 2, "CoordX factorizes 2-D (row, col) grids"
        assert 1 <= self.split_depth <= self.depth - 2, (
            "need at least one fused hidden layer and the output layer"
        )
        assert self.fusion in ("product", "sum"), self.fusion

    @property
    def effective_hidden(self) -> int:
        # Small-Dense width compensation (reference siren.py:88 semantics)
        return int(self.hidden_size * math.sqrt(self.small_dense_density))

    @property
    def n_fused_hidden(self) -> int:
        return self.depth - self.split_depth - 1

    @property
    def branch_dims(self) -> Sequence[Tuple[int, int]]:
        h = self.effective_hidden
        return [(1, h)] + [(h, h)] * (self.split_depth - 1)

    @property
    def fused_dims(self) -> Sequence[Tuple[int, int]]:
        h = self.effective_hidden
        return [(h, h)] * self.n_fused_hidden + [(h, self.output_size)]

    @property
    def layer_dims(self) -> Sequence[Tuple[int, int]]:
        """Flat per-params-entry dims: x-branch, y-branch, fused."""
        return list(self.branch_dims) * 2 + list(self.fused_dims)

    def weight_bound(self, flat_layer: int) -> float:
        """U(±bound) init bound per flat layer index (Feathermap `scaler`)."""
        fan_in, _ = self.layer_dims[flat_layer]
        if flat_layer in (0, self.split_depth):  # first layer of each branch
            return 1.0 / fan_in
        return math.sqrt(6.0 / fan_in) / self.hidden_omega_0


def init_coordx(key: jax.Array, cfg: CoordXConfig, dtype=jnp.float32) -> Params:
    params = []
    for i, (fan_in, fan_out) in enumerate(cfg.layer_dims):
        key, wk, bk = jax.random.split(key, 3)
        wb = cfg.weight_bound(i)
        bb = 1.0 / math.sqrt(fan_in)
        params.append(
            {
                "w": jax.random.uniform(
                    wk, (fan_in, fan_out), dtype, minval=-wb, maxval=wb
                ),
                "b": jax.random.uniform(bk, (fan_out,), dtype, minval=-bb, maxval=bb),
            }
        )
    return tuple(params)


def _sin_fn(cfg: CoordXConfig):
    from implicit_image_tpu.ops.fast_math import fast_sin

    return fast_sin if cfg.fast_sine else jnp.sin


def _run_branch(params_slice, x, cfg: CoordXConfig, compute_dtype=None):
    """x: (N, 1) one coordinate in [-1, 1] -> (N, C) sine features."""
    sin = _sin_fn(cfg)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    for i, layer in enumerate(params_slice):
        w, b = layer["w"], layer["b"]
        if compute_dtype is not None:
            w, b = w.astype(compute_dtype), b.astype(compute_dtype)
        omega = cfg.first_omega_0 if i == 0 else cfg.hidden_omega_0
        if w.shape[0] == 1:
            # fan_in=1: a K=1 "matmul" is a broadcast multiply — keep it
            # off the MXU (degenerate contraction shapes compile poorly)
            z = x * w[0] + b
        else:
            z = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        x = sin(omega * z)
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
    return x


def _run_fused(params_slice, z, cfg: CoordXConfig, compute_dtype=None):
    """z: (N, C) fused features -> (N, out) in [0, 1]."""
    sin = _sin_fn(cfg)
    n_layers = len(params_slice)
    for i, layer in enumerate(params_slice):
        w, b = layer["w"], layer["b"]
        if compute_dtype is not None:
            w, b = w.astype(compute_dtype), b.astype(compute_dtype)
        z = jnp.dot(z, w, preferred_element_type=jnp.float32) + b
        is_last = i == n_layers - 1
        if not (is_last and cfg.outermost_linear):
            z = sin(cfg.hidden_omega_0 * z)
        if compute_dtype is not None and not is_last:
            z = z.astype(compute_dtype)
    return z.astype(jnp.float32) / 2.0 + 0.5


def _fuse(fy, fx, cfg: CoordXConfig):
    if cfg.fusion == "product":
        # E[sin²]·E[sin²] ≈ 1/4 vs the 1/2 SIREN init expects: restore scale
        return (fy * fx) * math.sqrt(2.0)
    return (fy + fx) * (1.0 / math.sqrt(2.0))


def _split(params: Params, cfg: CoordXConfig):
    s = cfg.split_depth
    return params[:s], params[s : 2 * s], params[2 * s :]


def coordx_apply(
    params: Params, grid: jnp.ndarray, cfg: CoordXConfig, compute_dtype=None
) -> jnp.ndarray:
    """Factorized forward over a SEPARABLE (H, W, 2) grid -> (H, W, out).

    Branch work is O(H + W); only the fused layers run per-pixel. The grid
    must be a tensor product (row coordinate constant along axis 1, column
    coordinate constant along axis 0) — data.get_grid's output. Use
    coordx_apply_flat for arbitrary coordinate sets.
    """
    h, w, _ = grid.shape
    px, py, pf = _split(params, cfg)
    ys = (grid[:, 0, 0:1] - 0.5) * 2.0  # (H, 1) row coordinate
    xs = (grid[0, :, 1:2] - 0.5) * 2.0  # (W, 1) column coordinate
    fy = _run_branch(py, ys, cfg, compute_dtype)  # (H, C)
    fx = _run_branch(px, xs, cfg, compute_dtype)  # (W, C)
    z = _fuse(fy[:, None, :], fx[None, :, :], cfg).reshape(h * w, -1)
    if compute_dtype is not None:
        z = z.astype(compute_dtype)
    out = _run_fused(pf, z, cfg, compute_dtype)
    return out.reshape(h, w, -1)


def coordx_apply_flat(
    params: Params, coords: jnp.ndarray, cfg: CoordXConfig, compute_dtype=None
) -> jnp.ndarray:
    """Generic forward over (N, 2) coordinates -> (N, out) — branches run
    per point (no factorization savings); used by eval/pixel_chunks and
    arbitrary-coordinate rendering."""
    px, py, pf = _split(params, cfg)
    ys = (coords[:, 0:1] - 0.5) * 2.0
    xs = (coords[:, 1:2] - 0.5) * 2.0
    fy = _run_branch(py, ys, cfg, compute_dtype)
    fx = _run_branch(px, xs, cfg, compute_dtype)
    z = _fuse(fy, fx, cfg)
    if compute_dtype is not None:
        z = z.astype(compute_dtype)
    return _run_fused(pf, z, cfg, compute_dtype)
