"""Multiresolution hash-grid INR (Müller et al., SIGGRAPH 2022,
arXiv:2201.05989 — retrieved in PAPERS.md).

Beyond-reference model family (the reference's zoo is siren/fourier/
wavelet_siren, models/__init__.py:5): per pixel, L pyramid levels each
look up the 4 cell corners of the pixel's position in a learned feature
table and bilinearly blend them; the concatenated (L·F)-dim feature runs
through a tiny ReLU MLP. Almost all capacity lives in the tables, so the
per-step FLOP count is tiny compared to a SIREN of equal parameter count
— the cost moves to memory-system gathers instead of MXU matmuls.

TPU mapping: the ENTIRE pyramid lookup is ONE fused `jnp.take` — all
levels' tables are concatenated into a single (ΣT_l, F) tensor and the
(N, L, 4) corner indices (direct indexing where the level grid fits,
NGP spatial hashing above that) are computed vectorized over levels with
static per-level select masks, so XLA sees one big gather (and one big
scatter-add in the backward pass) rather than L small ones. The MLP is a
standard (N, L·F) @ (…) matmul ladder.

Container/pipeline integration: params keep the framework's flat
tuple-of-{"w","b"} layout — params[0]["w"] IS the fused table (2-D, so
the k-means codebook, the bitstream container and the sparsity masks
treat it like any weight matrix), followed by ordinary MLP layers. Note
the reference's default quant skip (first+last layer, quant context
semantics of the reference's pipeline/quant/context.py:35-47) would skip
the table — exactly the tensor that holds the capacity — so hashgrid
runs set `quant.skip_layers` explicitly (conf/mlp/hashgrid.yaml notes).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["HashGridConfig", "init_hashgrid", "hashgrid_apply", "hashgrid_apply_flat"]

Params = Tuple[dict, ...]

# NGP spatial-hash primes (arXiv:2201.05989 eq. 4); pi_1 = 1 keeps
# x-coherence in the low bits, which is also the TPU-friendly choice
# (neighbouring pixels gather neighbouring table rows on direct levels).
_HASH_P2 = 2_654_435_761  # y prime


@dataclass(frozen=True)
class HashGridConfig:
    """Static architecture config (conf/mlp/hashgrid.yaml).

    depth counts MLP weight layers (hidden + output) AFTER the table
    lookup; the table itself is params[0]. Level resolutions follow the
    NGP geometric schedule N_l = floor(base * b^l) with b chosen so the
    last level lands on finest_resolution (arXiv:2201.05989 eq. 2-3).
    """

    input_size: int = 2
    output_size: int = 3
    n_levels: int = 12
    features: int = 2
    log2_table_size: int = 12
    base_resolution: int = 16
    finest_resolution: int = 512
    depth: int = 3
    hidden_size: int = 64
    small_dense_density: float = 1.0

    def __post_init__(self):
        assert self.input_size == 2, "hashgrid factorizes 2-D (row, col) grids"
        assert self.depth >= 2, "need at least one hidden layer + output"
        assert self.n_levels >= 1

    @property
    def effective_hidden(self) -> int:
        # Small-Dense width compensation (reference siren.py:88 semantics)
        return int(self.hidden_size * math.sqrt(self.small_dense_density))

    @property
    def level_resolutions(self) -> Sequence[int]:
        if self.n_levels == 1:
            return [int(self.base_resolution)]
        b = math.exp(
            (math.log(self.finest_resolution) - math.log(self.base_resolution))
            / (self.n_levels - 1)
        )
        # +1e-6: b is irrational dust away from the exact growth factor, so
        # bare floor() would turn e.g. 64.0 into 63 at the configured endpoint
        return [
            int(math.floor(self.base_resolution * b**l + 1e-6))
            for l in range(self.n_levels)
        ]

    @property
    def level_table_sizes(self) -> Sequence[int]:
        """Rows per level: dense (res+1)² grid when it fits the budget,
        else the hashed 2^log2_table_size (collisions trained through)."""
        cap = 1 << self.log2_table_size
        return [min((r + 1) * (r + 1), cap) for r in self.level_resolutions]

    @property
    def level_offsets(self) -> Sequence[int]:
        offs, acc = [], 0
        for t in self.level_table_sizes:
            offs.append(acc)
            acc += t
        return offs

    @property
    def table_rows(self) -> int:
        return sum(self.level_table_sizes)

    @property
    def mlp_dims(self) -> Sequence[Tuple[int, int]]:
        h = self.effective_hidden
        dims = [(self.n_levels * self.features, h)]
        dims += [(h, h)] * (self.depth - 2)
        dims += [(h, self.output_size)]
        return dims


def init_hashgrid(key: jax.Array, cfg: HashGridConfig, dtype=jnp.float32) -> Params:
    key, tk = jax.random.split(key)
    # NGP table init U(±1e-4) (arXiv:2201.05989 §4)
    params = [
        {
            "w": jax.random.uniform(
                tk, (cfg.table_rows, cfg.features), dtype, minval=-1e-4, maxval=1e-4
            )
        }
    ]
    for fan_in, fan_out in cfg.mlp_dims:
        key, wk, bk = jax.random.split(key, 3)
        wb = math.sqrt(6.0 / fan_in)  # Kaiming-uniform for the ReLU ladder
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


def _pyramid_features(table, coords, cfg: HashGridConfig, compute_dtype=None):
    """(N, 2) coords in [0, 1] -> (N, L·F) blended pyramid features.

    One fused gather across all levels; per-level direct-vs-hashed
    indexing resolved with a static mask (compile-time constant per
    level, so XLA folds the untaken branch where a whole pyramid is on
    one side)."""
    n = coords.shape[0]
    res = jnp.asarray(cfg.level_resolutions, jnp.float32)  # (L,)
    tsizes = cfg.level_table_sizes
    cap = 1 << cfg.log2_table_size
    direct = jnp.asarray(
        [t < cap or (r + 1) ** 2 <= cap
         for t, r in zip(tsizes, cfg.level_resolutions)],
        bool,
    )  # (L,)
    offsets = jnp.asarray(cfg.level_offsets, jnp.uint32)  # (L,)
    stride = jnp.asarray([r + 1 for r in cfg.level_resolutions], jnp.uint32)

    pos = coords[:, None, :] * res[None, :, None]  # (N, L, 2)
    p0 = jnp.clip(
        jnp.floor(pos), 0.0, (res - 1.0)[None, :, None]
    )  # coords==1.0 lands on the last cell, frac 1.0
    frac = pos - p0
    corner = jnp.asarray([[0, 0], [0, 1], [1, 0], [1, 1]], jnp.uint32)  # (4, 2)
    cyx = p0.astype(jnp.uint32)[:, :, None, :] + corner[None, None]  # (N, L, 4, 2)
    cy, cx = cyx[..., 0], cyx[..., 1]
    idx_direct = cy * stride[None, :, None] + cx
    # NGP 2-D spatial hash (eq. 4); uint32 mul wraps, & (cap-1) masks
    idx_hash = (cx ^ (cy * jnp.uint32(_HASH_P2))) & jnp.uint32(cap - 1)
    idx = jnp.where(direct[None, :, None], idx_direct, idx_hash)
    # int32 indices + mode="clip": indices are in-range by construction,
    # so skip jnp.take's default out-of-bounds fill machinery and give
    # XLA the signed-index gather it tiles best
    idx = (idx + offsets[None, :, None]).astype(jnp.int32).reshape(n, -1)

    t = table if compute_dtype is None else table.astype(compute_dtype)
    g = jnp.take(t, idx, axis=0, mode="clip").reshape(
        n, cfg.n_levels, 4, cfg.features
    )
    fy, fx = frac[..., 0], frac[..., 1]  # (N, L)
    wgt = jnp.stack(
        [(1 - fy) * (1 - fx), (1 - fy) * fx, fy * (1 - fx), fy * fx], axis=-1
    )  # (N, L, 4) — order matches `corner`
    if compute_dtype is not None:
        wgt = wgt.astype(compute_dtype)
    return (g * wgt[..., None]).sum(axis=2).reshape(n, -1)


def hashgrid_apply_flat(
    params: Params, coords: jnp.ndarray, cfg: HashGridConfig, compute_dtype=None
) -> jnp.ndarray:
    """(N, 2) coords in [0, 1] -> (N, out)."""
    z = _pyramid_features(params[0]["w"], coords, cfg, compute_dtype)
    mlp = params[1:]
    for i, layer in enumerate(mlp):
        w, b = layer["w"], layer["b"]
        if compute_dtype is not None:
            w, b = w.astype(compute_dtype), b.astype(compute_dtype)
        z = jnp.dot(z, w, preferred_element_type=jnp.float32) + b
        if i < len(mlp) - 1:
            z = jax.nn.relu(z)
            if compute_dtype is not None:
                z = z.astype(compute_dtype)
    return z.astype(jnp.float32)


def hashgrid_apply(
    params: Params, grid: jnp.ndarray, cfg: HashGridConfig, compute_dtype=None
) -> jnp.ndarray:
    h, w, c = grid.shape
    out = hashgrid_apply_flat(params, grid.reshape(h * w, c), cfg, compute_dtype)
    return out.reshape(h, w, -1)
