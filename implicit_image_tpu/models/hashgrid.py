"""Multiresolution hash-grid INR (Müller et al., SIGGRAPH 2022,
arXiv:2201.05989 — retrieved in PAPERS.md).

Beyond-reference model family (the reference's zoo is siren/fourier/
wavelet_siren, models/__init__.py:5): per pixel, L pyramid levels each
look up the 4 cell corners of the pixel's position in a learned feature
table and bilinearly blend them; the concatenated (L·F)-dim feature runs
through a tiny ReLU MLP. Almost all capacity lives in the tables, so the
per-step FLOP count is tiny compared to a SIREN of equal parameter count
— the cost moves to memory-system gathers instead of MXU matmuls.

TPU mapping — two paths:

* `hashgrid_apply_flat` (arbitrary (N, 2) coords): the ENTIRE pyramid
  lookup is ONE fused `jnp.take` — all levels' tables are concatenated
  into a single (ΣT_l, F) tensor and the (N, L, 4) corner indices
  (direct indexing where the level grid fits, NGP spatial hashing above
  that) are computed vectorized over levels with static per-level select
  masks, so XLA sees one big gather (and one big scatter-add in the
  backward pass) rather than L small ones.
* `hashgrid_apply` (tensor-product grid, THE training/render path): the
  per-pixel gather is eliminated entirely. Each level first materializes
  its dense virtual grid G_l of shape (r+1, r+1, F) — a reshape for
  direct levels, a STATIC-index gather of only (r+1)² rows for hashed
  ones — and the bilinear blend becomes two separable interpolation
  MATMULS `A_rows @ G_l @ A_colsᵀ` that run on the MXU. This drops the
  memory-system work from N·L·4 gathered rows (+ an equally large
  backward scatter-add, the measured v5e killer: ~80 M gathers/s /
  ~12 M scatter-updates/s) to Σ(r+1)² rows, ~20× fewer at 512²×12
  levels, and the hashed levels' backward scatter-add is replaced by a
  precomputed TRANSPOSE-GATHER (per hash bucket, gather+sum its cells
  from the upstream grad via a padded static index table — a custom VJP)
  so no scatter remains anywhere on the training path.

The MLP is a standard (N, L·F) @ (…) matmul ladder in both paths.

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

import functools
import math
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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


def _mlp_ladder(mlp, z, compute_dtype=None):
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


def hashgrid_apply_flat(
    params: Params, coords: jnp.ndarray, cfg: HashGridConfig, compute_dtype=None
) -> jnp.ndarray:
    """(N, 2) coords in [0, 1] -> (N, out)."""
    z = _pyramid_features(params[0]["w"], coords, cfg, compute_dtype)
    return _mlp_ladder(params[1:], z, compute_dtype)


# --- separable (tensor-product grid) path --------------------------------


@functools.lru_cache(maxsize=None)
def _hashed_level_tables(r: int, cap: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static index tables for one hashed level (grid (r+1)² > cap rows).

    Returns (idx, inv):
      idx (cells,) int32 — NGP hash bucket of every dense-grid cell, in the
        same row-major (y, x) order and exact uint32 arithmetic as
        `_pyramid_features`' traced version.
      inv (cap, M) int32 — per bucket, the (padded) list of cells that hash
        to it; pad entries point at `cells` (a zero row appended to the
        upstream grad), so the level's table gradient is
        `dG_padded[inv].sum(axis=1)` — a static-index transpose-GATHER
        instead of XLA's default scatter-add (v5e: ~80 M gathers/s vs
        ~12 M scatter-updates/s, BASELINE.md gather/scatter ceiling).
    """
    side = r + 1
    yy, xx = np.meshgrid(
        np.arange(side, dtype=np.uint32),
        np.arange(side, dtype=np.uint32),
        indexing="ij",
    )
    idx = ((xx ^ (yy * np.uint32(_HASH_P2))) & np.uint32(cap - 1)).reshape(-1)
    cells = side * side
    counts = np.bincount(idx, minlength=cap)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    order = np.argsort(idx, kind="stable")
    inv = np.full((cap, int(counts.max())), cells, np.int32)
    pos = np.arange(cells) - np.repeat(starts, counts)
    inv[idx[order], pos] = order
    return idx.astype(np.int32), inv


@functools.lru_cache(maxsize=None)
def _hashed_materializer(r: int, cap: int):
    """tbl (cap, F) -> dense grid ((r+1)², F) with a transpose-gather VJP."""
    idx, inv = _hashed_level_tables(r, cap)

    @jax.custom_vjp
    def materialize(tbl):
        return jnp.take(tbl, idx, axis=0, mode="clip")

    def fwd(tbl):
        return materialize(tbl), None

    def bwd(_, dg):
        dg_pad = jnp.concatenate(
            [dg, jnp.zeros((1, dg.shape[-1]), dg.dtype)], axis=0
        )
        return (jnp.take(dg_pad, inv, axis=0, mode="clip").sum(axis=1),)

    materialize.defvjp(fwd, bwd)
    return materialize


def _interp_matrix(axis_coords, r: int, compute_dtype=None):
    """(K,) axis coords in [0, 1] -> (K, r+1) two-nonzero bilinear rows.

    Same floor/clip/frac semantics as `_pyramid_features` per axis:
    coord==1.0 lands on the last cell with frac 1.0."""
    pos = axis_coords * jnp.float32(r)
    p0 = jnp.clip(jnp.floor(pos), 0.0, float(r - 1))
    f = pos - p0
    i0 = p0.astype(jnp.int32)
    lanes = jnp.arange(r + 1, dtype=jnp.int32)[None, :]
    a = jnp.where(lanes == i0[:, None], 1.0 - f[:, None], 0.0) + jnp.where(
        lanes == i0[:, None] + 1, f[:, None], 0.0
    )
    return a if compute_dtype is None else a.astype(compute_dtype)


def _pyramid_features_grid(table, rows, cols, cfg: HashGridConfig,
                           compute_dtype=None):
    """Tensor-product grid (rows (H,), cols (W,)) -> (H, W, L·F) features.

    Per level: materialize the dense virtual grid G_l ((r+1, r+1, F) —
    reshape for direct levels, static-index gather + transpose-gather VJP
    for hashed ones) and run the bilinear blend as two interpolation
    matmuls A_rows @ G_l @ A_colsᵀ on the MXU. Numerically the same blend
    as `_pyramid_features` (weights factorize exactly: w_corner = wy·wx),
    evaluated with Σ(r+1)² memory-system rows instead of H·W·L·4."""
    cap = 1 << cfg.log2_table_size
    t = table if compute_dtype is None else table.astype(compute_dtype)
    feats = []
    for r, size, off in zip(
        cfg.level_resolutions, cfg.level_table_sizes, cfg.level_offsets
    ):
        side = r + 1
        tbl = jax.lax.slice_in_dim(t, off, off + size)
        if side * side <= cap:
            g = tbl.reshape(side, side, cfg.features)
        else:
            g = _hashed_materializer(r, cap)(tbl).reshape(
                side, side, cfg.features
            )
        a_r = _interp_matrix(rows, r, compute_dtype)  # (H, side)
        a_c = _interp_matrix(cols, r, compute_dtype)  # (W, side)
        f1 = jnp.einsum(
            "hr,rcf->hcf", a_r, g, preferred_element_type=jnp.float32
        )
        if compute_dtype is not None:
            f1 = f1.astype(compute_dtype)
        f2 = jnp.einsum(
            "hcf,wc->hwf", f1, a_c, preferred_element_type=jnp.float32
        )
        feats.append(f2 if compute_dtype is None else f2.astype(compute_dtype))
    return jnp.concatenate(feats, axis=-1)


def hashgrid_apply(
    params: Params, grid: jnp.ndarray, cfg: HashGridConfig, compute_dtype=None
) -> jnp.ndarray:
    """(H, W, 2) tensor-product grid -> (H, W, out), separable fast path.

    `grid` must be a tensor product (grid[y, x] == (rows[y], cols[x]), the
    framework's get_grid/row-chunk layout) — the fit/quant/decode drivers
    guarantee this whenever they route through `apply` (ModelDef.separable
    semantics, training/fit.py make_loss_fn)."""
    h, w, _ = grid.shape
    z = _pyramid_features_grid(
        params[0]["w"], grid[:, 0, 0], grid[0, :, 1], cfg, compute_dtype
    )
    out = _mlp_ladder(params[1:], z.reshape(h * w, -1), compute_dtype)
    return out.reshape(h, w, -1)
