import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from implicit_image_tpu.data import get_grid
from implicit_image_tpu.models import build_model
from implicit_image_tpu.models.siren import SirenConfig, init_siren, siren_apply


def test_registry():
    for name in ["siren", "fourier"]:
        mdef, cfg = build_model(name, name=name, depth=4, hidden_size=32)
        assert mdef.name == name


def test_siren_init_bounds():
    cfg = SirenConfig(depth=5, hidden_size=64, first_omega_0=50.0, hidden_omega_0=30.0)
    params = init_siren(jax.random.PRNGKey(0), cfg)
    assert len(params) == 5
    # first layer: U(±1/fan_in) (reference siren.py:46-47)
    w0 = np.asarray(params[0]["w"])
    assert w0.shape == (2, 64)
    assert np.abs(w0).max() <= 1.0 / 2 + 1e-6
    # hidden: U(±sqrt(6/fan_in)/omega) (reference siren.py:48-49)
    bound = math.sqrt(6.0 / 64) / 30.0
    for layer in params[1:]:
        w = np.asarray(layer["w"])
        assert np.abs(w).max() <= bound + 1e-6
        # uniform should nearly reach the bound
        assert np.abs(w).max() >= 0.8 * bound


def test_siren_forward_shapes_and_jit():
    mdef, cfg = build_model("siren", depth=4, hidden_size=32)
    params = mdef.init(jax.random.PRNGKey(1), cfg)
    grid = get_grid(10, 12)
    out = mdef.apply(params, grid, cfg)
    assert out.shape == (10, 12, 3)
    out_jit = jax.jit(lambda p, g: mdef.apply(p, g, cfg))(params, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_jit), atol=1e-6)


def test_siren_output_mapping():
    """Siren output = last_linear/2 + 0.5; with zero last-layer weights -> 0.5."""
    mdef, cfg = build_model("siren", depth=3, hidden_size=16)
    params = list(mdef.init(jax.random.PRNGKey(2), cfg))
    params[-1] = {
        "w": jnp.zeros_like(params[-1]["w"]),
        "b": jnp.zeros_like(params[-1]["b"]),
    }
    out = mdef.apply(tuple(params), get_grid(4, 4), cfg)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-7)


def test_siren_small_dense_width():
    _, cfg = build_model("siren", hidden_size=128, small_dense_density=0.5)
    assert cfg.effective_hidden == int(128 * math.sqrt(0.5))


def test_fourier_forward():
    mdef, cfg = build_model("fourier", depth=5, hidden_size=32, map_size=64)
    params = mdef.init(jax.random.PRNGKey(3), cfg)
    # frozen encoding + depth-1 linear layers (reference fourier.py:45-57)
    assert len(params) == 1 + (5 - 1)
    assert params[0]["B"].shape == (2, 32)
    out = mdef.apply(params, get_grid(6, 7), cfg)
    assert out.shape == (6, 7, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid


def test_siren_matches_manual_forward():
    """Hand-computed 2-layer SIREN forward."""
    cfg = SirenConfig(depth=2, hidden_size=4, first_omega_0=5.0, hidden_omega_0=3.0)
    params = init_siren(jax.random.PRNGKey(4), cfg)
    grid = get_grid(3, 3)
    out = np.asarray(siren_apply(params, grid, cfg))

    x = np.asarray(grid).reshape(-1, 2)
    x = (x - 0.5) * 2.0
    w0, b0 = np.asarray(params[0]["w"]), np.asarray(params[0]["b"])
    w1, b1 = np.asarray(params[1]["w"]), np.asarray(params[1]["b"])
    h = np.sin(5.0 * (x @ w0 + b0))
    y = (h @ w1 + b1) / 2.0 + 0.5
    np.testing.assert_allclose(out.reshape(-1, 3), y, atol=1e-5)


def test_coordx_registry_and_shapes():
    from implicit_image_tpu.models import build_model

    mdef, cfg = build_model("coordx", depth=8, hidden_size=32, split_depth=3)
    assert mdef.separable
    params = mdef.init(jax.random.PRNGKey(0), cfg)
    # 2 branches x split_depth + fused hidden + output layer, flat tuple
    assert len(params) == 2 * 3 + (8 - 3 - 1) + 1
    assert params[0]["w"].shape == (1, 32)  # x-branch entry
    assert params[3]["w"].shape == (1, 32)  # y-branch entry
    assert params[-1]["w"].shape == (32, 3)
    out = mdef.apply(params, get_grid(6, 9), cfg)
    assert out.shape == (6, 9, 3)


def test_coordx_grid_apply_equals_flat_apply():
    """The O(H+W) factorized grid path and the generic per-point path must
    agree exactly on a separable grid (models/coordx.py)."""
    from implicit_image_tpu.models import build_model

    mdef, cfg = build_model("coordx", depth=6, hidden_size=16, split_depth=2)
    params = mdef.init(jax.random.PRNGKey(1), cfg)
    grid = get_grid(11, 7)
    a = np.asarray(mdef.apply(params, grid, cfg))
    b = np.asarray(mdef.apply_flat(params, grid.reshape(-1, 2), cfg))
    np.testing.assert_allclose(a.reshape(-1, 3), b, atol=1e-6)


def test_coordx_fit_uses_grid_path_and_converges():
    """Fit through the separable fast path (training/fit.py grid_hw) must
    converge like any other model family."""
    from implicit_image_tpu.data import synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit

    mdef, cfg = build_model("coordx", depth=6, hidden_size=32, split_depth=2)
    img = synthetic_image(24, 24, seed=0)
    res = fit(
        jax.random.PRNGKey(0), mdef, cfg, get_grid(24, 24), img,
        TrainConfig(num_steps=300, log_steps=100), OptimConfig(lr=1e-3),
    )
    p = np.asarray(res.metrics["psnr"])
    assert p[~np.isnan(p)][-1] > 25.0


def test_quant_skips_sub_codebook_layers():
    """Layers smaller than ~4 codebook entries stay full precision (a
    labels+centroids container would be larger than the raw tensor)."""
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.quant import QuantConfig, quantized_layer_indices

    mdef, cfg = build_model("coordx", depth=8, hidden_size=32, split_depth=3)
    params = mdef.init(jax.random.PRNGKey(0), cfg)
    qidx = quantized_layer_indices(params, QuantConfig(bits=8))
    # both 1x32 branch-entry layers (0 and 3) skipped, as are first/last
    assert 0 not in qidx and 3 not in qidx
    assert all(params[i]["w"].size >= 4 * 256 for i in qidx)


# ---------------------------------------------------------------------------
# hashgrid (multiresolution hash encoding, arXiv:2201.05989)


def _np_pyramid(table, coords, cfg):
    """Independent numpy mirror of models/hashgrid._pyramid_features."""
    out = np.zeros((coords.shape[0], cfg.n_levels * cfg.features), np.float32)
    cap = 1 << cfg.log2_table_size
    for l, (res, tsize, off) in enumerate(
        zip(cfg.level_resolutions, cfg.level_table_sizes, cfg.level_offsets)
    ):
        pos = coords * res
        p0 = np.clip(np.floor(pos), 0, res - 1)
        frac = pos - p0
        for dy in (0, 1):
            for dx in (0, 1):
                cy = (p0[:, 0] + dy).astype(np.uint64)
                cx = (p0[:, 1] + dx).astype(np.uint64)
                if tsize < cap or (res + 1) ** 2 <= cap:
                    idx = cy * (res + 1) + cx
                else:
                    idx = (cx ^ (cy * 2654435761)) % cap
                wgt = (frac[:, 0] if dy else 1 - frac[:, 0]) * (
                    frac[:, 1] if dx else 1 - frac[:, 1]
                )
                f = table[(off + idx).astype(np.int64)]
                out[:, l * cfg.features : (l + 1) * cfg.features] += (
                    f * wgt[:, None]
                )
    return out


def test_hashgrid_registry_and_shapes():
    mdef, cfg = build_model(
        "hashgrid", n_levels=6, log2_table_size=10, base_resolution=8,
        finest_resolution=64, depth=3, hidden_size=32,
    )
    assert mdef.separable  # apply runs the interpolation-matmul grid path
    params = mdef.init(jax.random.PRNGKey(0), cfg)
    assert len(params) == 1 + 3  # table + depth MLP layers
    assert params[0]["w"].shape == (cfg.table_rows, cfg.features)
    assert "b" not in params[0]
    assert params[1]["w"].shape == (cfg.n_levels * cfg.features, 32)
    assert params[-1]["w"].shape == (32, 3)
    # level geometry: NGP schedule endpoints + dense-until-cap table sizes
    assert cfg.level_resolutions[0] == 8
    assert cfg.level_resolutions[-1] == 64
    cap = 1 << 10
    for r, t in zip(cfg.level_resolutions, cfg.level_table_sizes):
        assert t == min((r + 1) ** 2, cap)
    assert cfg.level_offsets[0] == 0
    assert cfg.table_rows == sum(cfg.level_table_sizes)
    out = mdef.apply(params, get_grid(6, 9), cfg)
    assert out.shape == (6, 9, 3)


def test_hashgrid_pyramid_matches_numpy_mirror():
    """The fused one-gather pyramid lookup equals a straightforward
    per-level numpy implementation, including the direct/hashed split and
    the coords==1.0 boundary (clipped to the last cell)."""
    from implicit_image_tpu.models.hashgrid import _pyramid_features

    mdef, cfg = build_model(
        "hashgrid", n_levels=5, log2_table_size=8, base_resolution=4,
        finest_resolution=48, depth=2, hidden_size=8,
    )
    # both regimes must be exercised
    cap = 1 << cfg.log2_table_size
    assert any((r + 1) ** 2 <= cap for r in cfg.level_resolutions)
    assert any((r + 1) ** 2 > cap for r in cfg.level_resolutions)
    params = mdef.init(jax.random.PRNGKey(3), cfg)
    table = np.asarray(params[0]["w"])
    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 1, (257, 2)).astype(np.float32)
    coords[:4] = [[0, 0], [1, 1], [0, 1], [1, 0]]  # exact corners
    got = np.asarray(_pyramid_features(jnp.asarray(table), jnp.asarray(coords), cfg))
    want = _np_pyramid(table, coords, cfg)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_hashgrid_separable_apply_matches_flat():
    """The separable grid path (per-level dense grids + interpolation
    matmuls, static transpose-gather VJP) is the SAME function as the
    per-pixel gather path: forward outputs and table/MLP gradients must
    agree on a full grid and on a row-chunk sub-grid (the pixel_chunks
    layout), in both the direct and hashed level regimes."""
    mdef, cfg = build_model(
        "hashgrid", n_levels=5, log2_table_size=8, base_resolution=4,
        finest_resolution=48, depth=3, hidden_size=16,
    )
    cap = 1 << cfg.log2_table_size
    assert any((r + 1) ** 2 <= cap for r in cfg.level_resolutions)
    assert any((r + 1) ** 2 > cap for r in cfg.level_resolutions)
    params = mdef.init(jax.random.PRNGKey(7), cfg)
    # non-trivial table so grads differ per level
    params = (params[0] | {
        "w": params[0]["w"]
        + 0.01 * jax.random.normal(jax.random.PRNGKey(8),
                                   params[0]["w"].shape)
    },) + params[1:]

    for grid in (get_grid(33, 17), get_grid(32, 32)[10:18]):
        h, w, _ = grid.shape
        out_sep = np.asarray(mdef.apply(params, grid, cfg))
        out_flat = np.asarray(
            mdef.apply_flat(params, grid.reshape(h * w, 2), cfg)
        ).reshape(h, w, -1)
        np.testing.assert_allclose(out_sep, out_flat, atol=2e-5)

        tgt = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, out_sep.shape), jnp.float32
        )
        g_sep = jax.grad(
            lambda p: jnp.mean((mdef.apply(p, grid, cfg) - tgt) ** 2)
        )(params)
        g_flat = jax.grad(
            lambda p: jnp.mean(
                (mdef.apply_flat(p, grid.reshape(h * w, 2), cfg)
                 - tgt.reshape(h * w, -1)) ** 2
            )
        )(params)
        for ls, lf in zip(g_sep, g_flat):
            for k in ls:
                np.testing.assert_allclose(
                    np.asarray(ls[k]), np.asarray(lf[k]), atol=2e-6,
                    err_msg=k,
                )


def test_hashgrid_transpose_gather_tables():
    """Static inverse tables: every dense-grid cell appears exactly once
    across the buckets' padded lists, and bucket membership matches the
    hash; the transpose-gather grad therefore equals XLA's scatter-add."""
    from implicit_image_tpu.models.hashgrid import _hashed_level_tables

    r, cap = 48, 256
    idx, inv = _hashed_level_tables(r, cap)
    cells = (r + 1) ** 2
    assert idx.shape == (cells,) and inv.shape[0] == cap
    real = inv[inv < cells]
    assert real.size == cells and np.unique(real).size == cells
    for b in (0, 7, cap - 1):
        members = inv[b][inv[b] < cells]
        assert np.all(idx[members] == b)
        assert set(members) == set(np.flatnonzero(idx == b))


def test_hashgrid_separable_under_vmap_and_fit():
    """batched_fit vmaps the loss over a params batch — the custom-VJP
    transpose-gather must batch correctly (value_and_grad under vmap)."""
    mdef, cfg = build_model(
        "hashgrid", n_levels=4, log2_table_size=6, base_resolution=4,
        finest_resolution=24, depth=2, hidden_size=8,
    )
    grid = get_grid(12, 12)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    pbatch = jax.vmap(lambda k: mdef.init(k, cfg))(keys)
    tgt = jnp.zeros((12, 12, 3))

    def loss(p):
        return jnp.mean((mdef.apply(p, grid, cfg) - tgt) ** 2)

    lb, gb = jax.vmap(jax.value_and_grad(loss))(pbatch)
    for i in range(3):
        p_i = jax.tree_util.tree_map(lambda x: x[i], pbatch)
        l_i, g_i = jax.value_and_grad(loss)(p_i)
        np.testing.assert_allclose(float(lb[i]), float(l_i), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(gb[0]["w"][i]), np.asarray(g_i[0]["w"]), atol=1e-7
        )


def test_hashgrid_grad_reaches_every_level():
    mdef, cfg = build_model(
        "hashgrid", n_levels=4, log2_table_size=8, base_resolution=4,
        finest_resolution=32, depth=2, hidden_size=8,
    )
    params = mdef.init(jax.random.PRNGKey(0), cfg)
    grid = get_grid(16, 16)

    def loss(p):
        return jnp.mean(mdef.apply(p, grid, cfg) ** 2)

    g = np.asarray(jax.grad(loss)(params)[0]["w"])
    for l, (t, off) in enumerate(zip(cfg.level_table_sizes, cfg.level_offsets)):
        assert np.abs(g[off : off + t]).sum() > 0, f"level {l} got no gradient"


def test_hashgrid_fit_converges():
    from implicit_image_tpu.data import synthetic_image
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit

    mdef, cfg = build_model(
        "hashgrid", n_levels=6, log2_table_size=10, base_resolution=8,
        finest_resolution=64, depth=3, hidden_size=32,
    )
    img = synthetic_image(64, 64, seed=0)
    res = fit(
        jax.random.PRNGKey(0), mdef, cfg, get_grid(64, 64), img,
        TrainConfig(num_steps=300, log_steps=100),
        OptimConfig(lr=1e-2, epsilon=1e-15),
    )
    p = np.asarray(res.metrics["psnr"])
    assert p[~np.isnan(p)][-1] > 30.0
