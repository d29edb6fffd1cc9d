"""Feathermap (structured multi-hashing) tests."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from implicit_image_tpu.data import get_grid, synthetic_image
from implicit_image_tpu.feathermap import (
    build_feather_model,
    feather_init,
    materialize,
    materialize_tensor,
)
from implicit_image_tpu.models import build_model


def _base(depth=4, hidden=16):
    mdef, mcfg = build_model("siren", depth=depth, hidden_size=hidden)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    return mdef, mcfg, params


def test_spec_sizes():
    mdef, mcfg, params = _base()
    total = sum(l[k].size for l in params for k in ("w", "b"))
    fparams, spec, _ = feather_init(jax.random.PRNGKey(1), params, mcfg, 0.5)
    assert spec.size_n == math.ceil(math.sqrt(total))
    assert spec.size_m == math.ceil(0.5 * spec.size_n / 2)
    assert spec.total == total
    assert fparams[0]["w"].shape == (spec.size_n, spec.size_m)
    assert fparams[1]["w"].shape == (spec.size_m, spec.size_n)
    # compressed param count < dense when compress < max ratio
    n_feather = fparams[0]["w"].size + fparams[1]["w"].size + fparams[2]["b"].size
    assert n_feather < total


def test_materialize_shapes_and_scalers():
    mdef, mcfg, params = _base()
    fparams, spec, frozen = feather_init(jax.random.PRNGKey(1), params, mcfg, 0.5)
    base = materialize(fparams, spec, frozen, len(params))
    for orig, new in zip(params, base):
        assert set(orig.keys()) == set(new.keys())
        for k in orig:
            assert orig[k].shape == new[k].shape
    # scaler semantics: layer-0 weights scaled by the SIREN bound 1/fan_in
    v = (np.asarray(fparams[0]["w"]) @ np.asarray(fparams[1]["w"])).reshape(-1)
    w0 = v[: params[0]["w"].size].reshape(params[0]["w"].shape)
    np.testing.assert_allclose(
        np.asarray(base[0]["w"]), mcfg.weight_bound(0) * w0, rtol=1e-6
    )


def test_materialize_tensor_matches_full():
    mdef, mcfg, params = _base()
    fparams, spec, frozen = feather_init(jax.random.PRNGKey(1), params, mcfg, 0.3)
    base = materialize(fparams, spec, frozen, len(params))
    for idx, (layer, key, shape, _) in enumerate(spec.entries):
        lazy = materialize_tensor(fparams, spec, idx)
        np.testing.assert_allclose(
            np.asarray(lazy), np.asarray(base[layer][key]), rtol=1e-5, atol=1e-7
        )


def test_feather_model_fits():
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit

    img = synthetic_image(32, 32, seed=0)
    grid = get_grid(32, 32)
    mdef, mcfg = build_model("siren", depth=4, hidden_size=32)
    fdef = build_feather_model(mdef, mcfg, compress=0.5)
    res = fit(
        jax.random.PRNGKey(0), fdef, mcfg, grid, img,
        TrainConfig(num_steps=500, log_steps=250), OptimConfig(lr=1e-3),
    )
    psnr = np.asarray(res.metrics["psnr"])
    psnr = psnr[~np.isnan(psnr)]
    assert psnr[-1] > 20.0, psnr


def test_feather_fourier_keeps_frozen_encoding():
    mdef, mcfg = build_model("fourier", depth=4, hidden_size=16, map_size=32)
    fdef = build_feather_model(mdef, mcfg, compress=0.5)
    fparams = fdef.init(jax.random.PRNGKey(0), mcfg)
    # frozen B carried through and used by apply
    grid = get_grid(8, 8)
    out = fdef.apply(fparams, grid, mcfg)
    assert out.shape == (8, 8, 3)
    base = mdef.init(jax.random.PRNGKey(0), mcfg)
    np.testing.assert_array_equal(
        np.asarray(fparams[2]["frozen_0_B"]), np.asarray(base[0]["B"])
    )


def test_feather_wrap_preserves_separable_fast_path():
    """Feather-wrapping a separable base (CoordX) must keep the factorized
    grid fast path flag and still train (fit through the grid path)."""
    import numpy as np

    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.feathermap import build_feather_model
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit

    mdef, mcfg = build_model("coordx", depth=6, hidden_size=16, split_depth=2)
    fdef = build_feather_model(mdef, mcfg, compress=0.5)
    assert fdef.separable
    res = fit(
        jax.random.PRNGKey(0), fdef, mcfg, get_grid(16, 16),
        synthetic_image(16, 16, seed=0),
        TrainConfig(num_steps=60, log_steps=30), OptimConfig(lr=1e-3),
    )
    loss = np.asarray(res.metrics["loss"])
    assert loss[-1] < loss[0]
