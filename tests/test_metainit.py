"""Meta-learned initialization (training/metainit.py).

The reference has no warm-start capability (its compress.py always
constructs a fresh model); these tests cover the beyond-reference REPTILE
meta-init: transfer to a held-out image, artifact round-trip + mismatch
guards, and the train.init_path plumbing through the compress pipeline.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from implicit_image_tpu.data import get_grid, stable_seed, synthetic_image
from implicit_image_tpu.models import build_model
from implicit_image_tpu.training.metainit import (
    MetaConfig,
    load_meta_init,
    meta_pool,
    meta_train,
    save_meta_init,
)


def _tiny_problem():
    mdef, mcfg = build_model(
        "siren", depth=3, hidden_size=16, input_size=2, output_size=3
    )
    grid = get_grid(24, 24)
    return mdef, mcfg, grid


def test_meta_pool_excludes_eval_seeds():
    pool = meta_pool(16, 16, 4)
    assert pool.shape == (4, 16, 16, 3)
    banned = [synthetic_image(16, 16, seed=0)] + [
        synthetic_image(16, 16, seed=stable_seed(n))
        for n in ("flower", "big_building", "bridge")
    ]
    for img in pool:
        for evil in banned:
            assert not np.allclose(img, evil)


def test_meta_train_transfers_to_heldout_image():
    mdef, mcfg, grid = _tiny_problem()
    meta_cfg = MetaConfig(
        pool_size=4, inner_steps=30, outer_steps=8, meta_batch=2,
        chunk=4, seed=0,
    )
    pool = meta_pool(24, 24, meta_cfg.pool_size)
    meta_params, losses, _ = meta_train(mdef, mcfg, grid, pool, meta_cfg)
    assert losses.shape == (meta_cfg.outer_steps,)
    # the meta-curve must improve over meta-training
    assert float(losses[-1]) < float(losses[0])

    # held-out image: meta-init must beat the random init both cold and
    # after a short adaptation budget
    held = jnp.asarray(
        synthetic_image(24, 24, seed=stable_seed("heldout_xyz"))
    ).reshape(-1, 3)
    coords = grid.reshape(-1, 2)

    def loss_of(params):
        return float(
            jnp.mean((mdef.apply_flat(params, coords, mcfg, None) - held) ** 2)
        )

    rand_params = mdef.init(jax.random.PRNGKey(123), mcfg)
    assert loss_of(meta_params) < loss_of(rand_params)

    from implicit_image_tpu.training.fit import (
        OptimConfig, TrainConfig, make_fit_fn,
    )

    tc = TrainConfig(num_steps=20, log_steps=20)
    oc = OptimConfig(lr=3e-4)
    held_img = held.reshape(24, 24, 3)
    fit_meta = make_fit_fn(mdef, mcfg, grid, tc, oc, init_params=meta_params)
    fit_rand = make_fit_fn(mdef, mcfg, grid, tc, oc)
    key = jax.random.PRNGKey(7)
    p_meta = fit_meta(key, held_img)[0]
    p_rand = fit_rand(key, held_img)[0]
    assert loss_of(p_meta) < loss_of(p_rand)


def test_meta_train_validates_args():
    mdef, mcfg, grid = _tiny_problem()
    pool = meta_pool(24, 24, 2)
    with pytest.raises(ValueError, match="chunk"):
        meta_train(mdef, mcfg, grid, pool,
                   MetaConfig(outer_steps=5, chunk=2, meta_batch=2))
    with pytest.raises(ValueError, match="meta_batch"):
        meta_train(mdef, mcfg, grid, pool,
                   MetaConfig(outer_steps=4, chunk=2, meta_batch=8))
    with pytest.raises(ValueError, match="grid"):
        meta_train(mdef, mcfg, get_grid(8, 8), pool,
                   MetaConfig(outer_steps=4, chunk=2, meta_batch=2))


def test_save_load_roundtrip_and_mismatch_guards(tmp_path):
    mdef, mcfg, _ = _tiny_problem()
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    path = tmp_path / "meta.npz"
    save_meta_init(path, params, mdef.name, mcfg)

    loaded = load_meta_init(path, expect_model="siren", expect_mcfg=mcfg)
    for a, b in zip(params, loaded):
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    with pytest.raises(ValueError, match="model"):
        load_meta_init(path, expect_model="coordx")
    _, wide_cfg = build_model(
        "siren", depth=3, hidden_size=32, input_size=2, output_size=3
    )
    with pytest.raises(ValueError, match="hidden_size"):
        load_meta_init(path, expect_model="siren", expect_mcfg=wide_cfg)


def test_init_path_plumbs_through_compress(tmp_path):
    """A CLI run warm-started from a meta artifact reproduces the
    fit(init_params=...) result — the config key is not decorative."""
    from implicit_image_tpu.compress import main as compress_main
    from implicit_image_tpu.config import compose

    mdef, mcfg, grid = _tiny_problem()
    params = mdef.init(jax.random.PRNGKey(5), mcfg)
    path = tmp_path / "meta.npz"
    save_meta_init(path, params, mdef.name, mcfg)

    overrides = [
        "img=synthetic", "img.height=24", "img.width=24",
        "mlp.depth=3", "mlp.hidden_size=16",
        "train.num_steps=5", "train.log_steps=5",
        "masking=none", "quant=none", "entropy_coding=plain",
        f"train.init_path={path}",
        f"output_dir={tmp_path}/run",
    ]
    psnr_warm, _ = compress_main(compose(overrides))

    psnr_cold, _ = compress_main(compose(
        [o for o in overrides if not o.startswith("train.init_path")]
        + [f"output_dir={tmp_path}/run_cold"]
    ))
    # same seed, same image: the only difference is the warm start; the
    # two fits must genuinely differ
    assert psnr_warm != psnr_cold


def test_batched_fit_warm_start_matches_single_fits():
    """batched_fit(init_params=meta) == per-image fit(init_params=meta):
    the fleet-encode warm start is the same math as N single warm fits."""
    from implicit_image_tpu.parallel.batched import batched_fit
    from implicit_image_tpu.training.fit import (
        OptimConfig, TrainConfig, make_fit_fn,
    )

    mdef, mcfg, grid = _tiny_problem()
    meta = mdef.init(jax.random.PRNGKey(9), mcfg)
    imgs = jnp.stack([
        jnp.asarray(synthetic_image(24, 24, seed=s)) for s in (11, 12)
    ])
    tc = TrainConfig(num_steps=8, log_steps=8)
    oc = OptimConfig()
    key = jax.random.PRNGKey(3)
    res = batched_fit(key, mdef, mcfg, grid, imgs, tc, oc, init_params=meta)

    single = jax.jit(make_fit_fn(mdef, mcfg, grid, tc, oc, init_params=meta))
    keys = jax.random.split(key, 2)
    for i in range(2):
        p_i = single(keys[i], imgs[i])[0]
        for la, lb in zip(p_i, jax.tree_util.tree_map(lambda x: x[i], res.params)):
            for k in la:
                np.testing.assert_allclose(
                    np.asarray(la[k]), np.asarray(lb[k]), atol=1e-6
                )


def test_ladder_warm_start_matches_single_fit():
    """ladder_fit(init_params=meta) member == fit(init_params=meta) at the
    member's density — warm starts compose with the one-compile ladder."""
    from implicit_image_tpu.parallel.ladder import ladder_fit
    from implicit_image_tpu.sparsity import MaskingConfig
    from implicit_image_tpu.training.fit import (
        OptimConfig, TrainConfig, make_fit_fn,
    )

    mdef, mcfg, grid = _tiny_problem()
    meta = mdef.init(jax.random.PRNGKey(21), mcfg)
    img = jnp.asarray(synthetic_image(24, 24, seed=31))
    tc = TrainConfig(num_steps=12, log_steps=12)
    oc = OptimConfig()
    masking = MaskingConfig(density=0.5, interval=4, end_when=10)
    key = jax.random.PRNGKey(2)
    densities = [0.3, 0.6]
    res = ladder_fit(key, mdef, mcfg, grid, img, tc, oc, masking,
                     densities, init_params=meta)

    keys = jax.random.split(key, len(densities))
    for i, d in enumerate(densities):
        import dataclasses
        cfg_d = dataclasses.replace(masking, density=d)
        single = jax.jit(
            make_fit_fn(mdef, mcfg, grid, tc, oc, cfg_d, init_params=meta)
        )
        p_i = single(keys[i], img)[0]
        for la, lb in zip(
            p_i, jax.tree_util.tree_map(lambda x: x[i], res.params)
        ):
            for k in la:
                np.testing.assert_allclose(
                    np.asarray(la[k]), np.asarray(lb[k]), atol=1e-6
                )


def test_committed_flagship_artifact_loads_and_is_trained():
    """The committed bench artifact (assets/meta/coordx_s5w96_512.npz)
    must load against the flagship architecture and be a genuinely
    trained init — bench.py's warm flagship depends on it."""
    from pathlib import Path

    path = (
        Path(__file__).resolve().parent.parent
        / "assets/meta/coordx_s5w96_512.npz"
    )
    assert path.exists(), "bench.py warm flagship artifact missing"
    mdef, mcfg = build_model(
        "coordx", depth=8, hidden_size=96, split_depth=5
    )
    params = load_meta_init(path, expect_model="coordx", expect_mcfg=mcfg)
    rand = mdef.init(jax.random.PRNGKey(0), mcfg)
    assert len(params) == len(rand)
    # trained weights, not a re-serialized random init: shapes match but
    # values are far from any fresh draw's scale pattern
    diffs = [
        float(jnp.abs(a[k] - b[k]).max())
        for a, b in zip(params, rand)
        for k in a
    ]
    assert max(diffs) > 1e-3


def test_meta_train_cli(tmp_path):
    from implicit_image_tpu.meta_train import run
    from implicit_image_tpu.config import compose

    out = tmp_path / "meta_cli.npz"
    cfg = compose([
        "img.height=16", "img.width=16",
        "mlp.depth=3", "mlp.hidden_size=8",
        "meta.pool_size=2", "meta.inner_steps=5",
        "meta.outer_steps=3", "meta.meta_batch=2",
        "meta.chunk=2",  # not a divisor of 3 -> must be clamped, not crash
        f"meta.out={out}",
    ])
    assert run(cfg) == str(out)
    loaded = load_meta_init(out, expect_model="siren")
    assert len(loaded) == 3


def test_resolve_auto_init_arbitration(tmp_path, monkeypatch):
    """train.init_path=auto (VERDICT r3 item 4): warm only when the
    budget is inside the measured warm-win regime AND a committed
    artifact matches the architecture; otherwise cold with a reason."""
    from implicit_image_tpu.training import metainit
    from implicit_image_tpu.training.metainit import (
        WARM_BUDGET_MAX_STEPS,
        resolve_auto_init,
        save_meta_init,
    )

    mdef, mcfg, grid = _tiny_problem()
    params = mdef.init(jax.random.PRNGKey(5), mcfg)
    meta_dir = tmp_path / "meta"
    meta_dir.mkdir()

    # empty store -> cold
    p, path, why = resolve_auto_init(mdef.name, mcfg, 500, meta_dir=meta_dir)
    assert p is None and path is None and "no matching artifact" in why

    # mismatched architecture -> cold, and the reason names the artifact
    other_def, other_cfg = build_model("siren", depth=3, hidden_size=32)
    save_meta_init(meta_dir / "wrong.npz", other_def.init(
        jax.random.PRNGKey(0), other_cfg), other_def.name, other_cfg)
    p, path, why = resolve_auto_init(mdef.name, mcfg, 500, meta_dir=meta_dir)
    assert p is None and "wrong.npz" in why

    # matching artifact inside the regime -> warm
    save_meta_init(meta_dir / "good.npz", params, mdef.name, mcfg)
    p, path, why = resolve_auto_init(mdef.name, mcfg, 500, meta_dir=meta_dir)
    assert p is not None and path.name == "good.npz"
    np.testing.assert_array_equal(np.asarray(p[0]["w"]),
                                  np.asarray(params[0]["w"]))

    # past the measured warm-win budget -> cold even though the
    # artifact matches (the regime cap is the largest MEASURED win —
    # r5 raised it to 3000 after the tf32 re-measurement)
    p, path, why = resolve_auto_init(
        mdef.name, mcfg, WARM_BUDGET_MAX_STEPS + 1, meta_dir=meta_dir
    )
    assert p is None and "warm-win regime" in why


def test_init_path_auto_through_compress(tmp_path, monkeypatch, caplog):
    """compress.py honors train.init_path=auto: warm inside the regime
    (reproducing the explicit-path run bit-for-bit), cold past it, and
    an explicit warm past the regime warns."""
    import logging

    from implicit_image_tpu.compress import main as compress_main
    from implicit_image_tpu.config import compose
    from implicit_image_tpu.training import metainit

    mdef, mcfg, grid = _tiny_problem()
    params = mdef.init(jax.random.PRNGKey(5), mcfg)
    meta_dir = tmp_path / "meta"
    meta_dir.mkdir()
    path = meta_dir / "tiny.npz"
    # basins are precision-specific: the artifact must match the run's
    # matmul_precision, which defaults to tensorfloat32 since r5
    save_meta_init(path, params, mdef.name, mcfg,
                   matmul_precision="tensorfloat32")
    monkeypatch.setattr(metainit, "default_meta_dir", lambda: meta_dir)

    base = [
        "img=synthetic", "img.height=24", "img.width=24",
        "mlp.depth=3", "mlp.hidden_size=16",
        "train.num_steps=5", "train.log_steps=5",
        "masking=none", "quant=none", "entropy_coding=plain",
    ]
    with caplog.at_level(logging.INFO, logger="implicit_image_tpu"):
        psnr_auto, _ = compress_main(compose(
            base + ["train.init_path=auto", f"output_dir={tmp_path}/auto"]
        ))
    assert any("auto -> warm" in r.message for r in caplog.records)

    psnr_explicit, _ = compress_main(compose(
        base + [f"train.init_path={path}", f"output_dir={tmp_path}/exp"]
    ))
    assert psnr_auto == psnr_explicit  # same artifact, same arbitration

    # budget past the regime: auto goes cold and matches the cold run
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="implicit_image_tpu"):
        psnr_auto_big, _ = compress_main(compose(
            base + ["train.init_path=auto", "train.num_steps=3001",
                    "train.log_steps=3001", f"output_dir={tmp_path}/autobig"]
        ))
    assert any("auto -> cold" in r.message for r in caplog.records)

    # explicit warm past the regime is honored but warns
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="implicit_image_tpu"):
        compress_main(compose(
            base + [f"train.init_path={path}", "train.num_steps=3001",
                    "train.log_steps=3001", f"output_dir={tmp_path}/expbig"]
        ))
    assert any("warm-win regime" in r.message for r in caplog.records)


def test_resolve_auto_init_matches_precision(tmp_path):
    """Warm-start basins are precision-specific (BASELINE.md "Matmul pass
    precision"): auto picks the artifact whose recorded meta-training
    matmul_precision equals the run's, and declines a mismatch with a
    reason naming both."""
    from implicit_image_tpu.training.metainit import (
        meta_precision,
        resolve_auto_init,
        save_meta_init,
    )

    mdef, mcfg, grid = _tiny_problem()
    params = mdef.init(jax.random.PRNGKey(5), mcfg)
    meta_dir = tmp_path / "meta"
    meta_dir.mkdir()
    save_meta_init(meta_dir / "default.npz", params, mdef.name, mcfg)
    save_meta_init(meta_dir / "tf32.npz", params, mdef.name, mcfg,
                   matmul_precision="tensorfloat32")
    assert meta_precision(meta_dir / "default.npz") is None
    assert meta_precision(meta_dir / "tf32.npz") == "tensorfloat32"

    p, path, why = resolve_auto_init(mdef.name, mcfg, 500, meta_dir=meta_dir)
    assert path.name == "default.npz"
    p, path, why = resolve_auto_init(
        mdef.name, mcfg, 500, meta_dir=meta_dir,
        matmul_precision="tensorfloat32",
    )
    assert path.name == "tf32.npz"
    p, path, why = resolve_auto_init(
        mdef.name, mcfg, 500, meta_dir=meta_dir,
        matmul_precision="float32",
    )
    assert p is None and "matmul_precision" in why
