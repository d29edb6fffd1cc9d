"""Multi-device tests on the virtual 8-device CPU mesh (conftest.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_image_tpu.data import get_grid, synthetic_image
from implicit_image_tpu.models import build_model
from implicit_image_tpu.parallel import (
    make_mesh,
    make_sharded_fit_fn,
    batched_fit,
)
from implicit_image_tpu.parallel.sharded import sharded_fit
from implicit_image_tpu.sparsity import MaskingConfig
from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit


def _imgs(b, n=16):
    return np.stack([synthetic_image(n, n, seed=s) for s in range(b)])


def test_make_mesh_shapes():
    mesh = make_mesh(image=4, pixel=2)
    assert mesh.shape == {"image": 4, "pixel": 2}
    # sub-count meshes use a device prefix
    small = make_mesh(image=3, pixel=2)
    assert small.shape == {"image": 3, "pixel": 2}
    with pytest.raises(ValueError):
        make_mesh(image=5, pixel=2)  # 10 > 8 virtual devices


@pytest.mark.slow
def test_batched_fit_matches_single():
    """vmapped fits == individually-run fits (bitwise same program)."""
    grid = get_grid(16, 16)
    imgs = _imgs(4)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=8)
    tc, oc = TrainConfig(num_steps=50, log_steps=25), OptimConfig(lr=1e-3)
    key = jax.random.PRNGKey(7)

    res = batched_fit(key, mdef, mcfg, grid, imgs, tc, oc)
    assert res.params[0]["w"].shape[0] == 4

    keys = jax.random.split(key, 4)
    single = fit(keys[2], mdef, mcfg, grid, imgs[2], tc, oc)
    np.testing.assert_allclose(
        np.asarray(res.params[0]["w"][2]),
        np.asarray(single.params[0]["w"]),
        rtol=2e-5, atol=1e-6,
    )


def test_batched_fit_on_image_mesh():
    mesh = make_mesh(image=8, pixel=1)
    grid = get_grid(16, 16)
    imgs = _imgs(8)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=8)
    res = batched_fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, imgs,
        TrainConfig(num_steps=40, log_steps=20), OptimConfig(lr=1e-3),
        mesh=mesh,
    )
    loss = np.asarray(res.metrics["loss"])
    assert loss.shape == (8, 40)
    assert np.all(loss[:, -1] < loss[:, 0])


@pytest.mark.slow
def test_batched_sparse_fit_rigl():
    """RigL topology updates vmap across images (per-image masks)."""
    grid = get_grid(16, 16)
    imgs = _imgs(3)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)
    mk = MaskingConfig(density=0.5, end_when=30, interval=10)
    res = batched_fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, imgs,
        TrainConfig(num_steps=40, log_steps=20), OptimConfig(lr=1e-3), mk,
    )
    density = np.asarray(res.metrics["density"])[:, -1]
    np.testing.assert_allclose(density, 0.5, atol=0.1)
    # masks actually differ between images (independent topologies)
    m0 = np.asarray(res.mask_state.masks[1][0])
    m1 = np.asarray(res.mask_state.masks[1][1])
    assert not np.array_equal(m0, m1)


@pytest.mark.slow
def test_sharded_fit_matches_unsharded():
    """Pixel-axis sharding changes layout, not math."""
    mesh = make_mesh(image=1, pixel=8)
    grid = get_grid(32, 32)
    img = synthetic_image(32, 32, seed=0)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=8)
    tc, oc = TrainConfig(num_steps=60, log_steps=30), OptimConfig(lr=1e-3)
    key = jax.random.PRNGKey(1)

    res_sharded = sharded_fit(key, mesh, mdef, mcfg, grid, img, tc, oc)
    res_plain = fit(key, mdef, mcfg, grid, img, tc, oc)
    np.testing.assert_allclose(
        np.asarray(res_sharded.params[0]["w"]),
        np.asarray(res_plain.params[0]["w"]),
        rtol=2e-4, atol=2e-5,
    )
    p_sh = np.asarray(res_sharded.metrics["psnr"])
    p_pl = np.asarray(res_plain.metrics["psnr"])
    np.testing.assert_allclose(
        p_sh[~np.isnan(p_sh)], p_pl[~np.isnan(p_pl)], atol=0.2
    )


def test_sharded_fit_rejects_indivisible():
    mesh = make_mesh(image=1, pixel=8)
    grid = get_grid(30, 30)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=8)
    with pytest.raises(AssertionError):
        make_sharded_fit_fn(
            mesh, mdef, mcfg, grid,
            TrainConfig(num_steps=5, log_steps=5), OptimConfig(),
        )


def test_2d_mesh_batched_and_sharded():
    """Combined ("image", "pixel") layout: 4 images x 2-way pixel shards."""
    mesh = make_mesh(image=4, pixel=2)
    grid = get_grid(16, 16)
    imgs = _imgs(4)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=8)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from implicit_image_tpu.training.fit import make_fit_fn

    fit_fn = jax.vmap(
        make_fit_fn(
            mdef, mcfg, grid,
            TrainConfig(num_steps=30, log_steps=15), OptimConfig(lr=1e-3),
        )
    )
    jfit = jax.jit(
        fit_fn,
        in_shardings=(
            NamedSharding(mesh, P("image")),
            NamedSharding(mesh, P("image", "pixel")),
        ),
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    params, _, _, metrics = jfit(keys, jnp.asarray(imgs))
    loss = np.asarray(metrics["loss"])
    assert loss.shape == (4, 30)
    assert np.all(loss[:, -1] < loss[:, 0])


@pytest.mark.slow
def test_batched_segmented_matches_monolithic():
    """batched_fit's segmented execution (per-execution wall budget shared
    by the batch) is bit-equal to the monolithic scan."""
    imgs = np.stack([synthetic_image(16, 16, seed=s) for s in range(4)])
    grid = get_grid(16, 16)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=8)
    r1 = batched_fit(jax.random.PRNGKey(0), mdef, mcfg, grid, imgs,
                     TrainConfig(num_steps=60, log_steps=20, segment_steps=40),
                     OptimConfig(lr=1e-3))
    r2 = batched_fit(jax.random.PRNGKey(0), mdef, mcfg, grid, imgs,
                     TrainConfig(num_steps=60, log_steps=20, segment_steps=10**6),
                     OptimConfig(lr=1e-3))
    for a, b in zip(jax.tree_util.tree_leaves(r1.params),
                    jax.tree_util.tree_leaves(r2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.asarray(r1.metrics["loss"]).shape == (4, 60)


@pytest.mark.slow
def test_sharded_segmented_matches_monolithic():
    """sharded_fit's segmented path == monolithic on the virtual mesh."""
    mesh = make_mesh(image=1, pixel=8)
    grid = get_grid(32, 32)
    img = synthetic_image(32, 32, seed=0)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=8)
    key = jax.random.PRNGKey(1)
    r1 = sharded_fit(key, mesh, mdef, mcfg, grid, img,
                     TrainConfig(num_steps=60, log_steps=30, segment_steps=25),
                     OptimConfig(lr=1e-3))
    r2 = sharded_fit(key, mesh, mdef, mcfg, grid, img,
                     TrainConfig(num_steps=60, log_steps=30, segment_steps=10**6),
                     OptimConfig(lr=1e-3))
    for a, b in zip(jax.tree_util.tree_leaves(r1.params),
                    jax.tree_util.tree_leaves(r2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_full_pipeline_pixel_sharded(tmp_path):
    """fit -> kmeans finetune -> entropy code -> decode -> render, with the
    pixel axis sharded: decoded output matches the single-device pipeline
    (reference pipeline order compress.py:172-263, now under SPMD)."""
    from implicit_image_tpu.parallel import sharded_compress
    from implicit_image_tpu.quant import QuantConfig

    mesh = make_mesh(image=1, pixel=4)
    grid = get_grid(16, 16)
    img = synthetic_image(16, 16, seed=3)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)
    mk = MaskingConfig(density=0.5, end_when=30, interval=10)
    res = sharded_compress(
        jax.random.PRNGKey(0), mesh, mdef, mcfg, grid, img,
        TrainConfig(num_steps=40, log_steps=20), OptimConfig(lr=1e-3), mk,
        QuantConfig(bits=4, num_steps=10),
        stream_name="zstd", stream_dir=str(tmp_path / "sh"),
    )
    assert res.compressed_bytes > 0
    assert np.isfinite(res.quant_psnr)
    # the decoded bitstream renders within container (fp16 centroid)
    # rounding of the quant-phase PSNR
    assert abs(res.decoded_psnr - res.quant_psnr) < 0.5


@pytest.mark.slow
def test_full_pipeline_image_batched(tmp_path):
    """Batched (vmap over "image" axis) full pipeline: per-image bitstreams
    decode back to each image's own quant-phase quality."""
    from implicit_image_tpu.parallel import batched_compress
    from implicit_image_tpu.quant import QuantConfig

    mesh = make_mesh(image=2, pixel=1)
    grid = get_grid(16, 16)
    imgs = _imgs(2)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)
    mk = MaskingConfig(density=0.5, end_when=30, interval=10)
    results = batched_compress(
        jax.random.PRNGKey(0), mdef, mcfg, grid, imgs,
        TrainConfig(num_steps=40, log_steps=20), OptimConfig(lr=1e-3), mk,
        QuantConfig(bits=4, num_steps=10), mesh=mesh,
        stream_name="zstd", stream_root=str(tmp_path / "batch"),
    )
    assert len(results) == 2
    for r in results:
        assert r.compressed_bytes > 0
        assert abs(r.decoded_psnr - r.quant_psnr) < 0.5
    # independent images -> different streams
    assert results[0].compressed_bytes != results[1].compressed_bytes or (
        results[0].decoded_psnr != results[1].decoded_psnr
    )


def test_ladder_fit_members_match_single_fits():
    """One-compile density ladder: each member equals an individual fit at
    that density with the same member key (the segment program is
    density-free; only mask init differs)."""
    import dataclasses

    from implicit_image_tpu.parallel.ladder import ladder_fit

    grid = get_grid(16, 16)
    img = synthetic_image(16, 16, seed=0)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)
    tc = TrainConfig(num_steps=20, log_steps=10, segment_steps=16)
    oc = OptimConfig(lr=1e-3)
    mk = MaskingConfig(density=0.5, end_when=16, interval=4)
    densities = [0.3, 0.6]
    key = jax.random.PRNGKey(0)

    res = ladder_fit(key, mdef, mcfg, grid, img, tc, oc, mk, densities)
    final_density = np.asarray(res.metrics["density"])[:, -1]
    np.testing.assert_allclose(final_density, densities, atol=0.05)

    # one member suffices for the equality property (each extra single
    # fit pays its own compile; member 1 exercises the non-default density)
    keys = jax.random.split(key, len(densities))
    single = fit(
        keys[1], mdef, mcfg, grid, img, tc, oc,
        dataclasses.replace(mk, density=densities[1]),
    )
    np.testing.assert_allclose(
        np.asarray(res.params[0]["w"][1]),
        np.asarray(single.params[0]["w"]),
        rtol=2e-5, atol=1e-6,
    )


def test_ladder_gmp_members_match_single_fits():
    """GMP ladder: final_density rides MaskState.final_sparsity as a traced
    scalar, so members with DIFFERENT Zhu-Gupta targets share one compiled
    program and each equals an individual fit at its target."""
    import dataclasses

    from implicit_image_tpu.parallel.ladder import ladder_fit

    grid = get_grid(16, 16)
    img = synthetic_image(16, 16, seed=0)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)
    tc = TrainConfig(num_steps=24, log_steps=8, segment_steps=16)
    oc = OptimConfig(lr=1e-3)
    gmp = MaskingConfig(
        name="Pruning", density=1.0, sparse_init="random",
        prune_mode="global-magnitude", growth_mode="none",
        decay_schedule="magnitude-prune", final_density=0.5,
        start_when=2, end_when=20, interval=4,
    )
    finals = [0.25, 0.75]
    key = jax.random.PRNGKey(0)

    res = ladder_fit(key, mdef, mcfg, grid, img, tc, oc, gmp, finals)
    end_density = np.asarray(res.metrics["density"])[:, -1]
    # members prune toward DIFFERENT targets inside one program
    np.testing.assert_allclose(end_density, finals, atol=0.1)

    keys = jax.random.split(key, len(finals))
    for i in range(len(finals)):
        single = fit(
            keys[i], mdef, mcfg, grid, img, tc, oc,
            dataclasses.replace(gmp, final_density=finals[i]),
        )
        np.testing.assert_allclose(
            np.asarray(res.params[0]["w"][i]),
            np.asarray(single.params[0]["w"]),
            rtol=2e-5, atol=1e-6,
        )


@pytest.mark.slow
def test_ladder_compress_end_to_end(tmp_path):
    """Full ladder pipeline on the image mesh: per-density bitstreams
    decode to their member's quant quality and rate grows with density."""
    from implicit_image_tpu.parallel.ladder import ladder_compress
    from implicit_image_tpu.quant import QuantConfig

    mesh = make_mesh(image=2, pixel=1)
    grid = get_grid(16, 16)
    img = synthetic_image(16, 16, seed=1)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=32)
    mk = MaskingConfig(density=0.5, end_when=30, interval=10)
    results = ladder_compress(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=40, log_steps=20), OptimConfig(lr=1e-3), mk,
        [0.2, 0.8],
        quant_cfg=QuantConfig(bits=4, num_steps=10), mesh=mesh,
        stream_name="zstd", stream_root=str(tmp_path / "ladder"),
    )
    assert len(results) == 2
    for r in results:
        assert r.compressed_bytes > 0
        assert abs(r.decoded_psnr - r.quant_psnr) < 0.5
    # denser member -> larger stream (more nonzero weights to code)
    assert results[1].compressed_bytes > results[0].compressed_bytes


def test_coordx_batched_and_sharded():
    """The separable-model fast path must compile and agree under both
    SPMD layouts (vmap over "image", rows over "pixel")."""
    from implicit_image_tpu.parallel.sharded import sharded_fit

    grid = get_grid(16, 16)
    mdef, mcfg = build_model("coordx", depth=6, hidden_size=16, split_depth=2)
    tc, oc = TrainConfig(num_steps=20, log_steps=10), OptimConfig(lr=1e-3)
    key = jax.random.PRNGKey(0)

    imgs = _imgs(2)
    bres = batched_fit(key, mdef, mcfg, grid, imgs, tc, oc,
                       mesh=make_mesh(image=2, pixel=1))
    assert np.isfinite(np.asarray(bres.metrics["loss"])).all()

    sres = sharded_fit(key, make_mesh(image=1, pixel=4), mdef, mcfg, grid,
                       imgs[0], tc, oc)
    single = fit(key, mdef, mcfg, grid, imgs[0], tc, oc)
    np.testing.assert_allclose(
        np.asarray(sres.params[1]["w"]), np.asarray(single.params[1]["w"]),
        rtol=2e-5, atol=1e-6,
    )


def test_hashgrid_batched_and_sharded():
    """hashgrid's separable path (static-gather dense grids + interp
    matmuls, transpose-gather custom VJP) must compile and agree under
    both SPMD layouts — custom_vjp under vmap AND under GSPMD row
    sharding."""
    from implicit_image_tpu.parallel.sharded import sharded_fit

    grid = get_grid(16, 16)
    mdef, mcfg = build_model(
        "hashgrid", n_levels=4, log2_table_size=6, base_resolution=4,
        finest_resolution=24, depth=2, hidden_size=8,
    )
    assert any((r + 1) ** 2 > 64 for r in mcfg.level_resolutions)  # hashed
    tc, oc = TrainConfig(num_steps=20, log_steps=10), OptimConfig(lr=1e-2)
    key = jax.random.PRNGKey(0)

    imgs = _imgs(2)
    bres = batched_fit(key, mdef, mcfg, grid, imgs, tc, oc,
                       mesh=make_mesh(image=2, pixel=1))
    assert np.isfinite(np.asarray(bres.metrics["loss"])).all()

    sres = sharded_fit(key, make_mesh(image=1, pixel=4), mdef, mcfg, grid,
                       imgs[0], tc, oc)
    single = fit(key, mdef, mcfg, grid, imgs[0], tc, oc)
    np.testing.assert_allclose(
        np.asarray(sres.params[0]["w"]), np.asarray(single.params[0]["w"]),
        rtol=2e-5, atol=1e-6,
    )


def test_pipeline_forwards_coding_kwargs(tmp_path, monkeypatch):
    """Backend kwargs (e.g. zstd `level`) must reach the encoder AND the
    decoder from every SPMD pipeline entry, matching the single-run
    orchestrator's behavior (compress.py entropy-coding stage)."""
    import implicit_image_tpu.parallel.pipeline as pl
    from implicit_image_tpu.parallel import sharded_compress

    seen = {}
    real = pl.compress_state_dict

    def spy(state, d, name, **kw):
        seen.update(kw)
        return real(state, d, name, **kw)

    monkeypatch.setattr(pl, "compress_state_dict", spy)
    mesh = make_mesh(image=1, pixel=2)
    grid = get_grid(8, 8)
    img = synthetic_image(8, 8, seed=0)
    mdef, mcfg = build_model("siren", depth=2, hidden_size=8)
    res = sharded_compress(
        jax.random.PRNGKey(0), mesh, mdef, mcfg, grid, img,
        TrainConfig(num_steps=4, log_steps=2), OptimConfig(lr=1e-3),
        stream_name="zstd", stream_dir=str(tmp_path / "kw"),
        coding_kwargs={"level": 3},
    )
    assert seen.get("level") == 3
    assert res.compressed_bytes > 0


@pytest.mark.slow
def test_multihost_dryrun_four_processes_multi_fit():
    """SURVEY §2.8 DCN scope: 4 real `jax.distributed.initialize`
    processes (gloo over localhost, 2 virtual CPU devices each) build the
    GLOBAL 8-device mesh, run a jitted psum across process boundaries,
    and fit a fleet of 9 independent images (>1 fit per process, uneven
    3/2/2/2 split exercising _shard_bounds) whose allgathered results
    agree across all processes."""
    from implicit_image_tpu.parallel.multihost import launch_dryrun

    reports = launch_dryrun(
        num_processes=4, devices_per_process=2, fleet_size=9, steps=20
    )
    assert len(reports) == 4
    for r in reports:
        assert r["process_count"] == 4
        assert r["global_devices"] == 8
        assert r["local_devices"] == 2
        assert r["psum_ok"]
        assert len(r["fleet_psnrs"]) == 9
        assert all(np.isfinite(p) for p in r["fleet_psnrs"])
    # every process sees the SAME fleet-wide result
    for r in reports[1:]:
        assert r["fleet_psnrs"] == reports[0]["fleet_psnrs"]


@pytest.mark.slow
def test_multihost_dead_worker_fails_fast():
    """Failure path (VERDICT r3 weak #8): a worker that dies after
    distributed init leaves its peers blocked in the allgather; the
    supervisor must detect the death, kill the survivors, and raise —
    NOT hang until the gloo timeout. `die_process=1` injects the fault
    (worker 1 exits 17 post-init)."""
    import time

    from implicit_image_tpu.parallel.multihost import launch_dryrun

    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match=r"worker\(s\) \[1\] exited"):
        launch_dryrun(
            num_processes=3, devices_per_process=2, fleet_size=3,
            steps=20, timeout=240.0, die_process=1,
        )
    # detection must ride the worker's death, not the 240 s budget
    assert time.monotonic() - t0 < 180.0


def test_parse_ladder_cli_axes():
    """RigL ladders sweep masking.density; GMP ladders sweep
    masking.final_density; single values on the other axis pass through
    and comma lists on it are rejected."""
    from implicit_image_tpu.parallel.ladder import parse_ladder_cli

    cfg, dens, gmp = parse_ladder_cli(
        ["masking=RigL", "masking.density=0.1,0.3"]
    )
    assert not gmp and dens == [0.1, 0.3]

    cfg, dens, gmp = parse_ladder_cli(
        ["masking=Pruning", "masking.final_density=0.2,0.6",
         "masking.density=0.9"]
    )
    assert gmp and dens == [0.2, 0.6]
    assert float(cfg.masking.density) == 0.9  # init density passed through

    # default masking (dense) falls back to RigL with the default ladder
    cfg, dens, gmp = parse_ladder_cli([])
    assert not gmp and cfg.masking.name == "RigL" and len(dens) == 5

    with pytest.raises(ValueError, match="not the ladder axis"):
        parse_ladder_cli(["masking=RigL", "masking.final_density=0.2,0.6"])
    with pytest.raises(ValueError, match="not the ladder axis"):
        parse_ladder_cli(["masking=Pruning", "masking.density=0.1,0.5"])


def test_batched_fit_precision_schedule_matches_single():
    """Precision annealing through batched_fit == the single scheduled
    fit (CPU: precisions are numerically no-ops, so this pins the
    vmapped two-program chain wiring)."""
    grid = get_grid(16, 16)
    imgs = _imgs(3)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=8)
    tc = TrainConfig(num_steps=40, log_steps=20, segment_steps=30,
                     matmul_precision="tensorfloat32",
                     matmul_precision_early="bfloat16",
                     matmul_precision_switch=0.5)
    oc = OptimConfig(lr=1e-3)
    key = jax.random.PRNGKey(7)

    res = batched_fit(key, mdef, mcfg, grid, imgs, tc, oc)
    keys = jax.random.split(key, 3)
    single = fit(keys[1], mdef, mcfg, grid, imgs[1], tc, oc)
    np.testing.assert_allclose(
        np.asarray(res.params[0]["w"][1]),
        np.asarray(single.params[0]["w"]),
        rtol=2e-5, atol=1e-6,
    )
