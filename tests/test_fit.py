"""End-to-end fit tests (CPU, tiny shapes)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from implicit_image_tpu.data import get_grid, synthetic_image
from implicit_image_tpu.models import build_model
from implicit_image_tpu.sparsity import MaskingConfig, total_density
from implicit_image_tpu.training import OptimConfig, TrainConfig, fit


@pytest.fixture(scope="module")
def small_problem():
    grid = get_grid(32, 32)
    img = jnp.asarray(synthetic_image(32, 32, seed=1, complexity=3))
    mdef, mcfg = build_model(
        "siren", depth=4, hidden_size=32, first_omega_0=30.0, hidden_omega_0=30.0
    )
    return grid, img, mdef, mcfg


def test_dense_fit_converges(small_problem):
    grid, img, mdef, mcfg = small_problem
    res = fit(
        jax.random.PRNGKey(0),
        mdef,
        mcfg,
        grid,
        img,
        TrainConfig(num_steps=300, log_steps=100),
        OptimConfig(lr=1e-3),
    )
    losses = np.asarray(res.metrics["loss"])
    assert losses[-1] < losses[0] * 0.1
    psnrs = np.asarray(res.metrics["psnr"])
    logged = psnrs[~np.isnan(psnrs)]
    assert len(logged) == 3  # every 100 steps
    assert logged[-1] > 22.0


def test_dense_fit_deterministic(small_problem):
    grid, img, mdef, mcfg = small_problem
    tc = TrainConfig(num_steps=50, log_steps=50)
    oc = OptimConfig(lr=1e-3)
    r1 = fit(jax.random.PRNGKey(3), mdef, mcfg, grid, img, tc, oc)
    r2 = fit(jax.random.PRNGKey(3), mdef, mcfg, grid, img, tc, oc)
    np.testing.assert_array_equal(
        np.asarray(r1.params[0]["w"]), np.asarray(r2.params[0]["w"])
    )


def test_rigl_sparse_fit(small_problem):
    grid, img, mdef, mcfg = small_problem
    mask_cfg = MaskingConfig(density=0.5, end_when=150, interval=20)
    res = fit(
        jax.random.PRNGKey(1),
        mdef,
        mcfg,
        grid,
        img,
        TrainConfig(num_steps=200, log_steps=100),
        OptimConfig(lr=1e-3),
        mask_cfg,
    )
    d = float(total_density(res.mask_state))
    assert abs(d - 0.5) < 0.05
    # masked weights are exactly zero
    for layer, m in zip(res.params, res.mask_state.masks):
        if m is not None:
            assert float(jnp.sum(jnp.abs(layer["w"] * (1 - m)))) == 0.0
    psnrs = np.asarray(res.metrics["psnr"])
    assert psnrs[~np.isnan(psnrs)][-1] > 15.0


def test_gmp_pruning_fit(small_problem):
    grid, img, mdef, mcfg = small_problem
    mask_cfg = MaskingConfig(
        name="Pruning",
        density=1.0,
        sparse_init="random",
        prune_mode="global-magnitude",
        growth_mode="none",
        redistribution_mode="none",
        decay_schedule="magnitude-prune",
        final_density=0.5,
        start_when=5,
        end_when=150,
        interval=10,
    )
    res = fit(
        jax.random.PRNGKey(2),
        mdef,
        mcfg,
        grid,
        img,
        TrainConfig(num_steps=200, log_steps=200),
        OptimConfig(lr=1e-3),
        mask_cfg,
    )
    densities = np.asarray(res.metrics["density"])
    final_d = float(total_density(res.mask_state))
    # GMP reaches the target sparsity on the masked subset by end_when
    assert final_d == pytest.approx(0.5, abs=0.05)
    # density decreased monotonically (within update granularity)
    assert densities[0] >= densities[-1]


def test_fourier_fit(small_problem):
    grid, img, _, _ = small_problem
    mdef, mcfg = build_model("fourier", depth=4, hidden_size=32, map_size=64, map_scale=4.0)
    res = fit(
        jax.random.PRNGKey(4),
        mdef,
        mcfg,
        grid,
        img,
        TrainConfig(num_steps=200, log_steps=200),
        OptimConfig(lr=2e-3),
    )
    losses = np.asarray(res.metrics["loss"])
    assert losses[-1] < losses[0] * 0.5


def test_pixel_chunks_matches_full_batch(small_problem):
    """Gradient accumulation over pixel chunks is numerically equivalent to
    the full-grid gradient (MSE over equal chunks averages exactly)."""
    grid, img, mdef, mcfg = small_problem
    kwargs = dict(num_steps=20, log_steps=10)
    r1 = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
             TrainConfig(**kwargs), OptimConfig())
    r2 = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
             TrainConfig(**kwargs, pixel_chunks=4), OptimConfig())
    for a, b in zip(jax.tree_util.tree_leaves(r1.params),
                    jax.tree_util.tree_leaves(r2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pixel_chunks_separable_rows_match_full_batch():
    """Row-aligned chunking keeps CoordX's factorized branch path and is
    numerically equivalent to the full-grid separable gradient."""
    from implicit_image_tpu.data import get_grid, synthetic_image

    grid = get_grid(32, 32)
    img = jnp.asarray(synthetic_image(32, 32, seed=1, complexity=3))
    mdef, mcfg = build_model("coordx", depth=6, hidden_size=24, split_depth=3)
    kwargs = dict(num_steps=20, log_steps=10)
    r1 = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
             TrainConfig(**kwargs), OptimConfig())
    # 4 chunks: 32 rows % 4 == 0 -> separable row chunking
    r2 = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
             TrainConfig(**kwargs, pixel_chunks=4), OptimConfig())
    for a, b in zip(jax.tree_util.tree_leaves(r1.params),
                    jax.tree_util.tree_leaves(r2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    p1 = np.asarray(r1.metrics["psnr"]); p1 = p1[np.isfinite(p1)]
    p2 = np.asarray(r2.metrics["psnr"]); p2 = p2[np.isfinite(p2)]
    np.testing.assert_allclose(p1, p2, atol=0.05)


def test_pixel_chunks_must_divide():
    from implicit_image_tpu.data import get_grid, synthetic_image

    grid = get_grid(10, 10)
    img = synthetic_image(10, 10, seed=0)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=8)
    with pytest.raises(ValueError, match="pixel_chunks"):
        fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
            TrainConfig(num_steps=2, log_steps=1, pixel_chunks=3), OptimConfig())


@pytest.mark.slow
def test_segmented_fit_matches_monolithic(small_problem):
    """Chained segment executions (the per-execution wall-time workaround,
    TrainConfig.segment_steps) are mathematically identical to one scan:
    params bit-equal, metrics equal up to compile-level reduction order."""
    grid, img, mdef, mcfg = small_problem
    mk = MaskingConfig(density=0.5, end_when=90, interval=10)
    r1 = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
             TrainConfig(num_steps=100, log_steps=25, segment_steps=1000),
             OptimConfig(lr=1e-3), mk)
    r2 = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
             TrainConfig(num_steps=100, log_steps=25, segment_steps=30),
             OptimConfig(lr=1e-3), mk)
    for a, b in zip(jax.tree_util.tree_leaves(r1.params),
                    jax.tree_util.tree_leaves(r2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in r1.metrics:
        np.testing.assert_allclose(
            np.asarray(r1.metrics[k]), np.asarray(r2.metrics[k]),
            rtol=1e-6, atol=1e-7, err_msg=k,
        )


@pytest.mark.slow
def test_checkpoint_resume_bit_exact(tmp_path, small_problem):
    """Kill-and-resume at a segment boundary reproduces the uninterrupted
    fit bit-exactly (the carry IS the training state; the PRNG key is
    checkpointed with it)."""
    grid, img, mdef, mcfg = small_problem
    ck = tmp_path / "ckpt.npz"
    mk = MaskingConfig(density=0.5, end_when=90, interval=10)

    # uninterrupted
    full = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
               TrainConfig(num_steps=100, log_steps=25, segment_steps=40),
               OptimConfig(lr=1e-3), mk)
    # first 40 steps with checkpointing...
    fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=40, log_steps=25, segment_steps=40),
        OptimConfig(lr=1e-3), mk, checkpoint_path=ck)
    # ...then resume to 100
    resumed = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
                  TrainConfig(num_steps=100, log_steps=25, segment_steps=40),
                  OptimConfig(lr=1e-3), mk, resume_from=ck)
    for a, b in zip(jax.tree_util.tree_leaves(full.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed metrics cover steps [40, 100)
    assert np.asarray(resumed.metrics["loss"]).shape == (60,)


@pytest.mark.slow
def test_checkpoint_resume_ekfac_bit_exact(tmp_path, small_problem):
    """EKFAC fits checkpoint/resume bit-exactly: the KFE state (eigvecs +
    second moments) rides the checkpoint format alongside adam moments."""
    grid, img, mdef, mcfg = small_problem
    ck = tmp_path / "ckpt.npz"
    ocfg = OptimConfig(lr=1e-3, preconditioner="ekfac", precond_interval=10)

    full = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
               TrainConfig(num_steps=100, log_steps=25, segment_steps=40),
               ocfg)
    fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=40, log_steps=25, segment_steps=40),
        ocfg, checkpoint_path=ck)
    resumed = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
                  TrainConfig(num_steps=100, log_steps=25, segment_steps=40),
                  ocfg, resume_from=ck)
    for a, b in zip(jax.tree_util.tree_leaves(full.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a plain-adam checkpoint cannot seed an ekfac resume
    ck2 = tmp_path / "plain.npz"
    fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=40, log_steps=25, segment_steps=40),
        OptimConfig(lr=1e-3), checkpoint_path=ck2)
    with pytest.raises(ValueError, match="EKFAC state"):
        fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
            TrainConfig(num_steps=100, log_steps=25, segment_steps=40),
            ocfg, resume_from=ck2)


def test_checkpoint_resume_rejects_unsupported_optim(small_problem, tmp_path):
    grid, img, mdef, mcfg = small_problem
    with pytest.raises(ValueError, match="adam"):
        fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
            TrainConfig(num_steps=10, log_steps=5),
            OptimConfig(name="shampoo"), checkpoint_path=tmp_path / "c.npz")


def test_resume_past_end_raises(tmp_path, small_problem):
    grid, img, mdef, mcfg = small_problem
    ck = tmp_path / "c.npz"
    fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=20, log_steps=10, segment_steps=20),
        OptimConfig(lr=1e-3), checkpoint_path=ck)
    with pytest.raises(ValueError, match="nothing to resume"):
        fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
            TrainConfig(num_steps=20, log_steps=10, segment_steps=20),
            OptimConfig(lr=1e-3), resume_from=ck)


def test_bench_full_protocol_harness_cpu(tmp_path):
    """The bench.py/time_to_quality harness (full_protocol: fit -> quant
    -> code -> decode with precompiled render) runs on CPU at tiny shapes
    — guards the lead-metric path against API drift."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))
    from time_to_quality import full_protocol

    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.fit import OptimConfig

    grid = get_grid(16, 16)
    img = synthetic_image(16, 16, seed=0)
    mdef, mcfg = build_model("coordx", depth=5, hidden_size=16, split_depth=2)
    r = full_protocol(
        "cpu_smoke", mdef, mcfg, grid, img, 30, OptimConfig(lr=1e-3),
        str(tmp_path / "proto"), stream="huffman",
    )
    assert r["bytes"] > 0
    assert np.isfinite(r["decoded_psnr"])
    assert abs(r["decoded_psnr"] - r["quant_psnr"]) < 1.0
    for k in ("fit_wall_s", "quant_wall_s", "code_wall_s", "decode_wall_s"):
        assert r[k] >= 0


def test_fit_reports_xla_cost_model_flops():
    """FitResult.flops (bench auditability, VERDICT r3 item 8): totals
    XLA's cost model per executed step — proportional to num_steps, equal
    between the one-scan and segmented drivers, and present for sparse
    fits (the cost analysis runs on the LOCAL cpu backend; the tunneled
    device path stalls minutes on sparse programs — fit.py
    estimate_step_flops docstring)."""
    from implicit_image_tpu.sparsity import MaskingConfig

    img = synthetic_image(32, 32, seed=0)
    grid = get_grid(32, 32)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)

    r10 = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
              TrainConfig(num_steps=10, log_steps=5), OptimConfig())
    r20 = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
              TrainConfig(num_steps=20, log_steps=5), OptimConfig())
    assert r10.flops and r20.flops
    assert abs(r20.flops / r10.flops - 2.0) < 0.01

    rseg = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
               TrainConfig(num_steps=20, log_steps=5, segment_steps=7),
               OptimConfig())
    assert rseg.flops == r20.flops

    rsp = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
              TrainConfig(num_steps=10, log_steps=5), OptimConfig(),
              MaskingConfig(density=0.5))
    assert rsp.flops and rsp.flops >= r10.flops  # mask updates add work


def test_matmul_precision_config_plumbs():
    """train.matmul_precision reaches the fit loss, the in-scan eval and
    the quant phase without changing CPU numerics (the knob only alters
    TPU MXU pass counts — measured +6.3 dB of converged protocol quality
    at tensorfloat32, BASELINE.md 'Matmul pass precision')."""
    img = synthetic_image(24, 24, seed=0)
    grid = get_grid(24, 24)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)

    r_def = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
                TrainConfig(num_steps=8, log_steps=4), OptimConfig())
    r_tf = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
               TrainConfig(num_steps=8, log_steps=4,
                           matmul_precision="tensorfloat32"),
               OptimConfig())
    # on CPU every precision lowers to the same f32 math — bit equality
    # proves the wrap changes nothing but the dot_general attribute
    for la, lb in zip(r_def.params, r_tf.params):
        for k in la:
            np.testing.assert_array_equal(np.asarray(la[k]),
                                          np.asarray(lb[k]))

    # end-to-end through the CLI (fit + quant + coding + decode)
    from implicit_image_tpu.compress import main as compress_main
    from implicit_image_tpu.config import compose
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        psnr, nbytes = compress_main(compose([
            "img=synthetic", "img.height=24", "img.width=24",
            "mlp.depth=3", "mlp.hidden_size=16", "train.num_steps=5",
            "train.log_steps=5", "masking=none", "quant=kmeans",
            "quant.num_steps=3", "quant.log_steps=3",
            "entropy_coding=zstd",
            "train.matmul_precision=tensorfloat32",
            f"output_dir={td}/run",
        ]))
        assert np.isfinite(psnr) and nbytes > 0


def test_matmul_precision_reaches_chunked_loss():
    """pixel_chunks > 1 must carry train.matmul_precision into the
    per-chunk loss: the r5 precision ladder caught the chunked grad_fn
    rebuilding make_loss_fn WITHOUT it, silently running 1-pass bf16
    (−6 dB converged) on every chunked 'tf32' fit. Structural pin: the
    traced train step's dot_generals carry Precision.HIGH (=
    tensorfloat32) exactly when the config asks for it."""
    from implicit_image_tpu.training.fit import make_train_step

    img = synthetic_image(16, 16, seed=0)
    grid = get_grid(16, 16)
    coords = grid.reshape(-1, 2)
    target = np.asarray(img).reshape(-1, 3)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    from implicit_image_tpu.optim import opt_init
    from implicit_image_tpu.training.fit import _dummy_mask_state

    for chunks in (1, 4):
        for prec, expect in ((None, False), ("tensorfloat32", True)):
            step = make_train_step(
                mdef, mcfg, jnp.asarray(coords), jnp.asarray(target),
                TrainConfig(num_steps=4, log_steps=2, pixel_chunks=chunks,
                            matmul_precision=prec),
                OptimConfig(), grid_hw=(16, 16),
            )
            carry = (params, opt_init(params, OptimConfig()),
                     _dummy_mask_state(params), jax.random.PRNGKey(1), ())
            jaxpr = str(jax.make_jaxpr(step)(carry, jnp.int32(0)))
            assert ("Precision.HIGH" in jaxpr) == expect, (chunks, prec)


def test_precision_schedule_bit_exact_on_cpu():
    """Precision annealing (train.matmul_precision_early): on CPU every
    pass precision lowers to the same f32 math, so a scheduled fit must
    be BIT-EXACT to the plain fit with the same key — this pins the
    two-program chain wiring (boundary-aligned switch, global step
    indices, metrics concat) independent of numerics."""
    img = synthetic_image(24, 24, seed=0)
    grid = get_grid(24, 24)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)

    base = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
               TrainConfig(num_steps=12, log_steps=4, segment_steps=4),
               OptimConfig())
    sched = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
                TrainConfig(num_steps=12, log_steps=4, segment_steps=4,
                            matmul_precision="tensorfloat32",
                            matmul_precision_early="bfloat16",
                            matmul_precision_switch=0.5),
                OptimConfig())
    for la, lb in zip(base.params, sched.params):
        for k in la:
            np.testing.assert_array_equal(np.asarray(la[k]),
                                          np.asarray(lb[k]))
    np.testing.assert_array_equal(
        np.asarray(base.metrics["loss"]), np.asarray(sched.metrics["loss"]))


def test_precision_schedule_plan():
    """plan_precision_schedule: boundary-aligned switch, correct phase
    length sets, no-op collapse at switch 0."""
    from implicit_image_tpu.training.fit import plan_precision_schedule

    cfg = TrainConfig(num_steps=2000, log_steps=100,
                      matmul_precision="tensorfloat32",
                      matmul_precision_early="bfloat16",
                      matmul_precision_switch=0.75)
    ep, sw, main, early = plan_precision_schedule(cfg, 2000, 500)
    assert ep == "bfloat16" and sw == 1500
    assert early == {500} and main == {500}

    # exact-step switch, NOT segment-aligned: 1300 steps, seg 500 ->
    # switch at 975 (early 500+475, main 325)
    ep, sw, main, early = plan_precision_schedule(cfg, 1300, 500)
    assert sw == 975 and early == {500, 475} and main == {325}

    # switch inside a single-segment budget (the b1200 flagship case)
    ep, sw, main, early = plan_precision_schedule(cfg, 1200, 2000)
    assert sw == 900 and early == {900} and main == {300}

    # fraction that rounds to zero collapses the schedule
    cfg0 = TrainConfig(num_steps=100, log_steps=10,
                       matmul_precision_early="bfloat16",
                       matmul_precision_switch=0.001)
    ep, sw, main, early = plan_precision_schedule(cfg0, 100, 100)
    assert ep is None and sw == 0 and early == set() and main == {100}

    # no schedule configured
    ep, sw, main, early = plan_precision_schedule(
        TrainConfig(num_steps=10, log_steps=5), 10, 100)
    assert ep is None and main == {10}


def test_precision_schedule_jaxpr_switches_programs():
    """The early and late segment programs really differ in dot
    precision (Precision.HIGH appears only in the late program when the
    schedule is bf16 -> tensorfloat32)."""
    from implicit_image_tpu.training.fit import make_fit_segments
    import dataclasses as dc
    import functools

    img = synthetic_image(16, 16, seed=0)
    grid = get_grid(16, 16)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)
    tcfg = TrainConfig(num_steps=8, log_steps=4, segment_steps=4,
                       matmul_precision="tensorfloat32")
    init_fn, seg_late = make_fit_segments(mdef, mcfg, grid, tcfg,
                                          OptimConfig())
    _, seg_early = make_fit_segments(
        mdef, mcfg, grid, dc.replace(tcfg, matmul_precision="bfloat16"),
        OptimConfig())
    carry = init_fn(jax.random.PRNGKey(0), jnp.asarray(img))
    late_j = str(jax.make_jaxpr(
        functools.partial(seg_late, length=4))(carry, jnp.asarray(img), 0))
    early_j = str(jax.make_jaxpr(
        functools.partial(seg_early, length=4))(carry, jnp.asarray(img), 0))
    assert "Precision.HIGH" in late_j
    assert "Precision.HIGH" not in early_j
