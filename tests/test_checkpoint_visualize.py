"""Checkpoint round trip, run store, R-D curves, sweeper."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_image_tpu.data import get_grid, synthetic_image
from implicit_image_tpu.models import build_model
from implicit_image_tpu.sparsity import MaskingConfig
from implicit_image_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit


@pytest.mark.slow
def test_checkpoint_roundtrip_sparse(tmp_path):
    img = synthetic_image(16, 16, seed=0)
    grid = get_grid(16, 16)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)
    mk = MaskingConfig(density=0.5, end_when=30, interval=10)
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=40, log_steps=20), OptimConfig(lr=1e-3), mk,
    )
    path = tmp_path / "ckpt.npz"
    save_checkpoint(
        path, res.params, res.opt_state, res.mask_state,
        key=jax.random.PRNGKey(0), step=40,
    )
    ck = load_checkpoint(path)
    assert ck["step"] == 40
    for a, b in zip(ck["params"], res.params):
        for k in b:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    np.testing.assert_array_equal(
        np.asarray(ck["opt_state"].mu[1]["w"]), np.asarray(res.opt_state.mu[1]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(ck["mask_state"].masks[1]), np.asarray(res.mask_state.masks[1])
    )
    # resume capability: masks reconstructible from params via 'resume' init
    from implicit_image_tpu.sparsity import create_mask_state

    st = create_mask_state(
        jax.random.PRNGKey(0), ck["params"],
        MaskingConfig(sparse_init="resume", density=0.5),
    )
    np.testing.assert_array_equal(
        np.asarray(st.masks[1]),
        (np.asarray(ck["params"][1]["w"]) != 0).astype(np.float32),
    )


def test_run_store_and_rd_points(tmp_path):
    (tmp_path / "runA").mkdir()
    (tmp_path / "runA" / "summary.json").write_text(
        json.dumps({"PSNR": 30.0, "Quant PSNR": 28.5, "Compressed Bytes": 2048})
    )
    (tmp_path / "runB").mkdir()
    (tmp_path / "runB" / "summary.json").write_text(json.dumps({"PSNR": 33.0}))

    from implicit_image_tpu.visualize import collect_runs, ours_rate_distortion

    runs = collect_runs(tmp_path)
    assert len(runs) == 2
    pts = ours_rate_distortion(tmp_path)
    assert pts == [(2.0, 28.5)]


import pytest


@pytest.mark.parametrize("ext", ["jpg", "jp2", "webp"])
def test_traditional_rate_distortion_codecs(ext):
    from implicit_image_tpu.visualize import traditional_rate_distortion

    img = synthetic_image(64, 64, seed=0)
    try:
        pts = traditional_rate_distortion(img, ext)
    except Exception:
        pytest.skip(f"{ext} codec unavailable in this environment")
    assert len(pts) >= 10
    kb, psnr = zip(*pts)
    # higher quality -> larger file; last point beats first on PSNR
    assert kb[-1] > kb[0] and psnr[-1] > psnr[0]


def test_plot_rate_distortion_writes_pdf(tmp_path):
    from implicit_image_tpu.visualize import plot_rate_distortion

    img = synthetic_image(32, 32, seed=0)
    out = plot_rate_distortion(img, tmp_path, out_path=str(tmp_path / "rd.pdf"))
    assert (tmp_path / "rd.pdf").exists()


def test_sweep_space_parsing_and_sampling():
    import random

    from implicit_image_tpu.sweep import parse_space, sample

    fixed, space, params = parse_space(
        ["n_trials=3", "img=synthetic", "masking.density=uniform(0.1,0.9)",
         "optim=choice(adam,shampoo)".replace("optim=", "optim.name=")]
    )
    assert fixed == ["img=synthetic"]
    assert params["n_trials"] == 3
    rng = random.Random(0)
    s = sample(space, rng)
    d = float([x for x in s if "density" in x][0].split("=")[1])
    assert 0.1 <= d <= 0.9


def test_weight_removal_classifier_handles_dense_true_methods(tmp_path):
    """Small_Dense/Feathermap set dense:True in their config groups but are
    METHODS on the sparsity-comparison plot, not the dense baseline."""
    import json

    from implicit_image_tpu.visualize.weight_removal import gather

    def run(name, cfg_masking, psnr):
        d = tmp_path / name
        d.mkdir()
        (d / "summary.json").write_text(json.dumps({"PSNR": psnr}))
        (d / "config.json").write_text(json.dumps({"masking": cfg_masking}))

    run("dense", {"name": "none", "dense": True}, 50.0)
    run("sd", {"name": "Small_Dense", "dense": True, "density": 0.25}, 30.0)
    run("fm", {"name": "Feathermap", "dense": True, "density": 0.25}, 28.0)
    run("rigl", {"name": "RigL", "density": 0.25}, 40.0)

    table, dense_psnr = gather(tmp_path)
    assert dense_psnr == 50.0
    assert table["Small_Dense"] == [(0.25, 30.0)]
    assert table["Feathermap"] == [(0.25, 28.0)]
    assert table["RigL"] == [(0.25, 40.0)]


def test_tpe_beats_random_on_quadratic():
    """The TPE sampler (the Optuna-sweeper-class capability, reference
    conf/hydra/sweeper/optuna.yaml) concentrates near the optimum of a
    known objective with better sample efficiency than pure random."""
    import random

    from implicit_image_tpu.sweep import ask

    space = {"x": ("uniform", ["0", "1"]), "y": ("loguniform", ["0.01", "1"])}

    def objective(vals):
        # peak at x=0.7, y=0.1
        import math

        return -((float(vals["x"]) - 0.7) ** 2) - (
            (math.log10(float(vals["y"])) + 1.0) ** 2
        )

    def run(sampler, seed, n=30):
        rng = random.Random(seed)
        hist = []
        for _ in range(n):
            v = ask(space, hist, rng, sampler=sampler, n_startup=8)
            hist.append((v, objective(v)))
        return max(o for _, o in hist)

    seeds = range(6)
    tpe = sum(run("tpe", s) for s in seeds) / 6
    rnd = sum(run("random", s) for s in seeds) / 6
    assert tpe >= rnd  # model-based search must not lose on average


def test_tpe_choice_dimension_prefers_good_option():
    import random

    from implicit_image_tpu.sweep import ask

    space = {"opt": ("choice", ["good", "bad"])}
    rng = random.Random(0)
    hist = []
    for _ in range(20):
        v = ask(space, hist, rng, sampler="tpe", n_startup=6)
        hist.append((v, 1.0 if v["opt"] == "good" else 0.0))
    late = [v["opt"] for v, _ in hist[10:]]
    assert late.count("good") > late.count("bad")


def test_watch_histograms_written(tmp_path):
    """train.watch=true logs per-layer weight + grad-EMA histograms at
    segment boundaries (wandb.watch parity, reference compress.py:101)."""
    import json

    from implicit_image_tpu.compress import main
    from implicit_image_tpu.config import compose

    cfg = compose([
        "img=synthetic", "img.height=16", "img.width=16",
        "mlp.depth=3", "mlp.hidden_size=8",
        "train.num_steps=40", "train.log_steps=20",
        "train.segment_steps=20", "train.watch=true",
        "masking=none", "~quant", "entropy_coding=none",
    ])
    main(cfg, run_dir=str(tmp_path))
    lines = [json.loads(l) for l in (tmp_path / "histograms.jsonl").read_text().splitlines()]
    assert len(lines) == 2  # one per segment boundary (steps 20, 40)
    assert lines[0]["step"] == 20 and lines[1]["step"] == 40
    h = lines[0]["histograms"]
    assert "layers.0.w" in h and "layers.0.w.grad_ema" in h
    assert sum(h["layers.0.w"]["counts"]) == 8 * 2  # fan_in*width elements


def test_batched_decode_matches_single(tmp_path):
    """decode_runs (one vmapped render per architecture group) must be
    bit-equal to per-run decode_run."""
    import numpy as np

    from implicit_image_tpu.compress import main
    from implicit_image_tpu.config import compose
    from implicit_image_tpu.decompress import decode_run, decode_runs

    dirs = []
    for i, d in enumerate((0.4, 0.7)):
        cfg = compose([
            "img=synthetic", "img.height=20", "img.width=20",
            "mlp.depth=3", "mlp.hidden_size=16",
            "masking=RigL", f"masking.density={d}",
            "masking.end_when=20", "masking.interval=5",
            "train.num_steps=40", "train.log_steps=20",
            "quant.num_steps=5", "quant.bits=4", "entropy_coding=zstd",
        ])
        rd = str(tmp_path / f"run{i}")
        main(cfg, run_dir=rd)
        dirs.append(rd)

    imgs = decode_runs(dirs)
    for i, rd in enumerate(dirs):
        single, _ = decode_run(rd)
        np.testing.assert_array_equal(np.asarray(single), imgs[i])


def test_batched_decode_groups_mixed_architectures(tmp_path):
    """decode_runs groups by (model, config, size): mixed siren/coordx run
    dirs decode correctly in one call (two compiled render groups)."""
    import numpy as np

    from implicit_image_tpu.compress import main
    from implicit_image_tpu.config import compose
    from implicit_image_tpu.decompress import decode_run, decode_runs

    dirs = []
    for i, mlp in enumerate(("siren", "coordx")):
        cfg = compose([
            "img=synthetic", "img.height=16", "img.width=16",
            f"mlp={mlp}", "mlp.depth=6", "mlp.hidden_size=16",
            "masking=none", "train.num_steps=30", "train.log_steps=15",
            "quant.num_steps=4", "quant.bits=4", "entropy_coding=zstd",
        ])
        rd = str(tmp_path / f"run{i}")
        main(cfg, run_dir=rd)
        dirs.append(rd)

    imgs = decode_runs(dirs)
    for i, rd in enumerate(dirs):
        single, _ = decode_run(rd)
        np.testing.assert_array_equal(np.asarray(single), imgs[i])


def test_cmaes_beats_random_on_quadratic():
    """The CMA-ES sampler (the Ax-class second model-based sweeper,
    reference conf/hydra/sweeper/ax.yaml) concentrates near the optimum
    with better sample efficiency than pure random on the same quadratic
    the TPE test uses."""
    import random

    from implicit_image_tpu.sweep import run_sweep

    space = {"x": ("uniform", ["0", "1"]), "y": ("loguniform", ["0.01", "1"])}

    def objective(vals):
        import math

        return -((float(vals["x"]) - 0.7) ** 2) - (
            (math.log10(float(vals["y"])) + 1.0) ** 2
        )

    def run(sampler, seed, n=36):
        params = {"n_trials": n, "seed": seed, "lambda_kb": 0.0,
                  "sampler": sampler, "n_startup": 8, "gamma": 0.25,
                  "batch": 6}

        def evaluate(batch_values):
            return [(objective(v), 0) for v in batch_values]

        trials, best = run_sweep(evaluate, space, params)
        assert len(trials) == n
        return best[0]

    seeds = range(6)
    cma = sum(run("cmaes", s) for s in seeds) / 6
    rnd = sum(run("random", s) for s in seeds) / 6
    assert cma >= rnd, (cma, rnd)


def test_cmaes_mixed_space_any_dim_and_batch():
    """Regression: cmaes on a ONE-continuous-dim space with a categorical
    and batch=1 (default popsize) must neither crash on the '__cont__'
    entry nor emit NaN proposals, and categorical draws must tilt toward
    values seen in selected proposals."""
    import math

    from implicit_image_tpu.sweep import run_sweep

    space = {"masking.density": ("loguniform", ["0.05", "0.95"]),
             "quant": ("choice", ["kmeans", "qat"])}

    def evaluate(batch_values):
        out = []
        for v in batch_values:
            d = float(v["masking.density"])
            # category dominates the objective so the good-set tilt is
            # observable; density adds a small smooth term
            bonus = 10.0 if v["quant"] == "kmeans" else 0.0
            out.append((bonus - (d - 0.3) ** 2, 10000))
        return out

    for batch in (1, 3):
        params = {"n_trials": 24, "seed": 0, "lambda_kb": 0.0,
                  "sampler": "cmaes", "n_startup": 5, "gamma": 0.25,
                  "batch": batch}
        trials, best = run_sweep(evaluate, space, params)
        assert len(trials) == 24
        for t in trials:
            assert not math.isnan(float(t["values"]["masking.density"]))
    # the rewarded category must dominate the later proposals
    late = trials[len(trials) // 2:]
    km = sum(t["values"]["quant"] == "kmeans" for t in late)
    assert km >= len(late) // 2, km
    assert best[1]["quant"] == "kmeans"


def test_bench_always_prints_json_line(monkeypatch, capsys, tmp_path):
    """Regression: the driver depends on bench.py's single JSON line; a
    protocol exception must soft-fail into the strict-fit fallback, never
    abort before the line is printed."""
    import json as _json
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    _sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "benchmarks"))
    import bench
    import time_to_quality

    def boom(*a, **k):
        raise RuntimeError("protocol exploded")

    monkeypatch.setattr(time_to_quality, "full_protocol", boom)
    # the in-run batched arm (r5) must soft-fail the same way — and on
    # CPU a real B=64 x 2000-step batched_fit would run for hours
    from implicit_image_tpu.parallel import batched as batched_mod

    monkeypatch.setattr(batched_mod, "batched_fit", boom)
    # tiny shapes + tiny last-resort fit so the fallback is fast on CPU
    import importlib

    from implicit_image_tpu import data as data_mod

    # (attribute `fit` on the package shadows the submodule name)
    fit_mod = importlib.import_module("implicit_image_tpu.training.fit")

    real_img, real_grid = data_mod.synthetic_image, data_mod.get_grid
    monkeypatch.setattr(data_mod, "synthetic_image",
                        lambda h, w, **k: real_img(32, 32, **k))
    monkeypatch.setattr(data_mod, "get_grid",
                        lambda h, w: real_grid(32, 32))
    real_fit = fit_mod.fit

    def tiny_fit(key, mdef, mcfg, grid, img, tcfg, ocfg, *a, **k):
        tcfg = type(tcfg)(num_steps=5, log_steps=5)
        return real_fit(key, mdef, mcfg, grid, img, tcfg, ocfg, *a, **k)

    monkeypatch.setattr(fit_mod, "fit", tiny_fit)
    monkeypatch.chdir(tmp_path)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    rec = _json.loads(out[-1])
    assert rec["metric"] == "fit_512px_siren_d8w128_2000steps_wall"
    assert rec["flagship_meets_bar"] is False
    assert rec["value"] > 0


def test_batched_ask_tell_driver_counts_and_batches():
    """run_sweep asks B points per round, evaluates each round in ONE
    evaluator call, and stops exactly at n_trials (trimming the last
    batch)."""
    import random

    from implicit_image_tpu.sweep import run_sweep

    space = {"masking.density": ("loguniform", ["0.05", "0.95"])}
    calls = []

    def evaluate(batch_values):
        calls.append(len(batch_values))
        return [(float(v["masking.density"]) * 10, 100) for v in batch_values]

    params = {"n_trials": 7, "seed": 0, "lambda_kb": 0.0, "sampler": "tpe",
              "n_startup": 3, "gamma": 0.25, "batch": 3}
    trials, best = run_sweep(evaluate, space, params)
    assert len(trials) == 7
    assert calls == [3, 3, 1]
    # constant-liar diversification: the 3 points of a round differ
    assert len({t["values"]["masking.density"] for t in trials[:3]}) == 3


@pytest.mark.slow
def test_batched_density_sweep_runs_as_ladder(tmp_path, monkeypatch):
    """End-to-end: a masking.density-only sweep with batch>1 evaluates
    each round as ONE vmapped ladder program and reports real
    (PSNR, bytes) per trial."""
    import json as _json

    from implicit_image_tpu.sweep import cli

    monkeypatch.chdir(tmp_path)
    cli([
        "n_trials=4", "batch=2", "sampler=random", "seed=0",
        "masking.density='loguniform(0.2,0.8)'",
        "img=synthetic", "img.height=16", "img.width=16",
        "mlp.depth=3", "mlp.hidden_size=8",
        "train.num_steps=30", "train.log_steps=30",
        "quant=none", "entropy_coding=zstd",
        "logging.use=false", "output_dir=sweep_out",
    ])
    res = _json.loads((tmp_path / "outputs/sweep_results.json").read_text())
    assert len(res["trials"]) == 4
    for t in res["trials"]:
        assert np.isfinite(t["psnr"]) and t["bytes"] > 0
    # round dirs exist (one ladder per round of 2)
    assert (tmp_path / "sweep_out/round_0").exists()
    assert (tmp_path / "sweep_out/round_1").exists()


# ---- Bjøntegaard delta (visualize/bd_rate.py) ----

_BD_ANCHOR = [(23713, 41.31), (36457, 47.60), (53717, 50.64), (84549, 55.58)]


def test_bd_rate_exact_uniform_rate_shift():
    # test = anchor at 20% fewer bytes, identical PSNR. Polynomial fits
    # are linear in the data, so the fitted log-rate curves differ by
    # exactly log10(0.8) and BD-rate is exactly -20%.
    from implicit_image_tpu.visualize.bd_rate import bd_psnr, bd_rate

    test = [(r * 0.8, p) for r, p in _BD_ANCHOR]
    assert abs(bd_rate(_BD_ANCHOR, test) - (-20.0)) < 1e-9
    # fewer bytes at equal quality == more quality at equal bytes
    assert bd_psnr(_BD_ANCHOR, test) > 0


def test_bd_psnr_exact_uniform_quality_shift():
    from implicit_image_tpu.visualize.bd_rate import bd_psnr, bd_rate

    test = [(r, p + 1.0) for r, p in _BD_ANCHOR]
    assert abs(bd_psnr(_BD_ANCHOR, test) - 1.0) < 1e-9
    assert bd_rate(_BD_ANCHOR, test) < 0


def test_bd_identity_and_symmetry():
    from implicit_image_tpu.visualize.bd_rate import bd_psnr, bd_rate

    assert abs(bd_rate(_BD_ANCHOR, _BD_ANCHOR)) < 1e-9
    assert abs(bd_psnr(_BD_ANCHOR, _BD_ANCHOR)) < 1e-9
    test = [(r * 0.9, p + 0.5) for r, p in _BD_ANCHOR]
    # swapping anchor/test flips the sign of BD-PSNR exactly
    assert abs(bd_psnr(_BD_ANCHOR, test) + bd_psnr(test, _BD_ANCHOR)) < 1e-9


def test_bd_input_validation():
    from implicit_image_tpu.visualize.bd_rate import bd_psnr, bd_rate

    with pytest.raises(ValueError, match=">=2"):
        bd_psnr(_BD_ANCHOR, [(10_000, 40.0)])
    # duplicate rates (same config re-run) merge, they don't error;
    # a single distinct rate is still too few
    with pytest.raises(ValueError, match=">=2"):
        bd_psnr(_BD_ANCHOR, [(10_000, 40.0), (10_000, 41.0)])
    with pytest.raises(ValueError, match="positive"):
        bd_psnr(_BD_ANCHOR, [(0.0, 40.0), (10_000, 41.0)])
    # disjoint quality ranges: BD-rate integrates over PSNR, undefined
    with pytest.raises(ValueError, match="overlap"):
        bd_rate(_BD_ANCHOR, [(1_000, 10.0), (2_000, 20.0)])


def test_bd_tolerates_run_store_noise():
    """Seed noise (a locally non-monotone PSNR rung) and duplicate byte
    counts are ordinary run-store data — the Bjøntegaard fit must compute,
    not refuse."""
    from implicit_image_tpu.visualize.bd_rate import bd_psnr, bd_rate

    noisy = [
        (23_800, 41.25), (23_800, 41.35),      # same config re-run
        (36_457, 47.70), (53_717, 47.55),      # non-monotone rung
        (84_549, 55.58),
    ]
    r = bd_rate(_BD_ANCHOR, noisy)
    p = bd_psnr(_BD_ANCHOR, noisy)
    assert np.isfinite(r) and np.isfinite(p)
    # the noisy curve tracks the anchor: both deltas stay small
    assert abs(p) < 2.0


def test_bd_cli_reads_run_store(tmp_path, capsys):
    from implicit_image_tpu.visualize.bd_rate import main

    for arm, scale in (("anchor", 1.0), ("test", 0.8)):
        for i, (r, p) in enumerate(_BD_ANCHOR):
            d = tmp_path / arm / f"d{i}"
            d.mkdir(parents=True)
            (d / "summary.json").write_text(json.dumps(
                {"Decoded PSNR": p, "Compressed Bytes": int(r * scale)}
            ))
    main([str(tmp_path / "anchor"), str(tmp_path / "test")])
    out = json.loads(capsys.readouterr().out)
    assert out["anchor_points"] == 4 and out["test_points"] == 4
    assert abs(out["bd_rate_pct"] - (-20.0)) < 0.01
    assert out["bd_psnr_db"] > 0


def test_sweep_store_kill_resume(tmp_path):
    """Sweep persistence (reference conf/hydra/sweeper/optuna.yaml keeps
    its Optuna study in sqlite and resumes): a sweep killed mid-run must
    resume from <dir>/sweep.jsonl without re-evaluating completed trials,
    and the resumed run must finish with trials identical to an
    uninterrupted run (the replay feeds recorded objectives back into the
    deterministic ask sequence, so TPE *and* CMA-ES internal state
    rebuild exactly)."""
    from implicit_image_tpu.sweep import SweepStore, run_sweep

    space = {"x": ("uniform", ["0", "1"])}

    def objective(vals):
        return -((float(vals["x"]) - 0.3) ** 2)

    for sampler in ("tpe", "cmaes"):
        params = {"n_trials": 8, "seed": 3, "lambda_kb": 0.0,
                  "sampler": sampler, "n_startup": 3, "gamma": 0.25,
                  "batch": 1}
        store_path = tmp_path / sampler / "sweep.jsonl"

        calls = {"n": 0}

        def evaluate(batch_values):
            calls["n"] += len(batch_values)
            return [(objective(v), 0) for v in batch_values]

        # uninterrupted run (no store) = the ground truth
        truth, truth_best = run_sweep(evaluate, space, dict(params))
        assert calls["n"] == 8

        # killed run: the evaluator dies at the 2nd evaluation round
        # (cmaes rounds are population-sized, tpe rounds are single
        # trials — killing on a round boundary covers both)
        calls["n"] = 0
        rounds = {"n": 0}

        def dying(batch_values):
            rounds["n"] += 1
            if rounds["n"] > 1:
                raise RuntimeError("killed")
            return evaluate(batch_values)

        store = SweepStore(store_path, space, params)
        try:
            run_sweep(dying, space, dict(params), store=store)
        except RuntimeError:
            pass
        survived = calls["n"]
        assert 0 < survived < 8
        assert len(store.load()) == survived

        # resume: the recorded trials replay with ZERO evaluator calls,
        # the rest evaluate live; the final record matches the truth run
        calls["n"] = 0
        store2 = SweepStore(store_path, space, params)
        trials, best = run_sweep(evaluate, space, dict(params), store=store2)
        assert calls["n"] == 8 - survived, (
            f"{sampler}: re-evaluated replayable trials")
        assert trials == truth, sampler
        assert best == truth_best, sampler
        assert len(store2.load()) == 8

        # a changed seed invalidates the record (proposals would diverge)
        other = SweepStore(store_path, space, {**params, "seed": 4})
        assert other.load() == []
