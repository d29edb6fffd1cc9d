"""Config composer + CLI orchestrator tests."""
import numpy as np
import pytest

from implicit_image_tpu.config import compose, expand_multirun


def test_compose_defaults():
    cfg = compose([])
    assert cfg.mlp.name == "siren"
    assert cfg.img.name == "flower_foveon"
    assert cfg.masking.name == "RigL"
    assert cfg.quant.name == "KMeans"
    assert cfg.entropy_coding.stream_name == "plain"
    assert cfg.train.num_steps == 2000


def test_group_override_and_value_override():
    cfg = compose(["masking=Pruning", "mlp.hidden_size=256", "optim=shampoo"])
    assert cfg.masking.name == "Pruning"
    assert cfg.masking.prune_mode == "global-magnitude"
    assert cfg.mlp.hidden_size == 256
    assert cfg.optim.name == "shampoo"


def test_interpolation():
    cfg = compose([])
    assert cfg.exp_name == "siren_flower_foveon"
    assert cfg.train.batch_height == 512
    # chained: img.path references ${img.bits} and ${img.name}
    assert "rgb16bit" in cfg.img.path and "flower_foveon" in cfg.img.path


def test_interpolation_tracks_overrides():
    cfg = compose(["img=synthetic", "img.height=64"])
    assert cfg.train.batch_height == 64
    assert cfg.exp_name == "siren_synthetic"


def test_group_deletion():
    cfg = compose(["~quant"])
    assert "quant" not in cfg


def test_unknown_group_option_lists_available():
    with pytest.raises(KeyError) as e:
        compose(["masking=DoesNotExist"])
    assert "RigL" in str(e.value)


def test_expand_multirun_cartesian():
    jobs = expand_multirun(["a=1,2", "b=x", "c=7,8,9"])
    assert len(jobs) == 6
    assert ["a=1", "b=x", "c=7"] in jobs
    assert ["a=2", "b=x", "c=9"] in jobs


def test_cli_end_to_end(tmp_path):
    """Tiny full-pipeline run through the orchestrator (CPU)."""
    from implicit_image_tpu.compress import main

    cfg = compose(
        [
            "img=synthetic",
            "img.height=24",
            "img.width=24",
            "mlp.depth=4",
            "mlp.hidden_size=16",
            "train.num_steps=100",
            "train.log_steps=50",
            "train.use_pallas=False",
            "train.mixed_precision=False",
            "masking=RigL",
            "masking.end_when=80",
            "masking.interval=20",
            "quant.num_steps=10",
            "quant.bits=5",
            "entropy_coding=zstd",
        ]
    )
    psnr, nbytes = main(cfg, run_dir=str(tmp_path))
    assert np.isfinite(psnr) and psnr > 10.0
    assert nbytes > 0
    assert (tmp_path / "metrics.jsonl").exists()
    assert (tmp_path / "summary.json").exists()
    assert (tmp_path / "model_quantized" / "compressed_weights.data").exists()
    # decode round trip from the run artifacts
    from implicit_image_tpu.coding import decompress_state_dict

    state = decompress_state_dict(tmp_path / "model_quantized", "zstd")
    assert any("weight" in k for k in state)

    # the run dir is self-contained: the decode CLI rebuilds the model
    # from config.json, renders, and writes the image
    assert (tmp_path / "config.json").exists()
    from implicit_image_tpu.decompress import decode_run

    img, stats = decode_run(tmp_path)
    assert img.shape == (24, 24, 3)
    assert (tmp_path / "decoded.png").exists()
    assert stats["mpix_per_s"] > 0


def test_cli_dense_no_quant_no_coding(tmp_path):
    from implicit_image_tpu.compress import main

    cfg = compose(
        [
            "img=synthetic",
            "img.height=16",
            "img.width=16",
            "mlp.depth=3",
            "mlp.hidden_size=8",
            "train.num_steps=20",
            "train.log_steps=10",
            "train.use_pallas=False",
            "train.mixed_precision=False",
            "masking=none",
            "quant=none",
            "entropy_coding=none",
        ]
    )
    psnr, nbytes = main(cfg, run_dir=str(tmp_path))
    assert np.isfinite(psnr)
    assert nbytes == 0


def test_cli_multiplier_semantics(tmp_path):
    """train.multiplier scales num_steps, end_when, interval (compress.py:110-120)."""
    from implicit_image_tpu.compress import main

    cfg = compose(
        [
            "img=synthetic",
            "img.height=16",
            "img.width=16",
            "mlp.depth=3",
            "mlp.hidden_size=8",
            "train.num_steps=20",
            "train.log_steps=20",
            "train.multiplier=2",
            "train.use_pallas=False",
            "train.mixed_precision=False",
            "masking=RigL",
            "masking.end_when=10",
            "masking.interval=5",
            "quant=none",
            "entropy_coding=none",
        ]
    )
    psnr, _ = main(cfg, run_dir=str(tmp_path))
    import json

    lines = [
        json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    # logged at step 20 and 40 -> 40 total steps means multiplier applied
    assert {l["step"] for l in lines if l["prefix"] == "Train"} == {20, 40}


def test_cli_feathermap_run_is_decodable(tmp_path):
    """Feathermap bitstreams must decode through the CLI path (the decoder
    re-applies the feather wrap recorded in config.json)."""
    from implicit_image_tpu.compress import main
    from implicit_image_tpu.decompress import decode_run

    cfg = compose(
        [
            "img=synthetic",
            "img.height=16",
            "img.width=16",
            "mlp.depth=3",
            "mlp.hidden_size=16",
            "train.num_steps=30",
            "train.log_steps=10",
            "masking=Feathermap",
            "masking.density=0.5",
            "quant=none",
            "entropy_coding=zstd",
        ]
    )
    psnr, nbytes = main(cfg, run_dir=str(tmp_path))
    assert nbytes > 0
    img, stats = decode_run(tmp_path)
    assert img.shape == (16, 16, 3)


def test_short_run_reports_final_psnr(tmp_path):
    """num_steps < log_steps must still produce a non-NaN summary PSNR
    (the fit evals the last step regardless of cadence)."""
    from implicit_image_tpu.compress import main

    cfg = compose(
        [
            "img=synthetic",
            "img.height=16",
            "img.width=16",
            "mlp.depth=3",
            "mlp.hidden_size=16",
            "train.num_steps=40",
            "train.log_steps=1000",
            "masking=none",
            "quant=none",
            "entropy_coding=none",
        ]
    )
    psnr, _ = main(cfg, run_dir=str(tmp_path))
    assert np.isfinite(psnr)


def test_optim_string_fields_survive_coercion(tmp_path):
    """optim.preconditioner=ekfac must reach OptimConfig as a string."""
    from implicit_image_tpu.compress import main

    cfg = compose(
        [
            "img=synthetic",
            "img.height=16",
            "img.width=16",
            "mlp.depth=3",
            "mlp.hidden_size=16",
            "train.num_steps=20",
            "train.log_steps=10",
            "masking=none",
            "quant=none",
            "entropy_coding=none",
            "optim.preconditioner=ekfac",
        ]
    )
    psnr, _ = main(cfg, run_dir=str(tmp_path))
    assert np.isfinite(psnr)


def test_cli_checkpoint_and_resume(tmp_path):
    """train.checkpoint saves a resumable snapshot; train.resume continues
    the fit and reports final metrics at the global step numbering."""
    import json

    from implicit_image_tpu.compress import main

    base = [
        "img=synthetic", "img.height=16", "img.width=16",
        "mlp.depth=3", "mlp.hidden_size=16",
        "train.log_steps=20", "train.segment_steps=20",
        "masking=none", "quant=none", "entropy_coding=none",
    ]
    d1 = tmp_path / "first"
    main(compose(base + ["train.num_steps=20", "train.checkpoint=True"]),
         run_dir=str(d1))
    ck = d1 / "checkpoint.npz"
    assert ck.exists()

    d2 = tmp_path / "resumed"
    psnr, _ = main(
        compose(base + ["train.num_steps=60", f"train.resume={ck}"]),
        run_dir=str(d2),
    )
    assert np.isfinite(psnr)
    lines = [json.loads(l) for l in (d2 / "metrics.jsonl").read_text().splitlines()]
    steps = {l["step"] for l in lines if l["prefix"] == "Train"}
    assert steps == {40, 60}  # resumed run logs global steps 40 and 60


def test_lottery_ticket_mask_path_end_to_end(tmp_path):
    """Run A (RigL) writes mask.npz; run B re-fits under A's frozen mask
    via masking.sparse_init=lottery-ticket + masking.mask_path — the
    reference's lottery-ticket flow (init_scheme.py:161-185) end-to-end."""
    import json

    from implicit_image_tpu.compress import main

    base = [
        "img=synthetic", "img.height=24", "img.width=24",
        "mlp.depth=4", "mlp.hidden_size=16",
        "train.num_steps=60", "train.log_steps=30",
        "masking=RigL", "masking.density=0.5",
        "masking.end_when=40", "masking.interval=10",
        "~quant", "entropy_coding=none",
    ]
    run_a = tmp_path / "a"
    psnr_a, _ = main(compose(base), run_dir=str(run_a))
    assert (run_a / "mask.npz").exists()

    run_b = tmp_path / "b"
    psnr_b, _ = main(
        compose(base + [
            "masking.sparse_init=lottery-ticket",
            f"masking.mask_path={run_a / 'mask.npz'}",
            # lottery tickets keep the WINNING topology frozen
            "masking.end_when=0",
        ]),
        run_dir=str(run_b),
    )
    assert np.isfinite(psnr_b) and psnr_b > 10.0

    # density is A's final density, and B's masks equal A's exactly
    a = np.load(run_a / "mask.npz")
    b = np.load(run_b / "mask.npz")
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k])

    # run B's logged density matches the ticket's density
    summary = json.loads((run_b / "summary.json").read_text())
    assert np.isfinite(summary["PSNR"])


@pytest.mark.slow
def test_resume_init_from_weights_npz(tmp_path):
    """sparse_init=resume derives the mask from a prior run's saved
    weights' nonzero pattern (reference init_scheme.py:215-232)."""
    from implicit_image_tpu.compress import main

    base = [
        "img=synthetic", "img.height=24", "img.width=24",
        "mlp.depth=4", "mlp.hidden_size=16",
        "train.num_steps=40", "train.log_steps=20",
        "masking=RigL", "masking.density=0.4",
        "masking.end_when=30", "masking.interval=10",
        "~quant", "entropy_coding=none",
    ]
    run_a = tmp_path / "a"
    main(compose(base), run_dir=str(run_a))

    run_b = tmp_path / "b"
    psnr_b, _ = main(
        compose(base + [
            "masking.sparse_init=resume",
            f"masking.mask_path={run_a / 'model.npz'}",
            "masking.end_when=0",
        ]),
        run_dir=str(run_b),
    )
    assert np.isfinite(psnr_b)
    a_w = np.load(run_a / "model.npz")
    b_m = np.load(run_b / "mask.npz")
    for k in b_m.files:
        i = k.split(".")[1]
        np.testing.assert_array_equal(
            b_m[k] != 0, a_w[f"layers.{i}.w"] != 0
        )


def test_cli_16bit_ppm_image_end_to_end(tmp_path):
    """Full pipeline against a real 16-bit PPM on disk (the benchmark-set
    ingestion path: native-depth read -> /(2^16-1) -> crop), not the
    synthetic fallback; decoded PSNR must track quant PSNR."""
    import json

    from implicit_image_tpu.compress import main
    from implicit_image_tpu.data import synthetic_image

    img16 = (synthetic_image(28, 28, seed=5) * 65535).astype(np.uint16)
    ppm = tmp_path / "img.ppm"
    with open(ppm, "wb") as f:
        f.write(b"P6\n28 28\n65535\n")
        f.write(img16.astype(">u2").tobytes())

    cfg = compose([
        "img=synthetic", f"img.path={ppm}", "img.bits=16",
        "img.height=24", "img.width=24",
        "mlp.depth=4", "mlp.hidden_size=16",
        "train.num_steps=80", "train.log_steps=40",
        "quant.num_steps=10", "quant.bits=5",
        "entropy_coding=zstd", "masking=none",
    ])
    psnr, nbytes = main(cfg, run_dir=str(tmp_path / "run"))
    assert np.isfinite(psnr) and nbytes > 0
    summary = json.loads((tmp_path / "run" / "summary.json").read_text())
    assert abs(summary["Decoded PSNR"] - summary["Quant PSNR"]) < 0.5


def test_multirun_threaded_launcher_matches_serial(tmp_path, monkeypatch):
    """launcher.n_jobs=2 (the joblib-launcher counterpart): a
    heterogeneous-shape multirun on worker threads produces the same
    per-member results as the serial launcher."""
    from implicit_image_tpu.compress import cli

    monkeypatch.chdir(tmp_path)
    base = [
        "-m",
        "img=synthetic", "img.height=16", "img.width=16",
        "mlp.depth=3", "mlp.hidden_size=8,12",
        "train.num_steps=30", "train.log_steps=30",
        "masking=none", "quant=none", "entropy_coding=none",
        "logging.use=false",
    ]

    def run(extra, outdir):
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            cli(base + extra + [f"output_dir={outdir}"])
        lines = [l for l in buf.getvalue().splitlines() if l.startswith("[")]
        return sorted(lines)

    serial = run(["launcher.n_jobs=1"], "out_serial")
    threaded = run(["launcher.n_jobs=2"], "out_threaded")
    assert len(serial) == 2
    # identical member results modulo the output_dir override in the tag
    strip = lambda ls: [l.split("] ")[1] for l in ls]
    assert strip(serial) == strip(threaded)


def test_auto_pixel_chunks_resolution():
    """pixel_chunks="auto" (the default) bounds each gradient chunk to
    2^20 pixels with a row-aligned chunk count; <=1Mpix grids stay
    unchunked so the 512^2 protocol behavior is unchanged."""
    from implicit_image_tpu.compress import (
        _auto_pixel_chunks,
        _auto_segment_steps,
        _resolve_pixel_chunks,
    )

    assert _auto_pixel_chunks(512, 512) == 1
    assert _auto_pixel_chunks(1024, 1024) == 1
    assert _auto_pixel_chunks(2048, 2048) == 4
    assert _auto_pixel_chunks(4096, 4096) == 16
    # non-power-of-two: chunk count must divide H (row alignment)
    k = _auto_pixel_chunks(1500, 1400)
    assert 1500 % k == 0 and (1500 // k) * 1400 <= (1 << 20)
    # prime H larger than the bound: falls back to legal divisors only
    k = _auto_pixel_chunks(1031, 1031)
    assert 1031 % k == 0 and k > 1

    assert _resolve_pixel_chunks("auto", 2048, 2048) == 4
    assert _resolve_pixel_chunks(0, 2048, 2048) == 4
    assert _resolve_pixel_chunks(None, 2048, 2048) == 4
    assert _resolve_pixel_chunks(8, 2048, 2048) == 8
    assert _resolve_pixel_chunks("2", 512, 512) == 2

    # segment auto-scaling shrinks with pixel count (runtime ~60 s wall):
    # 2048^2 runs ~16x slower per step than 512^2 at equal width
    cfg_small = compose([])
    cfg_big = compose(["img.height=2048", "img.width=2048"])
    assert _auto_segment_steps(cfg_big) * 16 == _auto_segment_steps(cfg_small)


def test_cli_hashgrid_run_is_decodable(tmp_path):
    """hashgrid (arXiv:2201.05989) end-to-end: fit -> kmeans (table
    included via quant.skip_layers=[]) -> entropy code -> CLI decode."""
    from implicit_image_tpu.compress import main
    from implicit_image_tpu.decompress import decode_run

    cfg = compose(
        [
            "img=synthetic",
            "img.height=32",
            "img.width=32",
            "mlp=hashgrid",
            "mlp.n_levels=4",
            "mlp.log2_table_size=8",
            "mlp.base_resolution=4",
            "mlp.finest_resolution=32",
            "mlp.hidden_size=16",
            "masking=none",
            "quant=kmeans",
            "quant.bits=4",
            "quant.skip_layers=[]",
            "optim.lr=1e-2",
            "optim.epsilon=1e-15",
            "train.num_steps=60",
            "train.log_steps=20",
            "entropy_coding=auto",
        ]
    )
    psnr, nbytes = main(cfg, run_dir=str(tmp_path))
    assert nbytes > 0
    img, stats = decode_run(tmp_path)
    assert img.shape == (32, 32, 3)


def test_auto_segment_steps_hashgrid():
    """hashgrid's default separable path is measured at 11.35 ms/step at
    512^2 x 12 levels (benchmarks/hashgrid_speed.py, BASELINE.md) — the
    standard 2000-step segment (~23 s) fits the runtime's ~60 s execution
    watchdog, and larger pixels x levels workloads scale the segment down
    proportionally."""
    from implicit_image_tpu.compress import _auto_segment_steps

    cfg = compose(["mlp=hashgrid"])
    assert _auto_segment_steps(cfg) == 2000
    # smaller pyramids/images do NOT grow past the 2000-step default
    cfg = compose(["mlp=hashgrid", "mlp.n_levels=6"])
    assert _auto_segment_steps(cfg) == 2000
    # 4x the pixels -> quarter the segment
    cfg = compose(["mlp=hashgrid", "img.height=1024", "img.width=1024"])
    assert _auto_segment_steps(cfg) == 500
    # explicit override still wins
    cfg = compose(["mlp=hashgrid", "train.segment_steps=500"])
    assert _auto_segment_steps(cfg) == 500
    # matmul families keep the 2000-step default
    cfg = compose([])
    assert _auto_segment_steps(cfg) == 2000


def test_cli_quant_skip_layers_reaches_pipeline(tmp_path):
    """quant.skip_layers must plumb from the CLI into QuantConfig
    (regression: it was silently dropped, so hashgrid tables — params[0],
    skipped by the default first/last rule — stayed unquantized)."""
    from implicit_image_tpu.compress import main

    base = [
        "img=synthetic", "img.height=32", "img.width=32",
        "mlp=hashgrid", "mlp.n_levels=4", "mlp.log2_table_size=8",
        "mlp.base_resolution=4", "mlp.finest_resolution=32",
        "mlp.hidden_size=16", "masking=none", "quant=kmeans",
        "quant.bits=4", "quant.num_steps=5", "train.num_steps=30",
        "train.log_steps=10", "optim.lr=1e-2", "entropy_coding=plain",
    ]
    _, bytes_default = main(
        compose(base), run_dir=str(tmp_path / "default")
    )
    _, bytes_all = main(
        compose(base + ["quant.skip_layers=[]"]), run_dir=str(tmp_path / "all")
    )
    # quantizing the table (4-bit labels vs raw floats) must shrink the
    # stream by a wide margin
    assert bytes_all < 0.6 * bytes_default, (bytes_all, bytes_default)
