"""Orchestrator / CLI — the equivalent of reference implicit_image/compress.py.

Pipeline (reference compress.py:52-273): seed → load image → build grid +
model (Small-Dense width scaling / Feathermap wrap per the masking group) →
fit (dense or sparse, ONE compiled scan) → optional quantize-aware finetune
→ convert → entropy-code the state dict → report (PSNR, compressed bytes).
The tuple return feeds hyper-parameter sweepers exactly like the
reference's Optuna/Ax integration (compress.py:269).

CLI mirrors the reference's Hydra UX (config/__init__.py):

    python -m implicit_image_tpu.compress img=flower masking=RigL \
        masking.density=0.2 train.multiplier=5
    python -m implicit_image_tpu.compress -m masking.density=0.1,0.3,0.5

Multirun jobs write to per-job output dirs outputs/<img>/<exp>/<overrides>
(reference conf/hydra.yaml:2-8 templating).
"""
from __future__ import annotations

import json
import logging
import os
import sys
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from implicit_image_tpu.coding import (
    compress_state_dict,
    decode_and_render,
    linear_state_dict,
)
from implicit_image_tpu.config import DotDict, compose, expand_multirun
from implicit_image_tpu.data import (
    get_grid,
    load_img,
    resolve_benchmark_path,
    stable_seed,
    synthetic_image,
)
from implicit_image_tpu.models import build_model_from_config
from implicit_image_tpu.quant import QuantConfig, quantized_layer_indices
from implicit_image_tpu.sparsity import MaskingConfig
from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit
from implicit_image_tpu.training.quant_phase import quant_finetune
from implicit_image_tpu.utils import MetricsLogger, catch_error_decorator

log = logging.getLogger("implicit_image_tpu")

_MASKING_FIELDS = {
    "density",
    "sparse_init",
    "dense_gradients",
    "prune_mode",
    "growth_mode",
    "redistribution_mode",
    "decay_schedule",
    "prune_rate",
    "final_density",
    "start_when",
    "end_when",
    "interval",
    "dense",
    "print_FLOPs",
    "name",
    "mask_path",
}


def _load_image(img_cfg) -> np.ndarray:
    """Load the configured image; deterministic synthetic fallback when the
    benchmark file is unavailable (zero-egress environments)."""
    path = img_cfg.get("path")
    resolved = resolve_benchmark_path(path) if path else None
    if resolved:
        return load_img(
            resolved,
            height=img_cfg.height,
            width=img_cfg.width,
            bits=img_cfg.bits,
            crop_mode=img_cfg.get("crop_mode", "centre-crop"),
            save_gt=img_cfg.get("save_gt", False),
        )
    if path:
        log.warning("image %s not found; using synthetic stand-in", path)
    seed = stable_seed(img_cfg.get("name", "synthetic"))
    return synthetic_image(img_cfg.height, img_cfg.width, seed=seed)


def _auto_alloc_dominates(
    cfg, qres_auto, qres_uniform, mdef, mcfg, grid, img, run_dir
) -> bool:
    """Post-finetune A/B for quant.bit_alloc=auto: adopt the per-layer
    allocation only if its (decoded PSNR, container bytes) operating point
    dominates the uniform codebooks' — measured on the run's real entropy
    backend. Without a coding stage the comparison degrades to quant PSNR
    (the allocation's modeled rate is smaller by construction). Both probe
    containers are left in the run dir (`bit_alloc_{auto,uniform}/`) as
    audit artifacts; the winner is re-encoded to model_quantized/ by the
    normal coding stage."""
    ec = cfg.get("entropy_coding")
    if not ec or ec.get("stream_name", "none") == "none":
        return float(np.asarray(qres_auto.metrics["quant_psnr"])) >= float(
            np.asarray(qres_uniform.metrics["quant_psnr"])
        )
    half = ec.get("half", "auto")
    half = {"auto": "auto", True: True, False: False,
            "true": True, "false": False}[half]
    # same container-policy exclusions as the main coding stage (these are
    # compress.py policies, not encode_stream kwargs)
    kwargs = {k: v for k, v in ec.items()
              if k not in ("stream_name", "half", "progressive",
                           "base_finetune", "xor")}
    h, w = grid.shape[:2]
    img64 = np.asarray(img, np.float64)

    def point(qr, tag):
        state = linear_state_dict(qr.params, qr.codebooks, half=half)
        d = Path(run_dir) / f"bit_alloc_{tag}"
        nbytes = compress_state_dict(state, d, ec.stream_name, **kwargs)
        dec, _ = decode_and_render(
            d, ec.stream_name, mdef, mcfg, h, w, benchmark=False, **kwargs
        )
        err = float(np.mean((np.asarray(dec, np.float64) - img64) ** 2))
        return 10.0 * np.log10(1.0 / max(err, 1e-12)), nbytes

    db_a, by_a = point(qres_auto, "auto")
    db_u, by_u = point(qres_uniform, "uniform")
    log.info(
        "bit_alloc A/B: auto %.3f dB @ %d B vs uniform %.3f dB @ %d B",
        db_a, by_a, db_u, by_u,
    )
    return db_a >= db_u and by_a <= by_u


def _auto_segment_steps(cfg) -> int:
    """Per-step cost grows ~quadratically with hidden width (the matmul
    chain is K=width-bound, BASELINE.md shape ceiling) and ~linearly with
    pixel count; scale the default 2000-step segment so one execution stays
    well under the runtime's ~60 s wall budget at any operating point. An
    explicit train.segment_steps wins."""
    explicit = cfg.train.get("segment_steps")
    if explicit is not None:
        return int(explicit)
    pixels = int(cfg.img.get("height", 512)) * int(cfg.img.get("width", 512))
    if cfg.mlp.get("name") == "hashgrid":
        # separable path (the default): measured 11.35 ms/step at
        # 512^2 x 12 levels on v5e — a 2000-step segment is ~23 s, well
        # inside the watchdog. Scale down for bigger grids/pyramids the
        # same way as the matmul models (per-step cost ~ pixels x levels).
        levels = int(cfg.mlp.get("n_levels", 12))
        scale = min(1.0, (512.0 * 512.0 * 12.0)
                    / max(pixels * max(levels, 1), 1))
        return max(25, min(2000, int(2000 * scale)))
    width = int(cfg.mlp.get("hidden_size", 128))
    scale = min(1.0, (128.0 / max(width, 1)) ** 2)
    scale *= min(1.0, (512.0 * 512.0) / max(pixels, 1))
    return max(25, int(2000 * scale))


# At most this many pixels per gradient chunk under pixel_chunks="auto":
# a 1024x1024 (2^20-pixel) full-grid fit+backward is measured safe in v5e
# HBM at the protocol widths (BASELINE.md large-image table); beyond that
# the unchunked 2048^2 run crashes the worker.
_AUTO_CHUNK_PIXELS = 1 << 20


def _auto_pixel_chunks(h: int, w: int) -> int:
    """Smallest row-aligned chunk count bounding each chunk to
    _AUTO_CHUNK_PIXELS. Row alignment (k | H) keeps CoordX's separable
    chunk path (fit.py:215-223) and guarantees k divides H*W."""
    if h * w <= _AUTO_CHUNK_PIXELS:
        return 1
    need = -(-(h * w) // _AUTO_CHUNK_PIXELS)  # ceil
    for k in range(need, h + 1):
        if h % k == 0:
            return k
    return h  # one row per chunk (unreachable for any h >= need)


def _resolve_pixel_chunks(raw, h: int, w: int) -> int:
    """train.pixel_chunks: an int, or "auto"/0 -> _auto_pixel_chunks."""
    if raw in ("auto", None) or (isinstance(raw, (int, float)) and int(raw) == 0):
        return _auto_pixel_chunks(h, w)
    return int(raw)


def main(
    cfg: DotDict, run_dir: Optional[str] = None, image=None
) -> Tuple[float, int]:
    """Run the full compress pipeline; returns (test_PSNR, compressed_bytes).

    `image` (the programmatic api.compress_image path) injects a preloaded
    (H, W, 3) float array in [0, 1] instead of loading from cfg.img —
    cfg.img.height/width must already match its shape (the run dir's
    config.json drives the decode CLI's lattice)."""
    key = jax.random.PRNGKey(int(cfg.seed))
    run_dir = run_dir or cfg.get("output_dir", "outputs/run")
    Path(run_dir).mkdir(parents=True, exist_ok=True)
    log_cfg = cfg.get("logging", {})
    logger = MetricsLogger(
        run_dir,
        use=log_cfg.get("use", True),
        wandb_project=log_cfg.get("wandb_project"),
        wandb_name=log_cfg.get("name"),
    )
    # persist the composed config so the run dir is self-contained — the
    # decode CLI (decompress.py) and the visualize run-store reader
    # (visualize/runs.py) rebuild the model from it
    (Path(run_dir) / "config.json").write_text(json.dumps(cfg, indent=2, default=str))

    img = (
        np.asarray(image, np.float32) if image is not None
        else _load_image(cfg.img)
    )
    h, w = img.shape[:2]
    grid = get_grid(h, w)

    masking_cfg_raw = cfg.get("masking")
    # Small-Dense width compensation + Feathermap wrap (compress.py:74-81),
    # via the SAME builder the decoder uses (models.build_model_from_config)
    mdef, mcfg = build_model_from_config(cfg)

    # training multiplier semantics (compress.py:110-120)
    mult = int(cfg.train.get("multiplier", 1))
    num_steps = int(cfg.train.num_steps) * mult

    masking: Optional[MaskingConfig] = None
    if masking_cfg_raw and not masking_cfg_raw.get("dense", False):
        fields = {
            k: v for k, v in masking_cfg_raw.items() if k in _MASKING_FIELDS
        }
        if "end_when" in fields:
            fields["end_when"] = int(fields["end_when"] * mult)
        if "interval" in fields:
            fields["interval"] = int(fields["interval"] * mult)
        masking = MaskingConfig(**fields)

    train_cfg = TrainConfig(
        num_steps=num_steps,
        log_steps=int(cfg.train.log_steps),
        compute_dtype="bfloat16" if cfg.train.get("mixed_precision", False) else None,
        multiplier=mult,
        save_weights=cfg.train.get("save_weights", True),
        use_pallas=bool(cfg.train.get("use_pallas", False)) and cfg.mlp.name == "siren",
        pixel_chunks=_resolve_pixel_chunks(
            cfg.train.get("pixel_chunks", "auto"), h, w
        ),
        segment_steps=_auto_segment_steps(cfg),
        loss=str(cfg.train.get("loss", "mse")),
        ssim_weight=float(cfg.train.get("ssim_weight", 0.84)),
        matmul_precision=cfg.train.get("matmul_precision") or None,
        matmul_precision_early=(
            cfg.train.get("matmul_precision_early") or None
        ),
        matmul_precision_switch=float(
            cfg.train.get("matmul_precision_switch", 0.75)
        ),
    )
    # PyYAML parses bare "3e-4" as a string; coerce fields that LOOK
    # numeric, leave real strings (e.g. preconditioner="ekfac") alone
    optim_kwargs = {}
    for k, v in cfg.optim.items():
        if k != "name" and isinstance(v, str):
            try:
                v = float(v)
            except ValueError:
                pass
        optim_kwargs[k] = v
    optim_cfg = OptimConfig(**optim_kwargs)

    log.info(
        "fit: %s on %s (%dx%d), %d steps, masking=%s",
        cfg.mlp.name, cfg.img.name, h, w, num_steps,
        masking_cfg_raw.get("name") if masking_cfg_raw else "none",
    )
    ck_path = None
    if cfg.train.get("checkpoint", False):
        ck_path = Path(run_dir) / "checkpoint.npz"
    resume_from = cfg.train.get("resume") or None

    watch_cb = None
    if cfg.train.get("watch", False):
        # wandb.watch equivalent (reference compress.py:101): per-layer
        # weight + Adam grad-EMA histograms at every segment boundary,
        # host-side (utils/logger.py histogram sink)
        def watch_cb(params_w, opt_state_w, step_w):
            tensors = {}
            for i, layer in enumerate(params_w):
                for k, v in layer.items():
                    tensors[f"layers.{i}.{k}"] = np.asarray(v)
            if hasattr(opt_state_w, "mu"):
                for i, layer in enumerate(opt_state_w.mu):
                    for k, v in layer.items():
                        tensors[f"layers.{i}.{k}.grad_ema"] = np.asarray(v)
            logger.histogram(step_w, tensors)

    fit_kwargs = dict(
        checkpoint_path=ck_path, resume_from=resume_from, watch=watch_cb
    )

    init_path = cfg.train.get("init_path") or None
    if init_path == "auto":
        # warm/cold arbitration: warm only inside its measured-win regime
        # AND when a committed artifact matches this architecture
        from implicit_image_tpu.training.metainit import resolve_auto_init

        params_w, init_path, why = resolve_auto_init(
            mdef.name, mcfg, num_steps,
            matmul_precision=cfg.train.get("matmul_precision") or None,
        )
        if params_w is not None:
            fit_kwargs["init_params"] = params_w
            log.info("fit: init_path=auto -> warm (%s)", why)
        else:
            log.info("fit: init_path=auto -> cold (%s)", why)
    elif init_path:
        # meta-learned warm start (training/metainit.py): shared
        # encoder-side state, zero bitstream cost — the container still
        # carries full quantized weights, so decode needs nothing extra
        from implicit_image_tpu.training.metainit import (
            WARM_BUDGET_MAX_STEPS,
            load_meta_init,
        )

        if num_steps > WARM_BUDGET_MAX_STEPS:
            # regime guard: past the largest MEASURED warm win (r5
            # raised it to 3000 after the tf32 re-measurement killed the
            # bf16-era ~b1200 saturation; metainit.py) — honor the
            # explicit config but say so loudly; init_path=auto picks
            # cold here
            log.warning(
                "fit: explicit warm start at %d steps is past the "
                "measured warm-win regime (<= %d); beyond it is "
                "unmeasured — use train.init_path=auto for budget-aware "
                "arbitration", num_steps,
                WARM_BUDGET_MAX_STEPS,
            )
        fit_kwargs["init_params"] = load_meta_init(
            init_path, expect_model=mdef.name, expect_mcfg=mcfg
        )
        log.info("fit: warm-starting from meta-init %s", init_path)

    stop_at = cfg.train.get("stop_at_psnr")
    if stop_at is not None:
        # encode-to-quality: halt at the first segment boundary whose
        # eval PSNR reaches the target (granularity = train.segment_steps)
        if resume_from:
            raise ValueError(
                "train.stop_at_psnr cannot combine with train.resume "
                "(step-index bookkeeping would misalign the metric log)"
            )
        fit_kwargs["stop_psnr"] = float(stop_at)

    if cfg.get("profile", False):
        # jax.profiler device trace of the whole fit (view with TensorBoard/
        # xprof) — the TPU-native replacement for the reference's
        # nvidia-smi polling (SURVEY.md §5)
        from implicit_image_tpu.utils import trace

        with trace(str(Path(run_dir) / "profile")):
            res = fit(key, mdef, mcfg, grid, img, train_cfg, optim_cfg, masking,
                      **fit_kwargs)
    else:
        res = fit(key, mdef, mcfg, grid, img, train_cfg, optim_cfg, masking,
                  **fit_kwargs)

    # post-hoc logging at the reference cadence (metrics were computed
    # in-program at (i+1) % log_steps == 0, compress.py:146)
    psnr_arr = np.asarray(res.metrics["psnr"])
    loss_arr = np.asarray(res.metrics["test_loss"])
    psnr8_arr = np.asarray(res.metrics["psnr_8bit"])
    prune_arr = np.asarray(res.metrics["prune_rate"]) if masking is not None else None
    density_arr = np.asarray(res.metrics["density"]) if masking is not None else None
    test_psnr = float("nan")
    # [first_step, end_step) = the executed step window: resume starts
    # late, stop_at_psnr ends early — either way the arrays cover it
    end_step = res.stopped_at if res.stopped_at is not None else num_steps
    first_step = end_step - len(psnr_arr)
    for i in range(first_step, end_step):
        # the fit also evals the final step so short runs report a PSNR
        if (i + 1) % train_cfg.log_steps == 0 or i == num_steps - 1:
            entry = {
                "loss": float(loss_arr[i - first_step]),
                "PSNR": float(psnr_arr[i - first_step]),
                "PSNR_8bit": float(psnr8_arr[i - first_step]),
            }
            if masking is not None:
                entry["Prune Rate"] = float(prune_arr[i - first_step])
                entry["Density"] = float(density_arr[i - first_step])
            logger.log(i + 1, entry)
            test_psnr = entry["PSNR"]
    if res.stopped_at is not None:
        # the boundary eval that triggered the stop is the freshest PSNR
        test_psnr = float(res.stop_psnr_db)
        log.info(
            "fit: stop_at_psnr reached %.2f dB at step %d (budget %d)",
            test_psnr, res.stopped_at, num_steps,
        )
        logger.log(res.stopped_at, {"PSNR": test_psnr})
    logger.summary({"PSNR": test_psnr, "fit_wall_s": res.wall_seconds})

    params = res.params
    compressed_bytes = 0

    # ---- quant phase (compress.py:172-240) ----
    quant_cfg_raw = cfg.get("quant")
    qres = None
    delta_info = None
    if quant_cfg_raw and quant_cfg_raw.get("name", "none") != "none":
        quant_cfg = QuantConfig(
            name=quant_cfg_raw.name,
            bits=int(quant_cfg_raw.get("bits", 8)),
            num_steps=int(quant_cfg_raw.get("num_steps", 100)),
            log_steps=int(quant_cfg_raw.get("log_steps", 10)),
            ecvq_lambda=float(quant_cfg_raw.get("ecvq_lambda", 0.0)),
            qscheme=str(quant_cfg_raw.get("qscheme", "per_channel")),
            lr=(float(quant_cfg_raw["lr"])
                if quant_cfg_raw.get("lr") is not None else None),
            # encoder-side finetune-target row subsample (quant/__init__
            # QuantConfig.row_stride; 1 = reference parity)
            row_stride=int(quant_cfg_raw.get("row_stride", 1)),
            # None = the reference's first/last-layer skip; an explicit
            # list (e.g. [] for hashgrid, whose capacity is params[0])
            # overrides it
            skip_layers=(
                tuple(int(i) for i in quant_cfg_raw["skip_layers"])
                if quant_cfg_raw.get("skip_layers") is not None
                else None
            ),
            # explicit per-layer widths (list aligned to params indices;
            # null entries fall back to `bits`) — see quant/allocate.py
            bits_per_layer=(
                tuple(
                    int(b) if b is not None else None
                    for b in quant_cfg_raw["bits_per_layer"]
                )
                if quant_cfg_raw.get("bits_per_layer") is not None
                else None
            ),
        )
        masks = res.mask_state.masks if res.mask_state is not None else None
        quant_kwargs = dict(
            masks=masks,
            compute_dtype=jnp.bfloat16 if train_cfg.compute_dtype else None,
            pixel_chunks=train_cfg.pixel_chunks,
            # same watchdog budget as the fit (only bites when the auto
            # segment is shorter than quant.num_steps, e.g. hashgrid)
            segment_steps=train_cfg.segment_steps,
            matmul_precision=train_cfg.matmul_precision,
        )
        if bool(quant_cfg_raw.get("delta", False)):
            # delta mode (beyond reference): quantized layers cluster +
            # code the RESIDUAL against the train.init_path warm-start
            # artifact, which becomes shared encoder/decoder state — the
            # container stores a residual codebook plus an artifact
            # reference (path + sha256), see coding/__init__.py
            if quant_cfg.name != "KMeans":
                raise ValueError("quant.delta requires quant=kmeans")
            if not init_path:
                raise ValueError(
                    "quant.delta codes residuals against the meta-init "
                    "artifact; set train.init_path"
                )
            import hashlib

            quant_kwargs["offset_params"] = fit_kwargs["init_params"]
            delta_info = {
                "artifact": str(init_path),
                "sha256": hashlib.sha256(
                    Path(init_path).read_bytes()
                ).hexdigest(),
            }
        qres = quant_finetune(
            params, img, mdef, mcfg, grid, quant_cfg, optim_cfg,
            **quant_kwargs,
        )
        # ---- automatic per-layer bit allocation (beyond reference) ----
        # quant.bit_alloc=auto measures each layer's codebook R-D curve,
        # solves the Lagrangian allocation (quant/allocate.py), finetunes
        # the allocated codebooks too, and keeps the allocation ONLY if
        # its post-finetune operating point dominates the uniform one
        # (decoded PSNR >= AND bytes <=, on the run's real container) —
        # the pre-finetune MSE guarantee alone does not survive the
        # codebook finetune (measured: SIREN -0.57 dB for -1% rate;
        # CoordX +0.09 dB at -0.64% — benchmarks/bit_alloc_ab.py).
        if (
            str(quant_cfg_raw.get("bit_alloc", "none")) == "auto"
            and quant_cfg.name == "KMeans"
            and quant_cfg.bits_per_layer is None
        ):
            import dataclasses

            from implicit_image_tpu.quant.allocate import allocate_bits

            report = allocate_bits(mdef, mcfg, params, grid, img, quant_cfg)
            chosen = quant_cfg
            if not report.chosen_uniform:
                auto_cfg = dataclasses.replace(
                    quant_cfg, bits_per_layer=report.bits_per_layer
                )
                qres_auto = quant_finetune(
                    params, img, mdef, mcfg, grid, auto_cfg, optim_cfg,
                    **quant_kwargs,
                )
                adopt = _auto_alloc_dominates(
                    cfg, qres_auto, qres, mdef, mcfg, grid, img, run_dir
                )
                if adopt:
                    qres, chosen = qres_auto, auto_cfg
                log.info(
                    "bit_alloc=auto: %s allocation %s",
                    "adopted" if adopt else "rejected (uniform dominates)",
                    report.bits_per_layer,
                )
            quant_cfg = chosen
            effective = chosen.bits_per_layer or tuple(
                chosen.bits if i in set(quantized_layer_indices(params, chosen))
                else None
                for i in range(len(params))
            )
            logger.summary({
                "Bit Allocation": [-1 if b is None else b for b in effective],
            })
        if delta_info is not None:
            delta_info["layers"] = [
                i for i, cb in enumerate(qres.codebooks) if cb is not None
            ]
        qpsnr = float(np.asarray(qres.metrics["quant_psnr"]))
        logger.log(
            num_steps,
            {
                "Quant PSNR": qpsnr,
                "Quant PSNR_8bit": float(
                    np.asarray(qres.metrics["quant_psnr_8bit"])
                ),
            },
            prefix="Quant",
        )
        logger.summary({"Quant PSNR": qpsnr})
        test_psnr = qpsnr

    # ---- save weights (compress.py:243-247) ----
    if train_cfg.save_weights:
        flat = {}
        for i, layer in enumerate(params):
            for k, v in layer.items():
                flat[f"layers.{i}.{k}"] = np.asarray(v)
        np.savez(Path(run_dir) / "model.npz", **flat)
        np.savez(
            Path(run_dir) / "model_half.npz",
            **{k: v.astype(np.float16) for k, v in flat.items()},
        )
        if res.mask_state is not None:
            # mask.npz feeds masking.mask_path (lottery-ticket/resume init)
            # in a later run — reference init_scheme.py:161-232 semantics
            np.savez(
                Path(run_dir) / "mask.npz",
                **{
                    f"layers.{i}.mask": np.asarray(m)
                    for i, m in enumerate(res.mask_state.masks)
                    if m is not None
                },
            )

    # ---- entropy coding (compress.py:250-263) ----
    ec = cfg.get("entropy_coding")
    if ec and ec.get("stream_name", "none") != "none":
        source = qres if qres is not None else None
        # dtype policy: "auto" (default) keeps UNquantized tensors fp32
        # (+~3% rate, recovers the ~1 dB the reference's blanket
        # model.half() costs at ω₀=50); half=true is strict parity
        half = ec.get("half", "auto")
        half = {"auto": "auto", True: True, False: False,
                "true": True, "false": False}[half]
        state = linear_state_dict(
            source.params if source else params,
            source.codebooks if source else None,
            half=half,
        )
        kwargs = {k: v for k, v in ec.items()
                  if k not in ("stream_name", "half", "progressive",
                               "base_finetune", "xor")}
        refmap = None
        if delta_info is not None and bool(ec.get("xor", True)):
            # lossless XOR residual for the UNquantized tensors of a
            # delta container (coding.apply_xor_residual): near-
            # identical floats share high bits, so the plane-grouped
            # backend crushes the XOR — measured in BASELINE.md
            # "Delta quantization"; entropy_coding.xor=false opts out
            from implicit_image_tpu.coding import (
                apply_xor_residual,
                state_ref_map,
            )

            refmap = state_ref_map(fit_kwargs["init_params"])
            state, xor_names = apply_xor_residual(state, refmap)
            delta_info["xor"] = xor_names
        if ec.get("progressive", False):
            # format-4 quality-scalable container (coding/progressive.py):
            # a prefix decodes standalone at base quality, the full stream
            # is bit-exact to the non-progressive decode — INCLUDING delta
            # streams (VERDICT r3 item 5): rank nesting pins the pruned
            # label so the flagship's residual-coded stream gains a
            # standalone base layer
            from implicit_image_tpu.coding.progressive import (
                base_bytes as _base_bytes,
                compress_progressive,
            )

            base_ft = None
            if ec.get("base_finetune", True):
                # output-distortion finetune of the 16-entry base books
                # (hi labels frozen; full stream untouched by construction)
                from implicit_image_tpu.quant.base_layer import (
                    finetune_base_codebooks,
                )

                ft_extra = {}
                if delta_info is not None:
                    # residual books finetune against the base-decode
                    # semantics: w = (book[hi] + offset) * (hi != 0)
                    ft_extra = {
                        "delta_layers": list(delta_info["layers"]),
                        "delta_offsets": {
                            i: np.asarray(
                                fit_kwargs["init_params"][i]["w"]
                            )
                            for i in delta_info["layers"]
                        },
                    }

                def base_ft(entries):
                    if delta_info is not None and delta_info.get("xor"):
                        # the XOR transform is a storage trick; the
                        # finetune renders real weights, so un-XOR the
                        # fp tensors it will read
                        from implicit_image_tpu.coding import _xor_arrays

                        entries = dict(entries)
                        for n in delta_info["xor"]:
                            if n in entries:
                                entries[n] = _xor_arrays(
                                    entries[n], refmap[n]
                                )
                    return finetune_base_codebooks(
                        mdef, mcfg, grid, img, entries, **ft_extra
                    )

            compressed_bytes = compress_progressive(
                state, Path(run_dir) / "model_quantized", ec.stream_name,
                base_finetune=base_ft, delta=delta_info, **kwargs,
            )
            log.info(
                "Compressed bytes %d (progressive: base prefix %d%s)",
                compressed_bytes,
                _base_bytes(Path(run_dir) / "model_quantized"),
                ", delta" if delta_info is not None else "",
            )
        else:
            compressed_bytes = compress_state_dict(
                state, Path(run_dir) / "model_quantized", ec.stream_name,
                delta=delta_info, **kwargs,
            )
            log.info("Compressed bytes %d", compressed_bytes)
        logger.summary({"Compressed Bytes": compressed_bytes})

        # ---- decoded PSNR: render from the written bitstream ----
        # The rate metric must pair with the distortion a DECODER sees,
        # not the pre-container quant PSNR (the reference never decodes;
        # we built the decoder, so close the loop every run).
        dec_img, _ = decode_and_render(
            Path(run_dir) / "model_quantized", ec.stream_name,
            mdef, mcfg, h, w, benchmark=False, **kwargs,
        )
        dec_mse = float(np.mean((np.asarray(dec_img, np.float64) - img) ** 2))
        decoded_psnr = float(10.0 * np.log10(1.0 / max(dec_mse, 1e-12)))
        q8 = np.asarray(dec_img, np.float64) * 255.0
        t8 = np.asarray(img, np.float64) * 255.0
        mse8 = float(np.mean((np.trunc(q8) - np.trunc(t8)) ** 2))
        decoded_psnr8 = float(10.0 * np.log10(255.0**2 / max(mse8, 1e-12)))
        entry = {"Decoded PSNR": decoded_psnr,
                 "Decoded PSNR_8bit": decoded_psnr8}
        # MS-SSIM (beyond reference — the reference reports PSNR only):
        # as many scales as the lattice supports, capped at the standard 5
        lv = min(5, int(np.log2(max(min(h, w) // 11, 1))) + 1)
        if lv >= 1 and min(h, w) >= 11:
            from implicit_image_tpu.ops.ssim import ms_ssim

            entry["Decoded MS-SSIM"] = float(
                ms_ssim(jnp.asarray(dec_img), jnp.asarray(img), levels=lv)
            )
        logger.log(num_steps, entry, prefix="Decoded")
        logger.summary({"Decoded PSNR": decoded_psnr,
                        **({"Decoded MS-SSIM": entry["Decoded MS-SSIM"]}
                           if "Decoded MS-SSIM" in entry else {})})
        test_psnr = decoded_psnr

    logger.close()
    return test_psnr, compressed_bytes


@catch_error_decorator
def cli(argv=None) -> None:
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )
    argv = list(sys.argv[1:] if argv is None else argv)
    multirun = False
    if "-m" in argv:
        argv.remove("-m")
        multirun = True
    if "--multirun" in argv:
        argv.remove("--multirun")
        multirun = True

    jobs = expand_multirun(argv) if multirun else [argv]

    def run_job(job_overrides):
        cfg = compose(job_overrides)
        subdir = ",".join(job_overrides).replace("/", "_") or "default"
        run_dir = (
            os.path.join(cfg.get("output_dir", "outputs/run"), subdir)
            if multirun
            else cfg.get("output_dir", "outputs/run")
        )
        psnr, nbytes = main(cfg, run_dir=run_dir)
        return subdir, psnr, nbytes

    # launcher.n_jobs — the reference's joblib launcher counterpart
    # (conf/hydra/launcher/joblib_launcher.yaml, n_jobs=2). Worker THREADS
    # instead of processes: all jobs share the one device, so while job A
    # executes on the TPU, job B's ~40 s XLA compile proceeds on host CPU
    # (compile and execution both release the GIL). Heterogeneous-shape
    # sweeps (width x depth) overlap their per-member compiles this way;
    # same-shape sweeps should prefer the vmapped ladder (parallel/).
    cfg0 = compose(jobs[0]) if jobs else None
    n_jobs = (
        int((cfg0.get("launcher") or {}).get("n_jobs", 1))
        if cfg0 is not None else 1
    )

    results = []
    if n_jobs > 1 and len(jobs) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=n_jobs) as pool:
            for subdir, psnr, nbytes in pool.map(run_job, jobs):
                print(f"[{subdir}] PSNR={psnr:.3f} bytes={nbytes}")
                results.append((psnr, nbytes))
    else:
        for job_overrides in jobs:
            subdir, psnr, nbytes = run_job(job_overrides)
            print(f"[{subdir}] PSNR={psnr:.3f} bytes={nbytes}")
            results.append((psnr, nbytes))
    if len(results) == 1:
        psnr, nbytes = results[0]
        print(f"RESULT PSNR={psnr:.4f} COMPRESSED_BYTES={nbytes}")


if __name__ == "__main__":
    cli()
