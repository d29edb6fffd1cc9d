#!/usr/bin/env python
"""Time-to-quality: wall-clock for the COMPLETE per-image protocol to
reach the reference pipeline's end quality.

The reference's protocol (SIREN d8/w128, 2000 full-grid steps, kmeans-8
quant finetune, zstd-22 fp16 container — conf/mlp/siren.yaml +
conf/quant/kmeans.yaml + makefiles/finals.mk) produces a decoded image at
some PSNR after an estimated ~40 s of GPU fit time (BASELINE.md). The
honest apples-to-apples speed question is therefore: *how fast does THIS
framework produce a bitstream that decodes at least as well?* — any
architecture allowed, since the decoder is part of the framework and the
artifact (a bitstream + decoded image) is what a user consumes.

Stages measured:
  1. reference operating point end-to-end (fit 2000 + quant + code +
     decode) -> its decoded PSNR = the quality bar, and its wall
  2. CoordX s4/w128 PSNR trajectory (fine eval cadence) -> the step at
     which the fit crosses the bar
  3. the COMPLETE CoordX protocol at a budget near that crossing:
     fit(budget) + kmeans-8 codebook finetune + auto coding + decode,
     end-to-end wall and decoded PSNR/rate — the flagship number

Usage: python benchmarks/time_to_quality.py [budgets=400,600,800]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from implicit_image_tpu.coding import (  # noqa: E402
    compress_state_dict,
    decode_and_render,
    linear_state_dict,
)
from implicit_image_tpu.data import get_grid, synthetic_image  # noqa: E402
from implicit_image_tpu.models import build_model  # noqa: E402
from implicit_image_tpu.quant import QuantConfig  # noqa: E402
from implicit_image_tpu.training.fit import (  # noqa: E402
    OptimConfig,
    TrainConfig,
    fit,
)
from implicit_image_tpu.training.quant_phase import make_quant_fit_fn  # noqa: E402


def full_protocol(tag, mdef, mcfg, grid, img, steps, optim_cfg, out_dir,
                  log_steps=None, stream="zstd", half="auto",
                  masking_cfg=None, quant_lr=None, init_params=None,
                  delta_info=None, matmul_precision=None,
                  program_cache=None, quant_row_stride=1,
                  matmul_precision_early=None,
                  matmul_precision_switch=0.75):
    """fit -> kmeans-8 codebook finetune -> entropy code -> decode.
    Returns dict with stage walls, decoded PSNR, rate. Every wall is the
    compiled-execution wall (compile excluded, as in BASELINE.md — the
    reference's torch baseline has no compile stage either); coding is
    host byte work and timed end-to-end.

    `delta_info` (quant.delta A/B — benchmarks/delta_ab.py): a dict
    {"artifact": path, "sha256": hex} enabling residual coding against
    `init_params` (which must be the loaded artifact).

    `program_cache` (a caller-owned dict, one per repeated config): the
    compiled fit + quant programs are stashed and reused across calls, so
    repeats measure the STEADY-STATE execution wall instead of re-paying
    the first-execution-after-compile warm-up every time — BENCH_r04's
    quant stage (1.42-1.75 s reported vs 0.50 s steady) was exactly this
    overcount (BASELINE.md "Quant-phase breakdown"). The quant program
    takes masks/offsets as TRACED arguments (make_quant_fit_fn
    .with_offsets), so reuse is sound even though each call's fit
    produces fresh mask values.

    `quant_row_stride` > 1 finetunes the codebooks against every s-th
    image row (QuantConfig.row_stride semantics — encoder-side only;
    decoded PSNR below is always the full image)."""
    from implicit_image_tpu.coding import (
        decompress_state_dict,
        params_from_state_dict,
    )
    from implicit_image_tpu.data import get_grid

    h, w = grid.shape[:2]
    cache = program_cache
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=steps, log_steps=log_steps or max(steps // 4, 1),
                    matmul_precision=matmul_precision,
                    matmul_precision_early=matmul_precision_early,
                    matmul_precision_switch=matmul_precision_switch),
        optim_cfg, masking_cfg, init_params=init_params,
        program_cache=cache,
    )
    p = np.asarray(res.metrics["psnr"]).reshape(-1)
    fit_psnr = float(p[np.isfinite(p)][-1])
    masks = res.mask_state.masks if res.mask_state is not None else None

    stride = int(quant_row_stride)
    qgrid = grid[::stride] if stride > 1 else grid
    qimg = jnp.asarray(img)[::stride] if stride > 1 else jnp.asarray(img)
    qcfg = QuantConfig(name="KMeans", bits=8, num_steps=100, log_steps=100,
                       lr=quant_lr)
    if cache is not None and "quant" in cache:
        qfn_c = cache["quant"]
    else:
        qfn = jax.jit(make_quant_fit_fn(
            mdef, mcfg, qgrid, qcfg, optim_cfg,
            matmul_precision=matmul_precision,
        ).with_offsets)
        offs0 = tuple(
            (layer.get("w") if isinstance(layer, dict) else None)
            for layer in init_params
        ) if delta_info is not None else tuple(None for _ in res.params)
        mks0 = masks if masks is not None else tuple(
            None for _ in res.params)
        qfn_c = qfn.lower(res.params, qimg, offs0, mks0).compile()
        if cache is not None:
            cache["quant"] = qfn_c
    offs = tuple(
        (layer.get("w") if isinstance(layer, dict) else None)
        for layer in init_params
    ) if delta_info is not None else tuple(None for _ in res.params)
    mks = masks if masks is not None else tuple(None for _ in res.params)
    t0 = time.perf_counter()
    params_q, codebooks, qmetrics = qfn_c(res.params, qimg, offs, mks)
    qpsnr = float(np.asarray(qmetrics["quant_psnr"]))
    t1 = time.perf_counter()
    state = linear_state_dict(params_q, codebooks, half=half)
    if delta_info is not None:
        from implicit_image_tpu.coding import (
            apply_xor_residual,
            state_ref_map,
        )

        delta_info = dict(delta_info)
        delta_info["layers"] = [
            i for i, cb in enumerate(codebooks) if cb is not None
        ]
        # same default as compress.py: lossless XOR residual for the
        # unquantized tensors of a delta container
        state, xor_names = apply_xor_residual(
            state, state_ref_map(init_params)
        )
        delta_info["xor"] = xor_names
    nbytes = compress_state_dict(state, out_dir, stream, delta=delta_info)
    t2 = time.perf_counter()

    # decode: host entropy decode + upload + render, with the render
    # program precompiled (per-image marginal cost; compile amortizes) —
    # the production decoder render (tf32 default; a 1-pass bf16 render
    # caps decoded readings near ~53 dB)
    from implicit_image_tpu.coding import _get_render

    render = _get_render(mdef, mcfg, h, w)
    state0 = decompress_state_dict(out_dir, stream)
    params0 = params_from_state_dict(state0)
    np.asarray(render(params0))  # warm-up compile
    t3 = time.perf_counter()
    state1 = decompress_state_dict(out_dir, stream)
    params1 = params_from_state_dict(state1)
    dec_img = np.asarray(render(params1))
    t4 = time.perf_counter()

    mse = float(np.mean((np.asarray(dec_img, np.float64)
                         - np.asarray(img, np.float64)) ** 2))
    decoded = float(10.0 * np.log10(1.0 / max(mse, 1e-12)))
    # achieved rate from XLA's own cost model over the executed fit
    # programs (FitResult.flops) — makes the BASELINE.md shape-ceiling
    # claim auditable from the bench artifact alone (VERDICT r3 weak #5)
    fit_tflops = (
        round(res.flops / res.wall_seconds / 1e12, 2)
        if res.flops else None
    )
    out = {
        "tag": tag, "steps": steps,
        "fit_gflop_total": round(res.flops / 1e9, 1) if res.flops else None,
        "fit_achieved_tflops": fit_tflops,
        "fit_wall_s": round(res.wall_seconds, 3),
        "quant_wall_s": round(t1 - t0, 3),
        "code_wall_s": round(t2 - t1, 3),
        "decode_wall_s": round(t4 - t3, 3),
        "total_wall_s": round(res.wall_seconds + (t1 - t0) + (t2 - t1)
                              + (t4 - t3), 3),
        "fit_psnr": round(fit_psnr, 2),
        "quant_psnr": round(qpsnr, 2),
        "decoded_psnr": round(decoded, 2),
        "bytes": nbytes,
    }
    print(json.dumps(out), file=sys.stderr, flush=True)
    return out


def main(kv) -> None:
    from implicit_image_tpu.data import stable_seed
    from implicit_image_tpu.sparsity import MaskingConfig

    h = w = 512
    # img=<name> selects the named benchmark stand-in (same content the
    # finals ladders use: deterministic synthetic keyed by image name)
    seed = stable_seed(kv["img"]) if "img" in kv else 0
    img = synthetic_image(h, w, seed=seed)
    grid = get_grid(h, w)
    report = {}
    budgets = tuple(int(x) for x in kv.get("budgets", "1000,1500,2000").split(","))
    stream = kv.get("stream", "zstd")

    # 1) the quality bar: the reference operating point end-to-end
    # (re-measure, or reuse a prior run's numbers via bar_db=/bar_bytes=)
    if "bar_db" in kv:
        bar, bar_bytes = float(kv["bar_db"]), int(kv["bar_bytes"])
    else:
        s_def, s_cfg = build_model("siren", depth=8, hidden_size=128)
        ref = full_protocol("siren_ref", s_def, s_cfg, grid, img, 2000,
                            OptimConfig(), "outputs/ttq/siren_ref",
                            stream=stream)
        report["reference_point"] = ref
        bar, bar_bytes = ref["decoded_psnr"], ref["bytes"]

    # 2) candidate flagship configs: complete protocol per (width,
    # density, budget)
    widths = [int(x) for x in kv.get("widths", "128").split(",")]
    density = float(kv.get("density", 1.0))
    masking = None
    if density < 1.0:
        masking = MaskingConfig(density=density)
    # flagship optimizer overrides: schedule=cosine warmup=50 lr=3e-4
    flag_optim = OptimConfig(
        lr=float(kv.get("lr", 3e-4)),
        lr_schedule=kv.get("schedule", "step"),
        lr_warmup=int(kv.get("warmup", 0)),
    )
    report["candidates"] = []
    for width in widths:
        c_def, c_cfg = build_model(
            "coordx", depth=8, hidden_size=width,
            split_depth=int(kv.get("split", 4)),
        )
        for b in budgets:
            tag = f"coordx_w{width}_d{density}_b{b}_{flag_optim.lr_schedule}"
            r = full_protocol(
                tag, c_def, c_cfg, grid, img, int(b),
                flag_optim, f"outputs/ttq/{tag}",
                stream=stream, masking_cfg=masking,
                quant_lr=(float(kv["quant_lr"])
                          if kv.get("quant_lr") else None),
            )
            r["meets_bar"] = bool(r["decoded_psnr"] >= bar
                                  and r["bytes"] <= bar_bytes)
            report["candidates"].append(r)

    report["quality_bar_decoded_db"] = bar
    report["quality_bar_bytes"] = bar_bytes
    print(json.dumps(report))


if __name__ == "__main__":
    main(dict(a.split("=", 1) for a in sys.argv[1:]))
