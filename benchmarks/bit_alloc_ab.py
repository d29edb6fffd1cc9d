#!/usr/bin/env python
"""A/B: uniform 8-bit codebooks vs automatic per-layer bit allocation
(quant.bit_alloc=auto, quant/allocate.py) on the real finals protocol.

For each configuration the COMPLETE pipeline runs twice from the same
fitted params: (A) every layer at quant.bits, the reference's scheme;
(B) the allocation chosen by the Lagrangian search. Both sides get the
same 100-step codebook finetune and the same container/backend, and the
comparison is on DECODED PSNR vs real container bytes.

Usage:
  python benchmarks/bit_alloc_ab.py [img=flower] [stream=auto]
         [configs=siren,coordx]
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

from implicit_image_tpu.coding import (  # noqa: E402
    compress_state_dict,
    decompress_state_dict,
    linear_state_dict,
    params_from_state_dict,
)
from implicit_image_tpu.data import get_grid, stable_seed, synthetic_image  # noqa: E402
from implicit_image_tpu.models import build_model  # noqa: E402
from implicit_image_tpu.quant import QuantConfig  # noqa: E402
from implicit_image_tpu.quant.allocate import allocate_bits  # noqa: E402
from implicit_image_tpu.sparsity import MaskingConfig  # noqa: E402
from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit  # noqa: E402
from implicit_image_tpu.training.quant_phase import quant_finetune  # noqa: E402


def decoded_psnr(out_dir, stream, mdef, mcfg, grid, img):
    state = decompress_state_dict(out_dir, stream)
    params = params_from_state_dict(state)
    dec = np.asarray(jax.jit(lambda p: mdef.apply(p, grid, mcfg))(params))
    mse = float(np.mean((dec.astype(np.float64) - np.asarray(img, np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def run_side(tag, mdef, mcfg, grid, img, params, masks, qcfg, optim_cfg,
             stream, out_dir):
    t0 = time.perf_counter()
    qres = quant_finetune(params, img, mdef, mcfg, grid, qcfg, optim_cfg,
                          masks=masks)
    state = linear_state_dict(qres.params, qres.codebooks, half="auto")
    nbytes = compress_state_dict(state, out_dir, stream)
    wall = time.perf_counter() - t0
    db = decoded_psnr(out_dir, stream, mdef, mcfg, grid, img)
    row = {"tag": tag, "decoded_db": round(db, 3), "bytes": nbytes,
           "wall_s": round(wall, 2),
           "bits_per_layer": list(qcfg.bits_per_layer)
           if qcfg.bits_per_layer else None}
    print(json.dumps(row), file=sys.stderr, flush=True)
    return row


def main(kv):
    h = w = 512
    seed = stable_seed(kv["img"]) if "img" in kv else 0
    img = synthetic_image(h, w, seed=seed)
    grid = get_grid(h, w)
    stream = kv.get("stream", "auto")
    report = {"img_seed": seed, "stream": stream, "pairs": []}

    configs = kv.get("configs", "siren,coordx").split(",")
    for name in configs:
        if name == "siren":
            mdef, mcfg = build_model("siren", depth=8, hidden_size=128)
            steps, masking, optim_cfg = 2000, None, OptimConfig()
        elif name == "coordx":
            # the flagship operating point (bench.py)
            mdef, mcfg = build_model("coordx", depth=8, hidden_size=96,
                                     split_depth=5)
            steps, masking = 1200, MaskingConfig(density=0.85)
            optim_cfg = OptimConfig()
        else:
            raise SystemExit(f"unknown config {name}")

        res = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
                  TrainConfig(num_steps=steps, log_steps=steps // 4),
                  optim_cfg, masking)
        masks = res.mask_state.masks if res.mask_state is not None else None
        base_q = QuantConfig(bits=8, num_steps=100, log_steps=100)

        a = run_side(f"{name}_uniform8", mdef, mcfg, grid, img, res.params,
                     masks, base_q, optim_cfg, stream,
                     f"outputs/bit_alloc/{name}_uniform8")

        t0 = time.perf_counter()
        rep = allocate_bits(mdef, mcfg, res.params, grid, img, base_q)
        search_s = time.perf_counter() - t0
        import dataclasses

        auto_q = dataclasses.replace(base_q,
                                     bits_per_layer=rep.bits_per_layer)
        b = run_side(f"{name}_auto", mdef, mcfg, grid, img, res.params,
                     masks, auto_q, optim_cfg, stream,
                     f"outputs/bit_alloc/{name}_auto")
        pair = {
            "config": name, "uniform": a, "auto": b,
            "search_wall_s": round(search_s, 2),
            "chosen_uniform": rep.chosen_uniform,
            "delta_db": round(b["decoded_db"] - a["decoded_db"], 3),
            "rate_saving_pct": round(100.0 * (1 - b["bytes"] / a["bytes"]), 2),
        }
        report["pairs"].append(pair)
        print(json.dumps(pair), file=sys.stderr, flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main(dict(a.split("=", 1) for a in sys.argv[1:]))
