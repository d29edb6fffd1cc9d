#!/usr/bin/env python
"""OOD stress A/B for the meta-init warm start (VERDICT r3 item 4).

The committed warm-start artifact was REPTILE-trained on the smooth
multi-frequency synthetic pool (training/metainit.py); the flagship
claim therefore carries a transfer step real images would expose. This
driver measures warm vs cold on deliberately out-of-distribution
stand-ins (data.synthetic_ood: 1/f "pink" spectrum, text-like glyph
strokes, white noise) at the flagship operating point, recording WHERE
warm loses so `train.init_path=auto`'s regime guard is grounded in
measurements, not only the in-distribution saturation curve.

Usage: python benchmarks/metainit_ood.py [budgets=1000] [kinds=pink,text,noise]
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "benchmarks"))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from implicit_image_tpu.data import get_grid, synthetic_ood  # noqa: E402
from implicit_image_tpu.models import build_model  # noqa: E402
from implicit_image_tpu.sparsity import MaskingConfig  # noqa: E402
from implicit_image_tpu.training.fit import OptimConfig  # noqa: E402
from implicit_image_tpu.training.metainit import load_meta_init  # noqa: E402
from time_to_quality import full_protocol  # noqa: E402


def main(kv) -> None:
    h = w = 512
    grid = get_grid(h, w)
    budgets = [int(x) for x in kv.get("budgets", "1000").split(",")]
    kinds = kv.get("kinds", "pink,text,noise").split(",")

    prec = kv.get("precision", "tensorfloat32")
    prec = None if prec in ("none", "null", "") else prec
    c_def, c_cfg = build_model("coordx", depth=8, hidden_size=96,
                               split_depth=5)
    # tf32 artifact since r5 (basins are precision-specific — metainit.py)
    meta_path = REPO / "assets/meta/coordx_s5w96_512_tf32.npz"
    meta_params = load_meta_init(meta_path, "coordx", c_cfg)
    masking = MaskingConfig(density=0.85)

    print(f"device={jax.devices()[0].device_kind}")
    report = []
    # shared program caches: warm/cold differ (init_params is baked into
    # the fit program), but each is ONE program across kinds x budgets
    cache_w, cache_c = {}, {}
    for kind in kinds:
        img = synthetic_ood(kind, h, w, seed=0)
        for b in budgets:
            warm = full_protocol(
                f"ood_{kind}_warm_b{b}", c_def, c_cfg, grid, img, b,
                OptimConfig(), f"outputs/bench/ood_{kind}_warm_b{b}",
                stream="auto", masking_cfg=masking,
                init_params=meta_params, matmul_precision=prec,
                program_cache=cache_w if len(budgets) == 1 else None,
            )
            cold = full_protocol(
                f"ood_{kind}_cold_b{b}", c_def, c_cfg, grid, img, b,
                OptimConfig(), f"outputs/bench/ood_{kind}_cold_b{b}",
                stream="auto", masking_cfg=masking, matmul_precision=prec,
                program_cache=cache_c if len(budgets) == 1 else None,
            )
            row = {
                "kind": kind, "budget": b,
                "warm_db": warm["decoded_psnr"], "warm_bytes": warm["bytes"],
                "cold_db": cold["decoded_psnr"], "cold_bytes": cold["bytes"],
                "warm_wins_quality": warm["decoded_psnr"] >= cold["decoded_psnr"],
                "warm_wins_rate": warm["bytes"] <= cold["bytes"],
            }
            report.append(row)
            print(json.dumps(row), flush=True)
    out = Path("outputs/bench/metainit_ood.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main(dict(a.split("=", 1) for a in sys.argv[1:]))
