#!/usr/bin/env python
"""A/B: quant.delta residual coding vs absolute coding on the warm flagship.

Question: with a meta-learned warm start (assets/meta/coordx_s5w96_512.npz
as shared encoder/decoder state), does clustering + coding the RESIDUAL
w - w_meta beat the absolute quantizer on (decoded PSNR, container bytes)?

Hypothesis: after a short warm fit the weights stay near the artifact, so
residuals are tightly peaked around 0 — the k-means codebook spends its
2^bits - 1 levels on a narrower support (finer quantization at the same
label rate), and the label stream may also skew (cheaper entropy). The
artifact itself costs ZERO bitstream bytes per image (it is amortized
shared state, like the decoder binary), but this is only honest for a
fleet of images sharing one artifact — stated as such in BASELINE.md.

Protocol: the bench.py flagship (CoordX s5/w96, RigL d=0.85, warm from
the committed artifact, kmeans-8 + auto coding) on the three benchmark
stand-in seeds, delta vs absolute, same fit (the fit is identical — only
the quant/coding stage differs).

Usage: python benchmarks/delta_ab.py [steps=1000] [seeds=0,1,2]
"""
from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "benchmarks"))

from time_to_quality import full_protocol  # noqa: E402

from implicit_image_tpu.data import get_grid, synthetic_image  # noqa: E402
from implicit_image_tpu.models import build_model  # noqa: E402
from implicit_image_tpu.sparsity import MaskingConfig  # noqa: E402
from implicit_image_tpu.training.fit import OptimConfig  # noqa: E402
from implicit_image_tpu.training.metainit import load_meta_init  # noqa: E402


def main() -> None:
    steps, seeds = 1000, (0, 1, 2)
    for a in sys.argv[1:]:
        k, v = a.split("=")
        if k == "steps":
            steps = int(v)
        elif k == "seeds":
            seeds = tuple(int(s) for s in v.split(","))

    h = w = 512
    grid = get_grid(h, w)
    mdef, mcfg = build_model("coordx", depth=8, hidden_size=96, split_depth=5)
    art = REPO / "assets/meta/coordx_s5w96_512.npz"
    meta_params = load_meta_init(art, "coordx", mcfg)
    delta_info = {
        "artifact": str(art),
        "sha256": hashlib.sha256(art.read_bytes()).hexdigest(),
    }

    rows = []
    for seed in seeds:
        img = synthetic_image(h, w, seed=seed)
        common = dict(
            log_steps=steps, stream="auto",
            masking_cfg=MaskingConfig(density=0.85),
            init_params=meta_params,
        )
        a = full_protocol(
            f"abs_s{seed}", mdef, mcfg, grid, img, steps, OptimConfig(),
            f"outputs/bench/delta_ab/abs_s{seed}", **common,
        )
        d = full_protocol(
            f"delta_s{seed}", mdef, mcfg, grid, img, steps, OptimConfig(),
            f"outputs/bench/delta_ab/delta_s{seed}",
            delta_info=delta_info, **common,
        )
        rows.append({
            "seed": seed,
            "abs_db": a["decoded_psnr"], "abs_bytes": a["bytes"],
            "delta_db": d["decoded_psnr"], "delta_bytes": d["bytes"],
            "d_db": round(d["decoded_psnr"] - a["decoded_psnr"], 3),
            "d_rate_pct": round(
                100.0 * (d["bytes"] - a["bytes"]) / a["bytes"], 2
            ),
        })
        print(json.dumps(rows[-1]), flush=True)

    wins = sum(
        1 for r in rows if r["d_db"] >= 0 and r["d_rate_pct"] <= 0
        and (r["d_db"] > 0 or r["d_rate_pct"] < 0)
    )
    print(json.dumps({
        "summary": "delta dominates" if wins == len(rows) else
                   f"delta dominates on {wins}/{len(rows)} seeds",
        "mean_d_db": round(float(np.mean([r["d_db"] for r in rows])), 3),
        "mean_d_rate_pct": round(
            float(np.mean([r["d_rate_pct"] for r in rows])), 2
        ),
    }), flush=True)


if __name__ == "__main__":
    main()
