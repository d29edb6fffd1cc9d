#!/usr/bin/env python
"""Precision annealing at the FLAGSHIP point — adopt-or-reject A/B.

The schedule (train.matmul_precision_early) measured dominant on the
cold strict SIREN (BASELINE.md "Precision schedule"), but the bench
flagship starts WARM from the tf32 meta artifact and delta-codes
against it — early 1-pass noise might erode the warm basin instead of
helping. This A/Bs {no schedule, switch 0.5, switch 0.75} at the full
flagship protocol (CoordX s5/w96, RigL d=0.85, b1200, warm + delta,
kmeans-8 row_stride=4, auto coding) on the three 512² stand-ins,
steady-state walls via shared program caches.

Adoption rule (same as every flagship promotion): the schedule ships in
bench.py only if it meets the bar-relevant quality/bytes on ALL
stand-ins and cuts the median wall.

Usage: python benchmarks/flagship_schedule_ab.py [steps=1200]
"""
from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "benchmarks"))

import jax  # noqa: E402

from implicit_image_tpu.data import (  # noqa: E402
    get_grid,
    stable_seed,
    synthetic_image,
)
from implicit_image_tpu.models import build_model  # noqa: E402
from implicit_image_tpu.sparsity import MaskingConfig  # noqa: E402
from implicit_image_tpu.training.fit import OptimConfig  # noqa: E402
from implicit_image_tpu.training.metainit import load_meta_init  # noqa: E402
from time_to_quality import full_protocol  # noqa: E402


def main(kv) -> None:
    steps = int(kv.get("steps", 1200))
    h = w = 512
    grid = get_grid(h, w)
    mdef, mcfg = build_model("coordx", depth=8, hidden_size=96,
                             split_depth=5)
    meta_path = REPO / "assets/meta/coordx_s5w96_512_tf32.npz"
    init_params = load_meta_init(meta_path, "coordx", mcfg)
    delta_info = {
        "artifact": str(meta_path),
        "sha256": hashlib.sha256(meta_path.read_bytes()).hexdigest(),
    }
    arms = {"none": (None, 0.75), "sw50": ("bfloat16", 0.5),
            "sw75": ("bfloat16", 0.75)}
    caches = {k: {} for k in arms}
    report = []
    print(f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    for name in ("flower", "big_building", "bridge"):
        seed = 0 if name == "flower" else stable_seed(name)
        img = synthetic_image(h, w, seed=seed)
        for arm, (early, frac) in arms.items():
            reps = 2 if name == "flower" else 1
            for rep in range(reps):
                r = full_protocol(
                    f"fsab_{name}_{arm}", mdef, mcfg, grid, img, steps,
                    OptimConfig(),
                    REPO / f"outputs/bench/flagship_sched/{name}_{arm}",
                    stream="auto", masking_cfg=MaskingConfig(density=0.85),
                    init_params=init_params, delta_info=delta_info,
                    matmul_precision="tensorfloat32",
                    matmul_precision_early=early,
                    matmul_precision_switch=frac,
                    program_cache=caches[arm], quant_row_stride=4,
                )
                row = {"img": name, "arm": arm, "rep": rep,
                       "total_wall_s": r["total_wall_s"],
                       "fit_wall_s": r["fit_wall_s"],
                       "decoded_db": r["decoded_psnr"], "bytes": r["bytes"]}
                report.append(row)
                print(json.dumps(row), flush=True)
    out = REPO / "outputs/bench/flagship_schedule_ab.json"
    out.write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main(dict(a.split("=", 1) for a in sys.argv[1:]))
