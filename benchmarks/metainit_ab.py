#!/usr/bin/env python
"""Meta-init A/B: does a REPTILE warm start cut time-to-quality?

Meta-trains a CoordX init over the synthetic family (seeds disjoint from
every evaluation image — training/metainit.py meta_pool), then runs the
COMPLETE per-image protocol (fit -> kmeans-8 finetune -> entropy code ->
decode, benchmarks/time_to_quality.full_protocol) cold vs warm across a
budget ladder on the protocol image. The meta artifact is one-time,
per-distribution encoder state (a codec's trained tables): its wall is
reported separately and amortizes over every image ever encoded.

Usage:
  python benchmarks/metainit_ab.py [budgets=400,600,800,1200] \
      [bar_db=54.49] [bar_bytes=99444] [outer=300] [inner=50] [outer_lr=0.2] \
      [pool=16] [img=<name>] [density=0.85] [save=outputs/meta/coordx.npz]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "benchmarks"))

from time_to_quality import full_protocol  # noqa: E402

from implicit_image_tpu.data import (  # noqa: E402
    get_grid,
    stable_seed,
    synthetic_image,
)
from implicit_image_tpu.models import build_model  # noqa: E402
from implicit_image_tpu.sparsity import MaskingConfig  # noqa: E402
from implicit_image_tpu.training.fit import OptimConfig  # noqa: E402
from implicit_image_tpu.training.metainit import (  # noqa: E402
    MetaConfig,
    meta_pool,
    meta_train,
    save_meta_init,
)


def main(kv) -> None:
    h = w = 512
    seed = stable_seed(kv["img"]) if "img" in kv else 0
    img = synthetic_image(h, w, seed=seed)
    grid = get_grid(h, w)
    budgets = tuple(
        int(x) for x in kv.get("budgets", "400,600,800,1200").split(",")
    )
    density = float(kv.get("density", 0.85))
    width = int(kv.get("width", 96))
    split = int(kv.get("split", 5))
    stream = kv.get("stream", "auto")

    mdef, mcfg = build_model(
        "coordx", depth=8, hidden_size=width, split_depth=split
    )

    meta_cfg = MetaConfig(
        pool_size=int(kv.get("pool", 16)),
        inner_steps=int(kv.get("inner", 50)),
        outer_steps=int(kv.get("outer", 300)),
        meta_batch=int(kv.get("batch", 4)),
        outer_lr=float(kv.get("outer_lr", 0.2)),
        chunk=int(kv.get("chunk", 25)),
    )
    pool = meta_pool(h, w, meta_cfg.pool_size)
    t0 = time.perf_counter()
    meta_params, losses, meta_wall = meta_train(
        mdef, mcfg, grid, pool, meta_cfg
    )
    print(
        f"[meta] trained in {meta_wall:.1f}s (+{time.perf_counter()-t0-meta_wall:.0f}s"
        f" compile), post-adapt loss {float(losses[0]):.2e} ->"
        f" {float(losses[-1]):.2e}",
        file=sys.stderr, flush=True,
    )
    if kv.get("save"):
        Path(kv["save"]).parent.mkdir(parents=True, exist_ok=True)
        save_meta_init(kv["save"], meta_params, mdef.name, mcfg)

    report = {
        "meta_wall_s": round(meta_wall, 2),
        "meta_cfg": {
            "pool": meta_cfg.pool_size, "inner": meta_cfg.inner_steps,
            "outer": meta_cfg.outer_steps, "batch": meta_cfg.meta_batch,
        },
        "rows": [],
    }
    bar_db = float(kv.get("bar_db", 0)) or None
    bar_bytes = int(kv.get("bar_bytes", 0)) or None
    if (bar_db is None) != (bar_bytes is None):
        # fail BEFORE the expensive meta-train, not at the first bar check
        raise ValueError("pass bar_db AND bar_bytes together (or neither)")
    if bar_db is None:
        s_def, s_cfg = build_model("siren", depth=8, hidden_size=128)
        ref = full_protocol("siren_ref", s_def, s_cfg, grid, img, 2000,
                            OptimConfig(), "outputs/meta_ab/siren_ref",
                            stream="zstd")
        bar_db, bar_bytes = ref["decoded_psnr"], ref["bytes"]
        report["reference_point"] = ref
    report["bar_db"], report["bar_bytes"] = bar_db, bar_bytes

    masking = MaskingConfig(density=density) if density < 1.0 else None
    for b in budgets:
        for warm, init in (("cold", None), ("warm", meta_params)):
            tag = f"coordx_s{split}w{width}_d{density}_b{b}_{warm}"
            r = full_protocol(
                tag, mdef, mcfg, grid, img, b, OptimConfig(),
                f"outputs/meta_ab/{tag}", stream=stream,
                masking_cfg=masking, init_params=init,
            )
            r["warm"] = warm == "warm"
            r["meets_bar"] = bool(
                r["decoded_psnr"] >= bar_db and r["bytes"] <= bar_bytes
            )
            report["rows"].append(r)
    print(json.dumps(report))


if __name__ == "__main__":
    main(dict(a.split("=", 1) for a in sys.argv[1:]))
