"""Large-image scaling: 1024² and 2048² fits on one chip.

The reference protocol stops at 512² (conf/img/*.yaml resize geometry);
this harness shows the same one-compile fit scales to larger grids on a
single v5e, using `TrainConfig.pixel_chunks` (in-graph gradient
accumulation over coordinate chunks, bit-equivalent to full-batch MSE
gradients — training/fit.py) to bound activation HBM where the full grid
would not fit.

2048² is run ONLY with pixel_chunks: the full-grid activation footprint
(4.2 Mpix × width × depth × 4 B + backward) exceeds v5e HBM, and on the
axon runtime an HBM OOM crashes the worker rather than raising.

Usage: python benchmarks/large_image.py [steps] [kv: sizes=1024,2048]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import numpy as np

from implicit_image_tpu.data import get_grid, synthetic_image
from implicit_image_tpu.models import build_model
from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit


def run_one(tag, mdef, mcfg, h, steps, pixel_chunks=1):
    img = synthetic_image(h, h, seed=0)
    grid = get_grid(h, h)
    cfg = TrainConfig(num_steps=steps, log_steps=max(steps // 2, 1),
                      pixel_chunks=pixel_chunks)
    t0 = time.time()
    res = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img, cfg,
              OptimConfig())
    wall_total = time.time() - t0
    p = np.asarray(res.metrics["psnr"]).reshape(-1)
    p = p[np.isfinite(p)]
    out = {
        "tag": tag, "size": h, "steps": steps, "pixel_chunks": pixel_chunks,
        "exec_wall_s": round(res.wall_seconds, 3),
        "total_wall_s": round(wall_total, 3),
        "steps_per_s": round(steps / res.wall_seconds, 2),
        "mpix_steps_per_s": round(h * h * steps / res.wall_seconds / 1e6, 1),
        "psnr_db": round(float(p[-1]), 2) if p.size else None,
    }
    print(json.dumps(out), flush=True)
    return out


def main(argv) -> None:
    steps = int(argv[1]) if len(argv) > 1 and argv[1].isdigit() else 300
    kv = dict(a.split("=", 1) for a in argv[1:] if "=" in a)
    sizes = [int(s) for s in kv.get("sizes", "1024,2048").split(",")]
    print(f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    for h in sizes:
        # bound activation memory to roughly the 512²-full-grid footprint
        chunks = max((h // 512) ** 2 // 2, 1) if h > 1024 else 1
        for name, kwargs in (("siren", dict(depth=8, hidden_size=128)),
                             ("coordx", dict(depth=8, hidden_size=96,
                                             split_depth=4))):
            mdef, mcfg = build_model(name, **kwargs)
            run_one(f"{name}_{h}", mdef, mcfg, h, steps,
                    pixel_chunks=chunks)


if __name__ == "__main__":
    main(sys.argv)
