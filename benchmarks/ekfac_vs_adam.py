"""EKFAC vs Adam at the reference operating point — one measured data
point justifying the live preconditioner (reference optim/ekfac.py is
orphaned dead code; ours is reachable via optim.preconditioner=ekfac).

Runs SIREN d8/w128 on a 512^2 synthetic image for the same step budget
with Adam and with Adam+EKFAC, reporting PSNR and wall-clock.

    python benchmarks/ekfac_vs_adam.py [steps=2000]
"""
from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root, so `python benchmarks/x.py` works

import numpy as np

import jax

from implicit_image_tpu.data import get_grid, synthetic_image
from implicit_image_tpu.models import build_model
from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit


def run(steps: int = 2000, h: int = 512) -> dict:
    img = synthetic_image(h, h, seed=0)
    grid = get_grid(h, h)
    mdef, mcfg = build_model("siren", depth=8, hidden_size=128)
    out = {}
    for label, ocfg in [
        ("adam", OptimConfig()),
        ("adam+ekfac", OptimConfig(preconditioner="ekfac")),
        ("adam+ekfac/50", OptimConfig(preconditioner="ekfac", precond_interval=50)),
    ]:
        res = fit(
            jax.random.PRNGKey(0), mdef, mcfg, grid, img,
            # EKFAC's on-device eigendecompositions run ~8x slower per step
            # at 512^2; segment so no single execution exceeds the
            # runtime's ~60 s wall budget (BASELINE.md runtime caveat)
            TrainConfig(num_steps=steps, log_steps=max(steps // 4, 1),
                        segment_steps=min(500, steps)),
            ocfg,
        )
        p = np.asarray(res.metrics["psnr"])
        out[label] = {
            "psnr": float(p[~np.isnan(p)][-1]),
            "wall_s": round(res.wall_seconds, 3),
            "steps_per_s": round(steps / res.wall_seconds, 1),
        }
        print(label, out[label])
    return out


if __name__ == "__main__":
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    run(int(kv.get("steps", 2000)), int(kv.get("h", 512)))
