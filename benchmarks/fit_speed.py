"""Fit-speed study: XLA vs fused-Pallas path across model widths.

Timing methodology: the whole fit is ONE compiled scan (training/fit.py),
so per-step time is pure device compute — per-dispatch microbenchmarks are
unreliable on tunneled TPU runtimes (dispatch latency ~1-2 ms dominates,
and block_until_ready can return before remote execution finishes).

Measured v5e findings this harness reproduces (see also BASELINE.md):
  * a K=N=128 dot sustains ~25 TFLOPS (one MXU pipeline); K=512 ~70 TFLOPS
    — model width sets the MXU rate, so the w=128 reference operating
    point is shape-limited, and XLA fp32 + fast_sin is already at that
    ceiling (~135 steps/s at 512², d8 w128).
  * the fused Pallas kernel pays a rematerialized forward in backward
    (240 vs XLA's 180 GFLOP/step) — it matches XLA at w=512 and trails at
    w=128; hence TrainConfig.use_pallas defaults to False.

Usage: python benchmarks/fit_speed.py [steps]
"""
from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root, so `python benchmarks/x.py` works

import jax
import numpy as np

from implicit_image_tpu.data import get_grid, synthetic_image
from implicit_image_tpu.models import build_model
from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit


def main(steps: int = 200) -> None:
    h = w = 512
    img = synthetic_image(h, w, seed=0)
    grid = get_grid(h, w)
    print(f"device={jax.devices()[0].device_kind} image={h}x{w} steps={steps}")
    for width in (128, 256, 512):
        mdef, mcfg = build_model("siren", depth=8, hidden_size=width)
        # 3x forward FLOPs per train step (fwd + dA + dW)
        gflop_step = 3 * 2 * h * w * (2 * width + (mcfg.depth - 2) * width**2 + width * 3) / 1e9
        for use_pallas in (False, True):
            res = fit(
                jax.random.PRNGKey(0),
                mdef,
                mcfg,
                grid,
                img,
                TrainConfig(num_steps=steps, log_steps=steps, use_pallas=use_pallas),
                OptimConfig(),
            )
            sps = steps / res.wall_seconds
            psnr = np.asarray(res.metrics["psnr"])
            psnr = float(psnr[~np.isnan(psnr)][-1])
            path = "pallas" if use_pallas else "xla   "
            print(
                f"  w={width:4d} {path}: {sps:7.1f} steps/s  "
                f"{gflop_step * sps / 1e3:6.1f} TFLOPS-eff  psnr@{steps}={psnr:.2f}"
            )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
