"""Concurrent-fit throughput: vmap-batched fits per chip.

The TPU-native replacement for the reference's one-GPU-job-per-image sweep
model (Hydra multirun / SLURM arrays, SURVEY.md §2.8): B full fits compile
into ONE program and run concurrently on one chip. BASELINE.md tracks
"≥64 simultaneous fits" as a north-star target.

Images are smaller here (the sweep workloads fit many small/medium crops);
batching amortizes nothing FLOP-wise (K=128 dots are shape-limited, see
benchmarks/fit_speed.py) but removes all per-job dispatch/compile/host
overhead, which dominates the reference's sweep wall-clock.

Usage: python benchmarks/batched_throughput.py [B] [side] [steps] [precision]
(`precision` = tensorfloat32 | float32 | bfloat16 | none; default
tensorfloat32 — the r5 pipeline default, BASELINE.md "Matmul pass
precision". Prints a JSON line for provenance stamping.)
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root, so `python benchmarks/x.py` works

import jax
import numpy as np

from implicit_image_tpu.data import get_grid, synthetic_image
from implicit_image_tpu.models import build_model
from implicit_image_tpu.parallel.batched import batched_fit
from implicit_image_tpu.training.fit import OptimConfig, TrainConfig


def main(b: int = 64, side: int = 256, steps: int = 500,
         precision: str = "tensorfloat32") -> None:
    prec = None if precision in ("none", "null", "") else precision
    img_batch = np.stack([synthetic_image(side, side, seed=s) for s in range(b)])
    grid = get_grid(side, side)
    mdef, mcfg = build_model("siren", depth=8, hidden_size=128)
    res = batched_fit(
        jax.random.PRNGKey(0),
        mdef,
        mcfg,
        grid,
        img_batch,
        TrainConfig(num_steps=steps, log_steps=steps, pixel_chunks=8,
                    matmul_precision=prec),
        OptimConfig(),
    )
    psnr = np.asarray(res.metrics["psnr"])  # (B, steps)
    final = psnr[:, -1]
    wall = res.wall_seconds
    print(
        f"device={jax.devices()[0].device_kind} B={b} {side}x{side} steps={steps} "
        f"precision={prec}: {wall:.2f}s total = {wall / b * 1000:.1f} ms/fit "
        f"({b * steps / wall:.0f} fit-steps/s, {b * steps * side * side / wall / 1e6:.0f} Mpix-steps/s)",
        file=sys.stderr,
    )
    print(f"final PSNR mean={final.mean():.2f} min={final.min():.2f} dB",
          file=sys.stderr)
    print(json.dumps({
        "b": b, "side": side, "steps": steps, "precision": precision,
        "total_wall_s": round(wall, 2),
        "s_per_fit": round(wall / b, 3),
        "psnr_mean_db": round(float(final.mean()), 2),
        "psnr_min_db": round(float(final.min()), 2),
        "date": time.strftime("%Y-%m-%d"),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    argv = sys.argv[1:]
    ints = [int(a) for a in argv[:3]]
    main(*ints, precision=argv[3] if len(argv) > 3 else "tensorfloat32")
