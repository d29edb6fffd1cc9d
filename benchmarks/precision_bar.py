#!/usr/bin/env python
"""Multi-seed precision bar — VERDICT r4 item 5.

The bench quality bar (the reference operating point at tensorfloat32:
SIREN d8/w128, 2000 full-grid steps, kmeans-8, zstd) was defined off ONE
seed per precision arm in round 4. This runs the complete protocol for
>=5 seeds x {explicit-bfloat16 (1 MXU pass), tensorfloat32 (3),
float32 (6)} as three vmapped programs (5 lanes = 5 PRNG folds of the
same protocol image), reporting the per-seed decoded PSNR/bytes
distribution. The bar is then the tf32 MEDIAN, and the f32-vs-tf32
distribution answers whether 6 passes buy anything the 3-pass recipe
does not (round 4's single-seed reading said no: 52.02 f32 fit vs
58.1 tf32 was trajectory variance — this measures it).

Usage: python benchmarks/precision_bar.py [seeds=5] [steps=2000]
Writes one JSON line per arm to stderr and a summary JSON to stdout +
outputs/bench/precision_bar.json.
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

from implicit_image_tpu.data import get_grid, synthetic_image  # noqa: E402
from implicit_image_tpu.models import build_model  # noqa: E402
from implicit_image_tpu.parallel.pipeline import batched_compress  # noqa: E402
from implicit_image_tpu.quant import QuantConfig  # noqa: E402
from implicit_image_tpu.training.fit import (  # noqa: E402
    OptimConfig,
    TrainConfig,
)

ARMS = ("bfloat16", "tensorfloat32", "float32")


def main(kv) -> None:
    n_seeds = int(kv.get("seeds", 5))
    steps = int(kv.get("steps", 2000))
    h = w = 512
    img = synthetic_image(h, w, seed=0)
    imgs = jnp.stack([img] * n_seeds)  # same image, per-lane PRNG folds
    grid = get_grid(h, w)
    mdef, mcfg = build_model("siren", depth=8, hidden_size=128)
    qcfg = QuantConfig(name="KMeans", bits=8, num_steps=100, log_steps=100)

    out = {"seeds": n_seeds, "steps": steps, "point": "siren_d8w128_512"}
    for prec in ARMS:
        t0 = time.perf_counter()
        results = batched_compress(
            jax.random.PRNGKey(0), mdef, mcfg, grid, imgs,
            TrainConfig(num_steps=steps, log_steps=steps, pixel_chunks=4,
                        matmul_precision=prec),
            OptimConfig(), None, qcfg,
            stream_name="zstd",
            stream_root=str(REPO / f"outputs/bench/precision_bar/{prec}"),
        )
        wall = time.perf_counter() - t0
        arm = {
            "fit_psnr_db": [round(r.psnr, 2) for r in results],
            "decoded_db": [round(r.decoded_psnr, 2) for r in results],
            "bytes": [r.compressed_bytes for r in results],
            "decoded_median_db": round(
                float(np.median([r.decoded_psnr for r in results])), 2),
            "decoded_min_db": round(
                float(min(r.decoded_psnr for r in results)), 2),
            "decoded_max_db": round(
                float(max(r.decoded_psnr for r in results)), 2),
            "bytes_median": int(
                np.median([r.compressed_bytes for r in results])),
            "wall_s_incl_compile": round(wall, 1),
        }
        out[prec] = arm
        print(json.dumps({"arm": prec, **arm}), file=sys.stderr, flush=True)

    (REPO / "outputs/bench/precision_bar.json").write_text(
        json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main(dict(a.split("=", 1) for a in sys.argv[1:]))
