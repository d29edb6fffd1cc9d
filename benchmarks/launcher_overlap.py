#!/usr/bin/env python
"""Compile-overlap A/B: serial vs threaded multirun launcher.

VERDICT r2 item 5: heterogeneous-shape sweeps (width x depth) re-pay a
full XLA compile per member with zero overlap under the serial launcher.
`launcher.n_jobs=2` (compress.py cli) runs members on worker threads: one
member's device execution overlaps the next member's host-side compile.

This A/B runs the SAME width x depth member set twice (serial, then
n_jobs=2) in subprocesses (fresh process = cold jit cache, the honest
setting) and reports the wall ratio.

Usage: python benchmarks/launcher_overlap.py [steps=300] [members=4]
"""
from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(n_jobs: int, steps: int, widths: str, depths: str, outdir: str) -> float:
    argv = [
        sys.executable, "-m", "implicit_image_tpu.compress", "-m",
        "img=synthetic", "img.height=256", "img.width=256",
        f"mlp.hidden_size={widths}", f"mlp.depth={depths}",
        f"train.num_steps={steps}", f"train.log_steps={steps}",
        "masking=none", "quant=none", "entropy_coding=none",
        "logging.use=false", f"launcher.n_jobs={n_jobs}",
        f"output_dir={outdir}",
    ]
    t0 = time.perf_counter()
    p = subprocess.run(argv, cwd=REPO, capture_output=True, text=True)
    wall = time.perf_counter() - t0
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-2000:])
    return wall


def main(steps=300, widths="64,96", depths="4,6") -> None:
    n_members = len(widths.split(",")) * len(depths.split(","))
    serial = run(1, steps, widths, depths, "outputs/overlap_serial")
    threaded = run(2, steps, widths, depths, "outputs/overlap_threaded")
    print(json.dumps({
        "members": n_members,
        "steps": steps,
        "serial_wall_s": round(serial, 1),
        "threaded_wall_s": round(threaded, 1),
        "speedup": round(serial / threaded, 2),
    }))


if __name__ == "__main__":
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    main(int(kv.get("steps", 300)), kv.get("widths", "64,96"),
         kv.get("depths", "4,6"))
