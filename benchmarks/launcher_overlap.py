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
sys.path.insert(0, str(REPO))


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


def run_inprocess(n_jobs: int, steps: int, widths: str, depths: str,
                  outdir: str, hw: int) -> float:
    """One cli() invocation in THIS process. Fairness across phases comes
    from disjoint member shapes (no jit-cache crossover) and a single
    device session (the tunneled runtime has multi-minute client-turnover
    delays that would swamp a subprocess A/B)."""
    from implicit_image_tpu.compress import cli

    argv = [
        "-m", "img=synthetic", f"img.height={hw}", f"img.width={hw}",
        f"mlp.hidden_size={widths}", f"mlp.depth={depths}",
        f"train.num_steps={steps}", f"train.log_steps={steps}",
        "masking=none", "quant=none", "entropy_coding=none",
        "logging.use=false", f"launcher.n_jobs={n_jobs}",
        f"output_dir={outdir}",
    ]
    t0 = time.perf_counter()
    cli(argv)
    return time.perf_counter() - t0


def main(kv) -> None:
    steps = int(kv.get("steps", 300))
    if kv.get("mode", "subprocess") == "inprocess":
        hw = int(kv.get("hw", 512))
        # warm the device session first: the tunneled runtime pays a
        # multi-minute acquisition delay on first use after another
        # client exits, which would land entirely on phase A
        import jax
        import jax.numpy as jnp

        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
        # disjoint shape sets of comparable cost per phase
        serial = run_inprocess(1, steps, kv.get("widths_a", "64,96"),
                               kv.get("depths_a", "4,6"),
                               "outputs/overlap_serial", hw)
        threaded = run_inprocess(2, steps, kv.get("widths_b", "72,104"),
                                 kv.get("depths_b", "5,7"),
                                 "outputs/overlap_threaded", hw)
        n_members = 4
    else:
        widths, depths = kv.get("widths", "64,96"), kv.get("depths", "4,6")
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
    main(dict(a.split("=", 1) for a in sys.argv[1:]))
