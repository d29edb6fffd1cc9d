"""Sparsity-method comparison plot (reference visualize/weight_removal.py).

PSNR vs density for RigL / SNFS / Pruning / Small-Dense / Feathermap
against the dense baseline (reference :104-149; observed plot range
13-45 dB, :139). Runs are read from the local store; run dirs encode
masking=<name> and masking.density=<d> overrides (scripts/sparsify.sh).
"""
from __future__ import annotations

import logging
import re
import sys
from collections import defaultdict
from pathlib import Path

from implicit_image_tpu.visualize.runs import collect_runs

log = logging.getLogger("implicit_image_tpu")

_METHOD = re.compile(r"masking=(\w+)")
_DENSITY = re.compile(r"density=([\d.]+)")


def gather(outputs_root="outputs"):
    table = defaultdict(list)
    dense_psnr = None
    for run in collect_runs(outputs_root, require=["PSNR"]):
        d = run["dir"]
        m = _METHOD.search(d)
        psnr = float(run.get("Quant PSNR", run["PSNR"]))
        if m is None or m.group(1) == "none":
            dense_psnr = psnr
            continue
        dens = _DENSITY.search(d)
        if dens:
            table[m.group(1)].append((float(dens.group(1)), psnr))
    return table, dense_psnr


def plot(outputs_root="outputs", out_path="outputs/plots/weight_removal.pdf"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    table, dense_psnr = gather(outputs_root)
    fig, ax = plt.subplots(figsize=(6, 4))
    for method, pts in sorted(table.items()):
        dens, psnr = zip(*sorted(pts))
        ax.plot(dens, psnr, marker="o", label=method)
    if dense_psnr is not None:
        ax.axhline(dense_psnr, linestyle="--", color="k", label="Dense")
    ax.set_xlabel("Density")
    ax.set_ylabel("PSNR (dB)")
    ax.legend()
    ax.grid(alpha=0.3)
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    print("wrote", plot(args.get("outputs_root", "outputs"),
                        args.get("out", "outputs/plots/weight_removal.pdf")))
