#!/usr/bin/env python
"""Render the weight-removal study table (BASELINE.md markdown) + plot
from the run store — the reference's sparsify.sh study
(visualize/weight_removal.py:104-149) with decoded-from-bitstream PSNR
and rate columns the reference never had.

Usage: python tools/weight_removal_table.py [outputs_root]
"""
from __future__ import annotations

import json
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from implicit_image_tpu.visualize.runs import collect_runs  # noqa: E402
from implicit_image_tpu.visualize.weight_removal import _classify  # noqa: E402


def gather_full(outputs_root="outputs"):
    """{method: {density: (decoded_psnr, bytes)}} + dense (psnr, bytes).
    Latest run wins on (method, density) collisions (e.g. a serial
    cross-check superseded by the ladder member)."""
    table = defaultdict(dict)
    dense = None
    for run in collect_runs(outputs_root, require=["PSNR"]):
        # the study is the SIREN protocol — a wavelet_siren RigL run in
        # the store must not masquerade as a SIREN study row
        mlp = (run.get("config") or {}).get("mlp") or {}
        if mlp.get("name", "siren") != "siren":
            continue
        psnr = run.get("Decoded PSNR", run.get("Quant PSNR", run["PSNR"]))
        nbytes = run.get("Compressed Bytes")
        method, density = _classify(run)
        if method == "none":
            # the study's dense control is the PROTOCOL run (w128 d8,
            # multiplier 5) — don't let width×depth grid members or other
            # masking=none runs in the store masquerade as it
            cfg = run.get("config") or {}
            mlp = cfg.get("mlp") or {}
            tr = cfg.get("train") or {}
            # reject only on POSITIVE evidence of a non-protocol config
            if (int(mlp.get("hidden_size", 128)) == 128
                    and int(mlp.get("depth", 8)) == 8
                    and int(tr.get("multiplier", 5)) == 5):
                dense = (float(psnr), nbytes)
            continue
        if density is not None:
            table[method][round(float(density), 4)] = (float(psnr), nbytes)
    return table, dense


def main(outputs_root="outputs"):
    table, dense = gather_full(outputs_root)
    densities = sorted({d for m in table.values() for d in m})
    methods = ["RigL", "SNFS", "Pruning", "Small_Dense", "Feathermap"]
    print("| method \\ density | " + " | ".join(str(d) for d in densities)
          + " |")
    print("|---|" + "---|" * len(densities))
    for m in methods:
        row = []
        for d in densities:
            v = table.get(m, {}).get(d)
            row.append(f"{v[0]:.2f} ({(v[1] or 0)/1024:.1f} KB)" if v
                       else "—")
        print(f"| {m} | " + " | ".join(row) + " |")
    if dense:
        kb = f" @ {dense[1]/1024:.1f} KB" if dense[1] else ""
        print(f"\nDense control: {dense[0]:.2f} dB{kb}")

    from implicit_image_tpu.visualize.weight_removal import plot

    out = plot(outputs_root, "outputs/plots/weight_removal.pdf")
    print(f"plot: {out}")


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
