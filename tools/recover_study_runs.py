#!/usr/bin/env python
"""Recover ladder member run-store entries from a study log.

The r4 weight-removal ladders for RigL and SNFS wrote their member run
dirs under ONE shared root (fixed in parallel/ladder.py:cli — roots now
carry the masking name), so the Pruning ladder overwrote them. Every
member's decoded PSNR/bytes is in the study stdout log; this tool
re-materializes MINIMAL run-store entries (config.json + summary.json,
no bitstream) from those lines so the plots/tables render the full
study. Each entry records its provenance ("recovered_from").

Usage: python tools/recover_study_runs.py <study.log> [dest_root]
"""
from __future__ import annotations

import json
import re
import sys
from pathlib import Path

_LADDER = re.compile(r"masking=(\w+)")
_MEMBER = re.compile(
    r"^d=([\d.]+): fit=([\d.]+) dB quant=([\d.]+) dB "
    r"decoded=([\d.]+) dB bytes=(\d+)"
)


_SERIAL = re.compile(
    r"implicit_image_tpu\.compress img=\S+ masking=(\w+) "
    r"masking\.density=([\d.]+)"
)
_RESULT = re.compile(r"^RESULT PSNR=([\d.]+) COMPRESSED_BYTES=(\d+)")


def recover(log_path, dest_root="outputs/recovered"):
    method = None
    gmp = False
    serial = None  # (method, density) of the in-flight serial run
    n = 0
    for line in Path(log_path).read_text().splitlines():
        if "parallel.ladder" in line:
            m = _LADDER.search(line)
            method = m.group(1) if m else None
            gmp = "final_density=" in line
            serial = None
            continue
        ms = _SERIAL.search(line)
        # single runs only (multirun member dirs survive); `python -m
        # pkg.compress` is the module flag — multirun is `compress -m`
        if ms and "compress -m" not in line:
            serial = (ms.group(1), float(ms.group(2)))
            continue
        mr = _RESULT.match(line.strip())
        if mr and serial:
            run_dir = Path(dest_root) / f"{serial[0]}_d{serial[1]}"
            run_dir.mkdir(parents=True, exist_ok=True)
            (run_dir / "config.json").write_text(json.dumps({
                "masking": {"name": serial[0], "density": serial[1]},
                "recovered_from": str(log_path),
            }, indent=2))
            (run_dir / "summary.json").write_text(json.dumps({
                "PSNR": float(mr.group(1)),
                "Decoded PSNR": float(mr.group(1)),
                "Compressed Bytes": int(mr.group(2)),
                "recovered_from": str(log_path),
            }, indent=2))
            serial = None
            n += 1
            continue
        m = _MEMBER.match(line.strip())
        if not (m and method):
            continue
        d = float(m.group(1))
        run_dir = Path(dest_root) / f"{method}_d{d}"
        run_dir.mkdir(parents=True, exist_ok=True)
        masking = {"name": method, "density": 1.0 if gmp else d}
        if gmp:
            masking["final_density"] = d
        (run_dir / "config.json").write_text(json.dumps({
            "masking": masking,
            "recovered_from": str(log_path),
        }, indent=2))
        (run_dir / "summary.json").write_text(json.dumps({
            "PSNR": float(m.group(2)),
            "Quant PSNR": float(m.group(3)),
            "Decoded PSNR": float(m.group(4)),
            "Compressed Bytes": int(m.group(5)),
            "recovered_from": str(log_path),
        }, indent=2))
        n += 1
    print(f"recovered {n} member entries -> {dest_root}")


if __name__ == "__main__":
    recover(*sys.argv[1:])
