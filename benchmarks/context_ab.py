#!/usr/bin/env python
"""A/B: entropy-context layouts on REAL finals-ladder streams.

VERDICT r2 item 7 / round-1 open item 3: do per-tensor (or per-plane)
adaptive contexts beat the shipped format-2 scheme (per-tensor byte-plane
shuffle -> ONE stream -> `auto` backend picks smallest of zstd-22 / lzma /
huffman / order-1 range coder)?

Schemes measured on every decoded container under the given run roots
(all byte layouts are reversible permutations / segmentations of the SAME
tensor bytes, so decoded PSNR is identical by construction — only rate
can move):

  S0 current   per-tensor plane shuffle, single stream, auto
  S1 global-plane  format-3 candidate: concatenate plane-k bytes of ALL
               tensors before plane-k+1 (stats persist across tensors of
               the same plane kind), single stream, auto
  S2 per-tensor range  independent order-1 range stream per tensor
               (adaptive contexts reset at tensor boundaries) + u32 sizes
  S3 per-plane range   independent range stream per GLOBAL plane group

Prints a per-stream table + mean deltas, and exits 0. The verdict
(adopt/reject) is recorded in BASELINE.md.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from implicit_image_tpu.coding import (  # noqa: E402
    _tensor_planes as tensor_planes,
    read_raw_container,
)
from implicit_image_tpu.coding.parsers import encode_stream  # noqa: E402
from implicit_image_tpu.coding.range_coder import range_encode  # noqa: E402


def scheme_sizes(raw: dict) -> dict:
    per_tensor_shuffled = [b"".join(tensor_planes(a)) for a in raw.values()]
    s0_payload = b"".join(per_tensor_shuffled)

    # global plane grouping: all plane-0 runs, then all plane-1 runs, ...
    all_planes = [tensor_planes(a) for a in raw.values()]
    max_planes = max(len(p) for p in all_planes)
    s1_payload = b"".join(
        b"".join(p[k] for p in all_planes if len(p) > k)
        for k in range(max_planes)
    )

    sizes = {
        "s0_auto": len(encode_stream("auto", s0_payload)),
        "s1_globalplane_auto": len(encode_stream("auto", s1_payload)),
        "s0_range": len(encode_stream("range", s0_payload)),
        "s1_globalplane_range": len(encode_stream("range", s1_payload)),
        # independent adaptive contexts per tensor (reset at boundaries)
        "s2_pertensor_range": sum(
            len(range_encode(t)) + 4 for t in per_tensor_shuffled
        ),
        # independent contexts per global plane group
        "s3_perplane_range": sum(
            len(range_encode(b"".join(p[k] for p in all_planes if len(p) > k)))
            + 4
            for k in range(max_planes)
        ),
    }
    return sizes


def main(roots: list[str]) -> None:
    streams = []
    for root in roots:
        streams += sorted(Path(root).rglob("compressed_weights.data"))
    rows = []
    for s in streams:
        d = s.parent
        cfg = {}
        for up in (d.parent, d.parent.parent):
            c = up / "config.json"
            if c.exists():
                cfg = json.loads(c.read_text())
                break
        stream_name = (cfg.get("entropy_coding") or {}).get("stream_name", "auto")
        if stream_name == "none":
            stream_name = "auto"
        try:
            raw = read_raw_container(d, stream_name)
        except Exception as e:  # container from another backend name
            print(f"skip {d}: {e}", file=sys.stderr)
            continue
        sizes = scheme_sizes(raw)
        sizes["dir"] = str(d)
        sizes["shipped"] = s.stat().st_size
        rows.append(sizes)

    if not rows:
        print("no streams found", file=sys.stderr)
        sys.exit(1)

    keys = ["s0_auto", "s1_globalplane_auto", "s0_range",
            "s1_globalplane_range", "s2_pertensor_range", "s3_perplane_range"]
    print(f"{'stream':58s} shipped " + " ".join(f"{k[:18]:>20s}" for k in keys))
    for r in rows:
        name = "/".join(Path(r["dir"]).parts[-3:-1])
        print(f"{name:58s} {r['shipped']:7d} "
              + " ".join(f"{r[k]:20d}" for k in keys))
    base = np.array([r["s0_auto"] for r in rows], float)
    print("\nmean rate vs s0_auto (negative = smaller):")
    for k in keys[1:]:
        v = np.array([r[k] for r in rows], float)
        print(f"  {k:22s} {100.0 * np.mean(v / base - 1.0):+6.2f} %")
    print(json.dumps({"n_streams": len(rows)}))


if __name__ == "__main__":
    roots = sys.argv[1:] or [
        "outputs/finals_r2e_serial", "outputs/finals_cx", "outputs/finals_cx3",
    ]
    main(roots)
