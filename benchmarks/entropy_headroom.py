#!/usr/bin/env python
"""Entropy-headroom probe: how much rate is left on the table by the
current `auto` backend over real containers? (NOTES.md open item 3.)

Three candidate directions, all measured against streams this repo
actually produced (any run dir with compressed_weights.data works):

  1. SEGMENTED STATIC tables — split the format-3 plane-grouped payload
     at plane/tensor boundaries, one static rANS-style table per segment,
     split points chosen by exact dynamic programming (the best any
     static-table coder could do, including header costs).
  2. ADAPTIVE coders — byte-serial Laplace-smoothed models (order-0,
     prev-nibble context, full order-1), fresh per plane segment: the
     achievable rate of an adaptive arithmetic/rANS coder, with the
     learning cost priced in (unlike the hindsight empirical entropy).
  3. FUNCTION-PRESERVING UNIT PERMUTATION — hidden units of an MLP can
     be reordered without changing the rendered image (columns of layer
     i + bias_i + rows of layer i+1 move together), so the encoder may
     canonicalize unit order for free; greedy nearest-neighbour ordering
     on label-row hamming distance measures the exploitable row
     similarity.

Measured on the finals/flagship streams (2026-08, v5e round 3; see
BASELINE.md "Entropy headroom — measured negative"):
  * DP-segmented static: ~+3% vs auto (static tables lose to lzma's
    adaptation even with oracle split points);
  * adaptive order-0/nibble/order-1 per plane: +1-2% / +2-3% / +7-12%
    vs auto — the order-1 hindsight bound (−4%) is unreachable because
    256 contexts cannot be learned inside a ~100 KB stream (same
    mechanism as the rejected per-tensor contexts, benchmarks/
    context_ab.py: +18.6%);
  * unit permutation: −0.02% (noise) — k-means label rows carry no
    adjacency structure an LZ backend could exploit.

Conclusion: the shuffle + plane-group + auto-backend scheme is within
~4% of a hindsight bound no realizable coder reaches; rate progress must
come from the payload (quantization, delta residuals), not the backend.

Usage: python benchmarks/entropy_headroom.py [dir=...] [stream=auto]
"""
from __future__ import annotations

import json
import re
import sys
from collections import OrderedDict
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import implicit_image_tpu.coding as coding  # noqa: E402
from implicit_image_tpu.coding import (  # noqa: E402
    compress_state_dict,
    read_raw_container,
)


def payload_and_segments(dir_name, stream):
    """Rebuild the format-3 payload and its plane-segment extents."""
    raw = read_raw_container(dir_name, stream)
    all_planes = [
        coding._tensor_planes(np.ascontiguousarray(a)) for a in raw.values()
    ]
    max_planes = max(len(p) for p in all_planes)
    chunks, plane_bounds, fine_bounds = [], [], [0]
    pos = 0
    for k in range(max_planes):
        start = pos
        for p in all_planes:
            if len(p) > k and len(p[k]):
                chunks.append(p[k])
                pos += len(p[k])
                fine_bounds.append(pos)
        plane_bounds.append((start, pos))
    return b"".join(chunks), plane_bounds, fine_bounds, raw


def h0_bits(counts: np.ndarray) -> float:
    n = counts.sum()
    if n == 0:
        return 0.0
    p = counts[counts > 0] / n
    return float(-(p * np.log2(p)).sum() * n)


def table_cost(counts: np.ndarray) -> int:
    # rANS-style header: n_syms (u16) + 3 bytes/present symbol + framing
    return 2 + 3 * int((counts > 0).sum()) + 16


def dp_segmented(buf: np.ndarray, bounds) -> float:
    """Optimal static-table segmentation over candidate boundaries."""
    n_seg = len(bounds) - 1
    pref = np.zeros((n_seg + 1, 256), np.int64)
    for j in range(n_seg):
        pref[j + 1] = pref[j] + np.bincount(
            buf[bounds[j]:bounds[j + 1]], minlength=256
        )
    best = [0.0] + [float("inf")] * n_seg
    for j in range(1, n_seg + 1):
        for i in range(max(0, j - 64), j):
            c = pref[j] - pref[i]
            cost = best[i] + h0_bits(c) / 8 + table_cost(c) + 4
            if cost < best[j]:
                best[j] = cost
    return best[n_seg]


def adaptive_cost(buf: np.ndarray, ctx_of, n_ctx: int, inc: int = 32) -> float:
    """Achievable bytes of a byte-serial adaptive model (Laplace init)."""
    counts = np.ones((n_ctx, 256), np.float64)
    totals = np.full(n_ctx, 256.0)
    bits, prev = 0.0, 0
    for b in buf:
        c = ctx_of(prev)
        bits += -np.log2(counts[c][b] / totals[c])
        counts[c][b] += inc
        totals[c] += inc
        if totals[c] > (1 << 16):
            counts[c] *= 0.5
            np.maximum(counts[c], 1.0, out=counts[c])
            totals[c] = counts[c].sum()
        prev = b
    return bits / 8


def permuted_bytes(raw: "OrderedDict[str, np.ndarray]", stream: str,
                   out_dir: str) -> int:
    """Greedy unit-reorder canonicalization (function-preserving), then
    re-encode. Chain topology: sequential MLP (columns of layer i + bias
    + rows of layer i+1); containers with non-sequential wiring (CoordX
    branches) are skipped by the caller."""
    layers: dict = {}
    for name in raw:
        m = re.match(r"layers\.(\d+)\.(.*)", name)
        layers.setdefault(int(m.group(1)), {})[m.group(2)] = np.array(
            raw[name]
        )
    idxs = sorted(layers)

    def wkey(d):
        return "labeled_weight" if "labeled_weight" in d else "weight"

    def greedy(rows: np.ndarray) -> np.ndarray:
        used = np.zeros(len(rows), bool)
        order = [0]
        used[0] = True
        for _ in range(len(rows) - 1):
            d = np.where(used, 1 << 30, (rows != rows[order[-1]]).sum(1))
            nxt = int(np.argmin(d))
            order.append(nxt)
            used[nxt] = True
        return np.array(order)

    for i in idxs[:-1]:
        nxt = layers[i + 1][wkey(layers[i + 1])]
        if layers[i][wkey(layers[i])].shape[1] != nxt.shape[0]:
            return -1  # non-sequential wiring; skip
        perm = greedy(nxt)
        layers[i][wkey(layers[i])] = layers[i][wkey(layers[i])][:, perm]
        layers[i]["bias"] = layers[i]["bias"][perm]
        layers[i + 1][wkey(layers[i + 1])] = nxt[perm, :]
    state = OrderedDict()
    for name in raw:  # keep the original key order
        m = re.match(r"layers\.(\d+)\.(.*)", name)
        state[name] = layers[int(m.group(1))][m.group(2)]
    return compress_state_dict(state, out_dir, stream)


def main(kv) -> None:
    run_dir = kv.get("dir", "outputs/bench/siren_ref")
    stream = kv.get("stream", "zstd")
    payload, plane_bounds, fine_bounds, raw = payload_and_segments(
        run_dir, stream
    )
    buf = np.frombuffer(payload, np.uint8)
    actual = (Path(run_dir) / "compressed_weights.data").stat().st_size

    report = {"dir": run_dir, "raw_bytes": len(buf), "actual_bytes": actual}
    cnt = np.bincount(buf, minlength=256)
    report["global_static_est"] = round(h0_bits(cnt) / 8 + table_cost(cnt))
    report["dp_segmented_static_est"] = round(dp_segmented(buf, fine_bounds))
    for tag, ctx_of, n_ctx in (
        ("adaptive_o0", lambda p: 0, 1),
        ("adaptive_nibble", lambda p: p >> 4, 16),
        ("adaptive_o1", lambda p: p, 256),
    ):
        report[tag] = round(sum(
            adaptive_cost(buf[s:e], ctx_of, n_ctx) for s, e in plane_bounds
        ))
    pb = permuted_bytes(raw, stream, "outputs/bench/entropy_headroom_perm")
    report["unit_permuted_bytes"] = pb if pb >= 0 else "skipped-nonsequential"
    for k in list(report):
        if isinstance(report[k], int) and k.endswith(("_est", "_o0", "_o1",
                                                      "nibble", "_bytes")):
            if k not in ("raw_bytes", "actual_bytes"):
                report[k + "_vs_actual_pct"] = round(
                    100.0 * (report[k] - actual) / actual, 2
                )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main(dict(a.split("=", 1) for a in sys.argv[1:]))
