#!/usr/bin/env python
"""A/B: inter-frame sequence coding vs independent per-frame coding.

Question: on a temporally-coherent sequence, what do P-frames (warm start
from the previous frame's decoded params + residual codebooks against
them — sequence.py) buy over encoding every frame independently at the
flagship operating point?

Protocol (v5e): synthetic 512² sequence (data.synthetic_video, name-salted
seed), CoordX s5/w96 + RigL d=0.85 + kmeans-8 + `auto` coding.

  * independent: every frame runs the full single-image protocol at
    `steps0` (the bench.py flagship budget), optionally warm from the
    committed meta artifact.
  * sequence: frame 0 identical to the independent run; frames 1..T-1
    are P-frames at `steps` (default steps0/4).

Reported per arm: total bytes, bytes/frame, mean decoded PSNR, encode
wall. The interesting numbers are the P-frame rate (residual codebooks on
inter-frame weight motion) and the P-frame wall (short warm fits, zero
compile after frame 1).

Usage: python benchmarks/sequence_ab.py [frames=6] [steps0=1200]
           [steps=300] [size=512] [video=seqbench] [warm=1] [motion=0.01]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from implicit_image_tpu.sequence import decode_sequence, encode_sequence  # noqa: E402


def main() -> None:
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    frames = int(kv.get("frames", 6))
    steps0 = int(kv.get("steps0", 1200))
    steps = int(kv.get("steps", 300))
    size = int(kv.get("size", 512))
    video = kv.get("video", "seqbench")
    motion = float(kv.get("motion", 0.01))
    warm = kv.get("warm", "1") not in ("0", "false")
    # plr: P-fit learning rate (sequence.lr) for the sequence arm; the
    # fresh-Adam transient at the full fit lr inflates the residual
    # support, so the P lr is its own A/B axis.
    plr = kv.get("plr")
    # arms=sequence (comma list) restricts which arms run — the
    # independent arms are deterministic, so an lr sweep re-runs only the
    # sequence arm and compares against previously recorded numbers.
    only = set(kv["arms"].split(",")) if "arms" in kv else None

    art = REPO / "assets/meta/coordx_s5w96_512.npz"
    base = [
        "img=synthetic", f"img.height={size}", f"img.width={size}",
        "mlp=coordx", "mlp.hidden_size=96", "mlp.split_depth=5",
        "masking=RigL", "masking.density=0.85",
        "quant=kmeans", "entropy_coding=auto",
        f"sequence.video={video}", f"sequence.frames={frames}",
        f"sequence.motion={motion}",
    ]
    if warm and size == 512 and art.exists():
        base.append(f"train.init_path={art}")

    out = {}
    # arms:
    #   independent        — gop=1: every frame a standalone I-frame at the
    #                        full steps0 budget, absolute coding
    #   independent_delta  — gop=1 + quant.delta: per-frame meta-artifact
    #                        residual coding (the bench.py flagship applied
    #                        per frame) — the strongest per-image baseline
    #   sequence           — delta I-frame + prev-frame-delta P-frames at
    #                        the short budget
    delta = ["quant.delta=true"] if warm else []
    seq_extra = [f"sequence.steps={steps}"] + delta
    if plr is not None:
        seq_extra.append(f"sequence.lr={plr}")
    for arm, extra in (
        ("independent", ["sequence.gop=1"]),
        ("independent_delta", ["sequence.gop=1"] + delta),
        ("sequence", seq_extra),
    ):
        if arm == "independent_delta" and not delta:
            continue
        if only is not None and arm not in only:
            continue
        t0 = time.perf_counter()
        rows = encode_sequence(base + extra + [
            f"sequence.steps0={steps0}",
            f"output_dir=outputs/bench/seq_ab/{arm}",
        ])
        wall = time.perf_counter() - t0
        # decode-side check: the chain decodes to the encoder's numbers
        dec, _ = decode_sequence(
            Path(f"outputs/bench/seq_ab/{arm}") / f"seq_{video}"
        )
        total = sum(r["bytes"] for r in rows)
        out[arm] = {
            "rows": rows,
            "total_bytes": total,
            "bytes_per_frame": round(total / frames, 1),
            "mean_decoded_db": round(
                float(np.mean([r["decoded_psnr"] for r in rows])), 2
            ),
            "p_mean_decoded_db": round(
                float(np.mean([r["decoded_psnr"] for r in rows[1:]])), 2
            ),
            "p_bytes_per_frame": round(
                float(np.mean([r["bytes"] for r in rows[1:]])), 1
            ),
            "encode_wall_s": round(wall, 2),
            "decoded_frames": list(dec.shape),
        }
        print(json.dumps({arm: {k: v for k, v in out[arm].items()
                                if k != "rows"}}), flush=True)

    seq = out.get("sequence")
    if seq is None:
        return
    summary = {}
    for name, base_arm in (
        ("vs_independent", "independent"),
        ("vs_independent_delta", "independent_delta"),
    ):
        ind = out.get(base_arm)
        if ind is None:
            continue
        summary[name] = {
            "rate_saving_pct": round(
                100.0 * (1 - seq["total_bytes"] / ind["total_bytes"]), 2
            ),
            "p_rate_saving_pct": round(
                100.0
                * (1 - seq["p_bytes_per_frame"] / ind["p_bytes_per_frame"]),
                2,
            ),
            "d_mean_db": round(
                seq["mean_decoded_db"] - ind["mean_decoded_db"], 2
            ),
            "wall_ratio": round(
                ind["encode_wall_s"] / max(seq["encode_wall_s"], 1e-9), 2
            ),
        }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
