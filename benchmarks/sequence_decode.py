#!/usr/bin/env python
"""Sequence DECODE throughput (VERDICT r3 item 6) — frames/s, measured.

Round 3 measured sequence ENCODE (1.2 s/frame steady) but waved decode
off as tunnel-upload-bound. This driver closes that: it encodes a short
512² sequence at the flagship-family settings, then measures the decode
path a consumer runs — host entropy decode + chain offset reconstruction
+ device render per frame — in steady state, EXCLUDING the full-image
tunnel readback (the render is forced with a single-element fetch; a
local consumer keeps frames on device, and the tunnel's ~6 MB/frame
readback is a fixture of this dev setup, not the codec). Also times
GOP seek (decode_sequence(frame=t)) and packs the .iiv single-file
artifact.

Usage: python benchmarks/sequence_decode.py [frames=8] [gop=4] [steps0=1000] [steps=250]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from implicit_image_tpu.coding import (  # noqa: E402
    decompress_state_dict,
    params_from_state_dict,
)
from implicit_image_tpu.coding.container_file import pack_sequence  # noqa: E402
from implicit_image_tpu.data import get_grid  # noqa: E402
from implicit_image_tpu.models import build_model_from_config  # noqa: E402
from implicit_image_tpu.sequence import decode_sequence, encode_sequence  # noqa: E402


def main(kv) -> None:
    frames = int(kv.get("frames", 8))
    gop = int(kv.get("gop", 4))
    steps0 = int(kv.get("steps0", 1000))
    steps_p = int(kv.get("steps", 250))
    hw = int(kv.get("hw", 512))  # hw=24 steps0=20 steps=6: CPU smoke
    out_root = Path(kv.get("out", "outputs/bench/seqdec"))

    print(f"device={jax.devices()[0].device_kind}")
    t0 = time.perf_counter()
    results = encode_sequence([
        "img=synthetic", f"img.height={hw}", f"img.width={hw}",
        "mlp=coordx", "mlp.hidden_size=96", "mlp.split_depth=5",
        "masking=RigL", "masking.density=0.85",
        "quant=kmeans", "quant.num_steps=100", "quant.log_steps=100",
        "entropy_coding=auto",
        f"sequence.video=benchclip", f"sequence.frames={frames}",
        f"sequence.gop={gop}",
        f"sequence.steps0={steps0}", f"sequence.steps={steps_p}",
        f"train.num_steps={steps0}", "train.log_steps=250",
        f"output_dir={out_root}",
    ])
    enc_wall = time.perf_counter() - t0
    root = out_root / "seq_benchclip"

    # ---- steady-state decode: host entropy decode + device render ----
    frame_dirs = sorted(
        d for d in root.iterdir()
        if d.is_dir() and d.name.startswith("frame_")
    )
    cfg = json.loads((frame_dirs[0] / "config.json").read_text())
    stream = cfg["entropy_coding"]["stream_name"]
    mdef, mcfg = build_model_from_config(cfg)
    h, w = int(cfg["img"]["height"]), int(cfg["img"]["width"])
    grid = get_grid(h, w)
    # production-decoder precision (tf32, 3 passes — the r5 default; a
    # 1-pass bf16 render is faster but not what decode_run ships)
    def _render(p):
        with jax.default_matmul_precision("tensorfloat32"):
            return mdef.apply(p, grid, mcfg)

    render = jax.jit(_render)

    def decode_pass(timed: bool):
        host_s = dev_s = 0.0
        prev = None
        for d in frame_dirs:
            t1 = time.perf_counter()
            state = decompress_state_dict(
                d / "model_quantized", stream, prev_state=prev
            )
            params = params_from_state_dict(state)
            t2 = time.perf_counter()
            out = render(params)
            np.asarray(out[0, 0, 0])  # force completion, 1-elem readback
            t3 = time.perf_counter()
            host_s += t2 - t1
            dev_s += t3 - t2
            prev = state
        return host_s, dev_s

    decode_pass(timed=False)  # warm-up: render compile + upload caches
    runs = [decode_pass(timed=True) for _ in range(3)]
    host_s = sorted(r[0] for r in runs)[1]
    dev_s = sorted(r[1] for r in runs)[1]
    wall = host_s + dev_s
    fps = frames / wall

    # ---- GOP seek: last frame of the clip (worst P-walk <= gop-1) ----
    # cold = first seek in a fresh consumer (render compile + upload
    # caches); warm = a player scrubbing (the value-keyed render cache
    # makes repeated seeks pay only the chain walk + render)
    t4 = time.perf_counter()
    img_t, name_t = decode_sequence(root, frame=frames - 1)
    seek_wall = time.perf_counter() - t4
    t5 = time.perf_counter()
    decode_sequence(root, frame=frames - 1)
    seek_warm = time.perf_counter() - t5

    # ---- single-file artifact ----
    iiv = pack_sequence(root, out_root / "benchclip.iiv")
    stream_bytes = sum(
        (d / "model_quantized" / "compressed_weights.data").stat().st_size
        for d in frame_dirs
    )

    report = {
        "frames": frames, "gop": gop, "hw": [h, w],
        "encode_wall_s": round(enc_wall, 2),
        "encode_s_per_frame": round(enc_wall / frames, 2),
        "mean_decoded_db": round(
            float(np.mean([r["decoded_psnr"] for r in results])), 2),
        "total_stream_bytes": stream_bytes,
        "decode_host_s": round(host_s, 3),
        "decode_device_s": round(dev_s, 3),
        "decode_wall_s": round(wall, 3),
        "decode_frames_per_s": round(fps, 2),
        "gop_seek_last_frame_cold_s": round(seek_wall, 3),
        "gop_seek_last_frame_warm_s": round(seek_warm, 3),
        "iiv_bytes": iiv.stat().st_size,
        "iiv_overhead_vs_streams": round(
            iiv.stat().st_size / max(stream_bytes, 1) - 1.0, 4),
    }
    print(json.dumps(report), flush=True)
    out = Path("outputs/bench/sequence_decode.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main(dict(a.split("=", 1) for a in sys.argv[1:]))
