"""Decode CLI — bitstream -> rendered image file.

The reference has NO decode entry point (SURVEY.md §3.2: decoding means
calling decompress_state_dict by hand and re-running eval); this makes the
compressed run directory self-contained:

    python -m implicit_image_tpu.decompress outputs/<img>/<exp>/<run> \
        [--out decoded.png]

Reads `config.json` (written by compress.py) to rebuild the model and the
stream backend, decodes `model_quantized/`, renders on the TPU, reports
decode/render wall-clock + Mpix/s, and writes the image next to the
bitstream (or at --out).
"""
from __future__ import annotations

import json
import logging
import sys
from pathlib import Path

import numpy as np

from implicit_image_tpu.coding import decode_and_render
from implicit_image_tpu.data import save_img
from implicit_image_tpu.models import build_model_from_config
from implicit_image_tpu.utils import catch_error_decorator

log = logging.getLogger("implicit_image_tpu")


def decode_run(run_dir, out_path=None):
    """Decode one compress.py run directory; returns (image, stats)."""
    run_dir = Path(run_dir)
    cfg = json.loads((run_dir / "config.json").read_text())
    stream = cfg.get("entropy_coding", {}).get("stream_name", "zstd")
    if stream == "none":
        raise ValueError(f"{run_dir} was produced without entropy coding")
    mdef, mcfg = build_model_from_config(cfg)
    h, w = int(cfg["img"]["height"]), int(cfg["img"]["width"])

    img, stats = decode_and_render(
        run_dir / "model_quantized", stream, mdef, mcfg, h, w
    )
    out_path = Path(out_path) if out_path else run_dir / "decoded.png"
    save_img(str(out_path), np.asarray(img))
    stats["out"] = str(out_path)
    return img, stats


@catch_error_decorator
def cli(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    argv = list(sys.argv[1:] if argv is None else argv)
    out = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print(__doc__)
            raise SystemExit(2)
        out = argv[i + 1]
        del argv[i : i + 2]
    if len(argv) != 1:
        print(__doc__)
        raise SystemExit(2)
    _, stats = decode_run(argv[0], out)
    log.info(
        "decoded %s: host %.1f ms + upload %.1f ms, render %.2f ms (%.0f Mpix/s) -> %s",
        argv[0],
        stats["decode_s"] * 1e3,
        stats["upload_s"] * 1e3,
        stats["render_s"] * 1e3,
        stats["mpix_per_s"],
        stats["out"],
    )


if __name__ == "__main__":
    cli()
