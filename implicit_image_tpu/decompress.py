"""Decode CLI — bitstream -> rendered image file.

The reference has NO decode entry point (SURVEY.md §3.2: decoding means
calling decompress_state_dict by hand and re-running eval); this makes the
compressed run directory self-contained:

    python -m implicit_image_tpu.decompress outputs/<img>/<exp>/<run> \
        [--out decoded.png] [--scale 4] [--size HxW] \
        [--roi row0:row1,col0:col1] [--tile-rows N] \
        [--delta-artifact meta.npz]

Resolution-free decode (single-run only): the INR weights render ANY
lattice — `--scale`/`--size` for super-resolution or thumbnails, `--roi`
for an axis-aligned window (bit-identical to the slice of the full
render), `--tile-rows` to bound device memory for gigapixel outputs.

Reads `config.json` (written by compress.py) to rebuild the model and the
stream backend, decodes `model_quantized/`, renders on the TPU, reports
decode/render wall-clock + Mpix/s, and writes the image next to the
bitstream (or at --out).

Batched serving: pass SEVERAL run dirs (e.g. a whole ladder or a
batched_compress output tree) and `decode_runs` host-decodes every
stream, then renders each (architecture, size) group with ONE vmapped
jit — the decode-side counterpart of parallel/batched.py.
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


def decode_run(run_dir, out_path=None, scale=None, size=None, roi=None,
               tile_rows=0, base=False, delta_artifact=None):
    """Decode one compress.py run directory; returns (image, stats).

    Geometry options (the INR artifact is resolution-free — the reference
    decoder can only re-evaluate the training grid):
      scale:     render the lattice at scale× the fitted size
      size:      (H, W) explicit lattice size (overrides scale)
      roi:       (row0, row1, col0, col1) window of that lattice
      tile_rows: row-band tiling to bound device memory on huge outputs
      base:      progressive (format-4) containers only — decode the
                 standalone base-quality prefix instead of the full stream
      delta_artifact: delta (quant.delta) containers only — override the
                 shared-artifact location recorded in the manifest
                 (coding._resolve_delta_offsets search order otherwise)
    """
    import time

    run_dir = Path(run_dir)
    if run_dir.is_file():
        # packed single-file container (.iic) — unpack next to a temp dir
        # and decode the run dir it holds (coding/container_file.py)
        import tempfile

        from implicit_image_tpu.coding.container_file import unpack_run

        with tempfile.TemporaryDirectory() as td:
            inner = unpack_run(run_dir, Path(td) / run_dir.stem)
            return decode_run(
                inner,
                out_path=out_path or run_dir.with_suffix(".decoded.png"),
                scale=scale, size=size, roi=roi, tile_rows=tile_rows,
                base=base, delta_artifact=delta_artifact,
            )
    cfg = json.loads((run_dir / "config.json").read_text())
    stream = cfg.get("entropy_coding", {}).get("stream_name", "zstd")
    if stream == "none":
        raise ValueError(f"{run_dir} was produced without entropy coding")
    mdef, mcfg = build_model_from_config(cfg)
    h, w = int(cfg["img"]["height"]), int(cfg["img"]["width"])
    kw = {"base_only": True} if base else {}
    if delta_artifact is not None:
        kw["delta_artifact"] = delta_artifact

    if scale or size or roi or tile_rows:
        from implicit_image_tpu.coding import (
            decompress_state_dict,
            params_from_state_dict,
            render_region,
        )

        rh, rw = size if size else (h, w)
        if scale:
            rh, rw = round(rh * scale), round(rw * scale)
        t0 = time.perf_counter()
        state = decompress_state_dict(run_dir / "model_quantized", stream, **kw)
        params = params_from_state_dict(state)
        t1 = time.perf_counter()
        img = render_region(mdef, mcfg, params, rh, rw, roi=roi,
                            tile_rows=tile_rows)
        t2 = time.perf_counter()
        stats = {
            "decode_s": t1 - t0,
            "upload_s": 0.0,
            "render_s": t2 - t1,  # includes compile (one-shot path)
            "mpix_per_s": img.shape[0] * img.shape[1] / max(t2 - t1, 1e-9) / 1e6,
            "lattice": (rh, rw),
            "window": tuple(roi) if roi else (0, rh, 0, rw),
        }
    else:
        img, stats = decode_and_render(
            run_dir / "model_quantized", stream, mdef, mcfg, h, w, **kw
        )
    out_path = Path(out_path) if out_path else run_dir / (
        "decoded_base.png" if base else "decoded.png")
    save_img(str(out_path), np.asarray(img))
    stats["out"] = str(out_path)
    return img, stats


def decode_runs(run_dirs):
    """Batched decode of many run dirs; returns images in input order.

    Host entropy decode runs per stream (cheap byte work); rendering is
    grouped by (model, config, H, W) and each group renders as a single
    vmapped compiled call over the stacked params — decoded weights are
    dense materialized tensors (centroids[labels]), so every member of a
    group has identical shapes regardless of sparsity/quantization.
    """
    import time

    import jax
    import jax.numpy as jnp

    from implicit_image_tpu.coding import (
        decompress_state_dict,
        params_from_state_dict,
    )
    from implicit_image_tpu.data import get_grid

    t0 = time.perf_counter()
    infos = []
    groups = {}
    for idx, rd in enumerate(run_dirs):
        rd = Path(rd)
        cfg = json.loads((rd / "config.json").read_text())
        stream = cfg.get("entropy_coding", {}).get("stream_name", "zstd")
        if stream == "none":
            raise ValueError(f"{rd} was produced without entropy coding")
        mdef, mcfg = build_model_from_config(cfg)
        h, w = int(cfg["img"]["height"]), int(cfg["img"]["width"])
        state = decompress_state_dict(rd / "model_quantized", stream)
        params = params_from_state_dict(state)
        groups.setdefault((mdef.name, repr(mcfg), h, w), []).append(idx)
        infos.append((rd, mdef, mcfg, h, w, params))
    host_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    images = [None] * len(infos)
    for idxs in groups.values():
        rd0, mdef, mcfg, h, w, _ = infos[idxs[0]]
        grid = get_grid(h, w)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[infos[i][5] for i in idxs]
        )
        # decoder render precision (coding._get_render rationale)
        def _one(p):
            with jax.default_matmul_precision("tensorfloat32"):
                return mdef.apply(p, grid, mcfg)

        render = jax.jit(jax.vmap(_one))
        outs = np.asarray(render(stacked))
        for j, i in enumerate(idxs):
            images[i] = outs[j]
            save_img(str(infos[i][0] / "decoded.png"), outs[j])
    render_s = time.perf_counter() - t0
    log.info(
        "batch-decoded %d runs in %d group(s): host %.1f ms, render+write %.1f ms",
        len(infos), len(groups), host_s * 1e3, render_s * 1e3,
    )
    return images


@catch_error_decorator
def cli(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    argv = list(sys.argv[1:] if argv is None else argv)

    def take_opt(name):
        if name not in argv:
            return None
        i = argv.index(name)
        if i + 1 >= len(argv):
            print(__doc__)
            raise SystemExit(2)
        val = argv[i + 1]
        del argv[i : i + 2]
        return val

    base = "--base" in argv
    if base:
        argv.remove("--base")
    out = take_opt("--out")
    delta_artifact = take_opt("--delta-artifact")
    scale = take_opt("--scale")
    size = take_opt("--size")
    roi = take_opt("--roi")
    tile_rows = take_opt("--tile-rows")
    geometry = dict(
        scale=float(scale) if scale else None,
        size=tuple(int(x) for x in size.split("x")) if size else None,
        roi=tuple(int(x) for x in roi.replace(",", ":").split(":")) if roi else None,
        tile_rows=int(tile_rows) if tile_rows else 0,
        base=base,
        delta_artifact=delta_artifact,
    )
    if geometry["size"] is not None and len(geometry["size"]) != 2:
        raise SystemExit("--size expects HxW, e.g. --size 1024x1024")
    if geometry["roi"] is not None and len(geometry["roi"]) != 4:
        raise SystemExit("--roi expects row0:row1,col0:col1")
    if len(argv) == 0:
        print(__doc__)
        raise SystemExit(2)
    if len(argv) > 1:
        if out is not None or any(v for v in geometry.values()):
            raise SystemExit(
                "--out/--scale/--size/--roi/--tile-rows are only valid "
                "with a single run dir"
            )
        decode_runs(argv)
        return
    _, stats = decode_run(argv[0], out, **geometry)
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
