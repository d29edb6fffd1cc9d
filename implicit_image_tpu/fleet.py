"""Fleet encode CLI — many images through ONE compiled program.

`python -m implicit_image_tpu.fleet fleet.images=a,b,c [overrides...]`

The reference's only many-images story is one OS process per image
(Hydra multirun / SLURM arrays, makefiles/finals.mk); here the whole
fleet — init, every train step, the kmeans codebook finetune — is a
single vmapped XLA program (parallel/pipeline.batched_compress), so B
images pay ONE compile and keep the MXU fed with a B-wide batch axis.
Composes with the meta-learned warm start (`train.init_path`): one
shared init feeds every lane, which both cuts the step budget and
shrinks every stream (weights stay near the shared init — measured in
BASELINE.md "Meta-learned initialization").

Each fleet entry is a benchmark image name (real file when present via
data.resolve_benchmark_path, deterministic synthetic stand-in otherwise)
or a path to an image file. Every member gets a standard run dir
(config.json + summary.json + model_quantized/) under
`output_dir/fleet_<exp_name>/<name>`, so the decode CLI
(decompress.py, including batched `decode_runs`) and the visualize run
store read fleet members like any other run.
"""
from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path

import jax
import numpy as np

from implicit_image_tpu.config import compose
from implicit_image_tpu.utils import catch_error_decorator

log = logging.getLogger(__name__)


def _member_overrides(entry: str):
    """A fleet entry -> the img.* overrides selecting it."""
    p = Path(entry)
    if p.suffix and p.exists():
        return [f"img.path={entry}", f"img.name={p.stem}"], p.stem
    return [f"img.name={entry}"], entry


def run(argv) -> list:
    """Compose the config, load the fleet, run batched_compress, write
    per-member run dirs. Returns [(name, decoded_psnr, bytes), ...]."""
    from implicit_image_tpu.compress import _load_image
    from implicit_image_tpu.parallel.ladder import build_ladder_args
    from implicit_image_tpu.parallel.pipeline import batched_compress

    argv = list(argv)
    cfg = compose(argv)
    fleet_raw = (cfg.get("fleet") or {}).get("images")
    if not fleet_raw:
        raise ValueError(
            "fleet.images=<name_or_path>[,...] is required "
            "(benchmark names or image file paths)"
        )
    entries = (
        [str(e) for e in fleet_raw]
        if isinstance(fleet_raw, (list, tuple))
        else str(fleet_raw).split(",")
    )

    base = [a for a in argv if not a.startswith(("fleet.", "img.name=",
                                                 "img.path="))]
    member_cfgs, names, imgs = [], [], []
    for entry in entries:
        ov, name = _member_overrides(entry)
        mcfg_i = compose(base + ov)
        img = _load_image(mcfg_i.img)
        member_cfgs.append(mcfg_i)
        names.append(name)
        imgs.append(img)
    return encode_fleet(cfg, imgs, names, member_cfgs)


def encode_fleet(cfg, imgs, names, member_cfgs, root=None) -> list:
    """The fleet body: B same-shape images -> ONE vmapped compiled program
    -> per-member standard run dirs. `imgs` are preloaded (H, W, 3) arrays
    (the CLI loads them from fleet.images; api.compress_images passes
    arrays directly). Returns [(name, decoded_psnr, bytes), ...]."""
    from implicit_image_tpu.parallel.ladder import build_ladder_args
    from implicit_image_tpu.parallel.pipeline import batched_compress

    # model/train/optim/quant/coding args exactly as the ladder/sweeper
    # assemble them (incl. train.init_path -> init_params); masking may be
    # dense for a fleet (the ladder itself requires sparse members)
    args = build_ladder_args(cfg)
    masking = args["masking"]
    if cfg.get("masking", {}).get("dense", False):
        masking = None

    if root is None:
        root = Path(cfg.get("output_dir", "outputs")) / (
            "fleet_" + str(cfg.get("exp_name", "run"))
        )
    root = Path(root)
    t0 = time.perf_counter()
    results = batched_compress(
        jax.random.PRNGKey(int(cfg.seed)),
        args["mdef"], args["mcfg"], args["grid"], np.stack(imgs),
        args["train_cfg"], args["optim_cfg"], masking,
        quant_cfg=args["quant_cfg"], stream_name=args["stream_name"],
        stream_root=str(root), half=args["half"],
        coding_kwargs=args["coding_kwargs"],
        init_params=args["init_params"], delta_info=args["delta_info"],
        member_subdir="model_quantized", member_names=names,
    )
    wall = time.perf_counter() - t0

    out = []
    for name, mcfg_i, r in zip(names, member_cfgs, results):
        run_dir = root / name
        (run_dir / "config.json").write_text(
            json.dumps(mcfg_i, indent=2, default=str)
        )
        (run_dir / "summary.json").write_text(json.dumps({
            "PSNR": r.psnr,
            "Quant PSNR": r.quant_psnr,
            "Decoded PSNR": r.decoded_psnr,
            "Compressed Bytes": r.compressed_bytes,
        }, indent=2))
        print(
            f"[{name}] fit={r.psnr:.2f} dB decoded={r.decoded_psnr:.2f} dB "
            f"bytes={r.compressed_bytes}"
        )
        out.append((name, r.decoded_psnr, r.compressed_bytes))
    print(
        f"FLEET {len(names)} images in {wall:.1f}s "
        f"({wall / len(names):.2f}s/image, one compile)"
    )
    return out


@catch_error_decorator
def cli(argv=None) -> None:
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )
    run(list(sys.argv[1:] if argv is None else argv))


if __name__ == "__main__":
    cli()
