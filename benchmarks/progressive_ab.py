#!/usr/bin/env python
"""Progressive container A/B on the flagship stream.

Measures what format-4 progressivity costs and buys on the real flagship
artifact (CoordX s5/w96 d=0.85, warm b1000, kmeans-8):
  * rate overhead vs the format-3 container (nibble-plane entropy loss)
  * base prefix fraction (bytes a client fetches for a preview)
  * decoded PSNR of the base layer vs the full stream (full must equal
    the non-progressive decode exactly)

Usage: python benchmarks/progressive_ab.py [budgets=1000] [stream=auto]
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

from implicit_image_tpu.coding import (  # noqa: E402
    compress_state_dict,
    decode_and_render,
    linear_state_dict,
)
from implicit_image_tpu.coding.progressive import (  # noqa: E402
    base_bytes,
    compress_progressive,
)
from implicit_image_tpu.data import get_grid, synthetic_image  # noqa: E402
from implicit_image_tpu.models import build_model  # noqa: E402
from implicit_image_tpu.quant import QuantConfig  # noqa: E402
from implicit_image_tpu.sparsity import MaskingConfig  # noqa: E402
from implicit_image_tpu.training.fit import (  # noqa: E402
    OptimConfig,
    TrainConfig,
    fit,
)
from implicit_image_tpu.training.metainit import load_meta_init  # noqa: E402
from implicit_image_tpu.training.quant_phase import make_quant_fit_fn  # noqa: E402


def main(kv) -> None:
    h = w = 512
    img = synthetic_image(h, w, seed=0)
    grid = get_grid(h, w)
    steps = int(kv.get("budgets", "1000"))
    stream = kv.get("stream", "auto")

    mdef, mcfg = build_model("coordx", depth=8, hidden_size=96, split_depth=5)
    meta_path = REPO / "assets/meta/coordx_s5w96_512.npz"
    init = (
        load_meta_init(meta_path, "coordx", mcfg) if meta_path.exists() else None
    )
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=steps, log_steps=steps), OptimConfig(),
        MaskingConfig(density=0.85), init_params=init,
    )
    qcfg = QuantConfig(name="KMeans", bits=8, num_steps=100, log_steps=100)
    qfn = jax.jit(make_quant_fit_fn(
        mdef, mcfg, grid, qcfg, OptimConfig(),
        res.mask_state.masks if res.mask_state else None,
    ))
    params_q, codebooks, _ = qfn(res.params, img)
    state = linear_state_dict(params_q, codebooks, half="auto")

    img64 = np.asarray(img, np.float64)

    def psnr_of(dir_name, **kw):
        dec, _ = decode_and_render(
            dir_name, stream, mdef, mcfg, h, w, benchmark=False, **kw
        )
        err = float(np.mean((np.asarray(dec, np.float64) - img64) ** 2))
        return round(10.0 * np.log10(1.0 / max(err, 1e-12)), 2)

    from implicit_image_tpu.quant.base_layer import finetune_base_codebooks

    flat_dir, prog_dir = "outputs/prog_ab/flat", "outputs/prog_ab/prog"
    prog_ft_dir = "outputs/prog_ab/prog_ft"
    flat_bytes = compress_state_dict(dict(state), flat_dir, stream)
    prog_bytes = compress_progressive(dict(state), prog_dir, stream)
    ft_bytes = compress_progressive(
        dict(state), prog_ft_dir, stream,
        base_finetune=lambda entries: finetune_base_codebooks(
            mdef, mcfg, grid, img, entries
        ),
    )
    nbase = base_bytes(prog_dir)

    report = {
        "flat_bytes": flat_bytes,
        "prog_bytes": prog_bytes,
        "overhead_pct": round(100.0 * (prog_bytes - flat_bytes) / flat_bytes, 2),
        "base_bytes": nbase,
        "base_fraction_pct": round(100.0 * nbase / prog_bytes, 1),
        "full_psnr_flat": psnr_of(flat_dir),
        "full_psnr_prog": psnr_of(prog_dir),
        "base_psnr": psnr_of(prog_dir, base_only=True),
        "ft_bytes": ft_bytes,
        "ft_base_bytes": base_bytes(prog_ft_dir),
        "base_psnr_finetuned": psnr_of(prog_ft_dir, base_only=True),
        "full_psnr_finetuned": psnr_of(prog_ft_dir),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main(dict(a.split("=", 1) for a in sys.argv[1:]))
