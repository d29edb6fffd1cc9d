#!/usr/bin/env python
"""Progressive x delta A/B at the flagship point (VERDICT r3 item 5).

Round 3 left delta (best rate) and progressive (quality-scalable)
mutually exclusive; they now combine (coding/progressive.py pinned rank
nesting over the residual codebooks). This driver measures, on one
512² flagship fit (CoordX s5/w96, RigL d=0.85, warm 1000 steps):

  flat_delta:    the round-3 flagship container (quant.delta, format 3)
  prog_delta:    the SAME quantized state in the format-4 progressive
                 container with the delta manifest — full decode must be
                 bit-exact to flat_delta; reports the rate cost of
                 scalability and the standalone base-prefix quality
  prog_absolute: progressive without delta (the round-3 progressive arm)

Usage: python benchmarks/progressive_delta_ab.py [steps=1000]
"""
from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from implicit_image_tpu.coding import (  # noqa: E402
    apply_xor_residual,
    compress_state_dict,
    decompress_state_dict,
    linear_state_dict,
    params_from_state_dict,
    state_ref_map,
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


def _psnr(img, ref):
    mse = float(np.mean((np.asarray(img, np.float64)
                         - np.asarray(ref, np.float64)) ** 2))
    return round(float(10.0 * np.log10(1.0 / max(mse, 1e-12))), 2)


def main(kv) -> None:
    steps = int(kv.get("steps", 1000))
    h = w = int(kv.get("hw", 512))  # hw=32 steps=20: CPU smoke (cold init)
    img = synthetic_image(h, w, seed=0)
    grid = get_grid(h, w)
    prec = kv.get("precision", "tensorfloat32")
    prec = None if prec in ("none", "null", "") else prec
    c_def, c_cfg = build_model("coordx", depth=8, hidden_size=96,
                               split_depth=5)
    # tf32 artifact since r5 (basins are precision-specific — metainit.py)
    meta_path = REPO / "assets/meta/coordx_s5w96_512_tf32.npz"
    if h == 512:
        meta_params = load_meta_init(meta_path, "coordx", c_cfg)
        sha = hashlib.sha256(meta_path.read_bytes()).hexdigest()
    else:  # smoke mode: a fixed pseudo-artifact at the right shapes
        import numpy as _np

        import jax as _jax

        meta_params = c_def.init(_jax.random.PRNGKey(99), c_cfg)
        from implicit_image_tpu.training.metainit import save_meta_init

        meta_path = Path("outputs/bench/_smoke_meta.npz")
        meta_path.parent.mkdir(parents=True, exist_ok=True)
        save_meta_init(meta_path, meta_params, "coordx", c_cfg)
        sha = hashlib.sha256(meta_path.read_bytes()).hexdigest()

    print(f"device={jax.devices()[0].device_kind}")
    res = fit(jax.random.PRNGKey(0), c_def, c_cfg, grid, img,
              TrainConfig(num_steps=steps, log_steps=250,
                          matmul_precision=prec), OptimConfig(),
              MaskingConfig(density=0.85), init_params=meta_params)
    masks = res.mask_state.masks if res.mask_state is not None else None
    qcfg = QuantConfig(name="KMeans", bits=8, num_steps=100, log_steps=100)

    # production-decoder precision (a 1-pass bf16 render caps readings)
    def _render(p):
        with jax.default_matmul_precision("tensorfloat32"):
            return c_def.apply(p, grid, c_cfg)

    render = jax.jit(_render)

    out_root = Path(kv.get("out", "outputs/bench/prog_delta_ab"))
    report = {}

    def decode_db(d, **kw):
        state = decompress_state_dict(d, "auto", **kw)
        return _psnr(np.asarray(render(params_from_state_dict(state))), img)

    def base_ft_for(delta_layers=None):
        from implicit_image_tpu.quant.base_layer import (
            finetune_base_codebooks,
        )

        extra = {}
        if delta_layers is not None:
            extra = {
                "delta_layers": delta_layers,
                "delta_offsets": {
                    i: np.asarray(meta_params[i]["w"]) for i in delta_layers
                },
            }
        # NOTE: entries reaching the finetune here are pre-XOR (the A/B
        # applies XOR only in the flat arm), so no un-XOR is needed
        return lambda entries: finetune_base_codebooks(
            c_def, c_cfg, grid, img, entries, **extra
        )

    # ---- arm 1+2: delta-quantized state, flat vs progressive ----
    qfn = jax.jit(make_quant_fit_fn(
        c_def, c_cfg, grid, qcfg, OptimConfig(), masks,
        offset_params=meta_params, matmul_precision=prec,
    ))
    params_q, codebooks, qm = qfn(res.params, img)
    delta_layers = [i for i, cb in enumerate(codebooks) if cb is not None]
    state_d = linear_state_dict(params_q, codebooks, half="auto")
    info = {"artifact": str(meta_path), "sha256": sha,
            "layers": delta_layers}

    state_d_xor, xor_names = apply_xor_residual(
        dict(state_d), state_ref_map(meta_params)
    )
    info_flat = dict(info, xor=xor_names)
    flat_bytes = compress_state_dict(
        state_d_xor, out_root / "flat_delta", "auto", delta=info_flat
    )
    report["flat_delta"] = {
        "bytes": flat_bytes,
        "decoded_db": decode_db(out_root / "flat_delta"),
    }

    info_prog = dict(info, xor=xor_names)
    prog_bytes = compress_progressive(
        state_d_xor, out_root / "prog_delta", "auto",
        delta=info_prog, base_finetune=None,
    )
    full_db = decode_db(out_root / "prog_delta")
    base_db = decode_db(out_root / "prog_delta", base_only=True)
    report["prog_delta"] = {
        "bytes": prog_bytes,
        "base_bytes": base_bytes(out_root / "prog_delta"),
        "decoded_db": full_db,
        "base_decoded_db": base_db,
        "rate_cost_vs_flat": round(prog_bytes / flat_bytes - 1.0, 4),
        "bit_exact_vs_flat": full_db == report["flat_delta"]["decoded_db"],
    }
    # with the output-distortion base finetune (full stream untouched)
    prog_ft_bytes = compress_progressive(
        {k: np.ascontiguousarray(v) for k, v in state_d.items()},
        out_root / "prog_delta_ft", "auto", delta=dict(info),
        base_finetune=base_ft_for(delta_layers),
    )
    report["prog_delta_ft"] = {
        "bytes": prog_ft_bytes,
        "decoded_db": decode_db(out_root / "prog_delta_ft"),
        "base_decoded_db": decode_db(
            out_root / "prog_delta_ft", base_only=True),
    }

    # ---- arm 3: absolute quant, progressive (round-3 arm, control) ----
    qfn_a = jax.jit(make_quant_fit_fn(
        c_def, c_cfg, grid, qcfg, OptimConfig(), masks,
        matmul_precision=prec,
    ))
    params_a, codebooks_a, _ = qfn_a(res.params, img)
    state_a = linear_state_dict(params_a, codebooks_a, half="auto")
    abs_bytes = compress_progressive(
        state_a, out_root / "prog_abs", "auto",
        base_finetune=base_ft_for(None),
    )
    report["prog_absolute"] = {
        "bytes": abs_bytes,
        "base_bytes": base_bytes(out_root / "prog_abs"),
        "decoded_db": decode_db(out_root / "prog_abs"),
        "base_decoded_db": decode_db(out_root / "prog_abs", base_only=True),
    }

    print(json.dumps(report), flush=True)
    out = Path("outputs/bench/progressive_delta_ab.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main(dict(a.split("=", 1) for a in sys.argv[1:]))
