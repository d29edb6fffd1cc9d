"""Decode throughput: bitstream -> params -> rendered image, Mpix/s.

The reference has no decode entry point (SURVEY.md §3.2); decode_and_render
(coding/__init__.py) is ours, and BASELINE.md tracks decode Mpix/s per chip.
Host entropy decode and device render are reported separately.

Usage: python benchmarks/decode_speed.py [side] [backend]
"""
from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root, so `python benchmarks/x.py` works
import tempfile

import jax
import numpy as np

from implicit_image_tpu.coding import (
    compress_state_dict,
    decode_and_render,
    linear_state_dict,
)
from implicit_image_tpu.data import get_grid, synthetic_image
from implicit_image_tpu.models import build_model
from implicit_image_tpu.quant import QuantConfig
from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit
from implicit_image_tpu.training.quant_phase import quant_finetune


def main(side: int = 512, backend: str = "auto") -> None:
    img = synthetic_image(side, side, seed=0)
    grid = get_grid(side, side)
    mdef, mcfg = build_model("siren", depth=8, hidden_size=128)
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=500, log_steps=500,
                    matmul_precision="tensorfloat32"), OptimConfig(),
    )
    qres = quant_finetune(
        res.params, img, mdef, mcfg, grid,
        QuantConfig(bits=8, num_steps=50), OptimConfig(lr=1e-4),
        matmul_precision="tensorfloat32",
    )
    state = linear_state_dict(qres.params, qres.codebooks, half=True)
    with tempfile.TemporaryDirectory() as d:
        nbytes = compress_state_dict(state, d, backend)
        rendered, stats = decode_and_render(d, backend, mdef, mcfg, side, side)
        mse = float(np.mean((np.asarray(rendered) - img) ** 2))
    print(
        f"device={jax.devices()[0].device_kind} {side}x{side} backend={backend}: "
        f"{nbytes} bytes, decode(host)={stats['decode_s'] * 1e3:.1f} ms, "
        f"render={stats['render_s'] * 1e3:.2f} ms, {stats['mpix_per_s']:.0f} Mpix/s, "
        f"decoded PSNR={10 * np.log10(1.0 / mse):.2f} dB"
    )


if __name__ == "__main__":
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    backend = sys.argv[2] if len(sys.argv) > 2 else "auto"
    main(side, backend)
