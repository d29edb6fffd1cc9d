"""Hash-grid fit/render speed: per-pixel gather path vs separable path.

Round-3 history: the first hashgrid implementation evaluated every pixel
as 4·L fused table gathers (apply_flat) and measured 396 ms/step at 512²,
L=12, T=2¹², F=2 on v5e — pure memory-system random access (12.6 M
gathers fwd + 12.6 M scatter-adds bwd per step against measured XLA
ceilings of ~80 M gathers/s and ~12 M scatter-updates/s). The separable
rework (models/hashgrid.hashgrid_apply) evaluates tensor-product grids
per LEVEL instead: materialize the (r+1)² dense virtual grid (static
gather for hashed levels, reshape for direct ones) and bilinearly blend
with two interpolation matmuls on the MXU; the hashed levels' backward
scatter is replaced by a precomputed static transpose-gather (custom
VJP). This harness measures both paths under the same one-compiled-scan
fit used everywhere else (per-dispatch timing is meaningless through the
tunnel) plus the render (decode) wall.

Usage: python benchmarks/hashgrid_speed.py [steps]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from implicit_image_tpu.data import get_grid, synthetic_image
from implicit_image_tpu.models import build_model
from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit


def main(steps: int = 100) -> None:
    h = w = 512
    img = synthetic_image(h, w, seed=0)
    grid = get_grid(h, w)
    print(f"device={jax.devices()[0].device_kind} image={h}x{w} steps={steps}",
          flush=True)
    mdef, mcfg = build_model("hashgrid", n_levels=12, log2_table_size=12,
                             base_resolution=16, finest_resolution=512,
                             depth=3, hidden_size=64)
    import dataclasses

    flat_def = dataclasses.replace(mdef, separable=False)

    # flat path: ~0.4 s/step — segment well under the ~60 s watchdog
    for name, md, seg in (("separable", mdef, steps),
                          ("flat-gather", flat_def, 25)):
        res = fit(
            jax.random.PRNGKey(0), md, mcfg, grid, img,
            TrainConfig(num_steps=steps, log_steps=steps, segment_steps=seg),
            OptimConfig(lr=3e-3, epsilon=1e-15),
        )
        p = np.asarray(res.metrics["psnr"])
        print(
            f"{name:12s} {1e3 * res.wall_seconds / steps:8.2f} ms/step "
            f"({res.wall_seconds:6.2f} s total) "
            f"final psnr {p[~np.isnan(p)][-1]:.2f} dB",
            flush=True,
        )
        params = res.params

    # render (decode) wall: separable vs flat. Steady-state device rate —
    # K renders inside ONE dispatch with a scalar readback (the same
    # methodology as coding.decode_and_render): a per-frame full-image
    # np.asarray readback would add the ~3 MB device->host tunnel transfer
    # (~70 ms) to every frame and swamp the device wall.
    reps = 8
    for name, apply_one in (
        ("render-separable", lambda p: mdef.apply(p, grid, mcfg)),
        ("render-flat",
         lambda p: mdef.apply_flat(p, grid.reshape(h * w, 2), mcfg)),
    ):
        @jax.jit
        def render_many(p, apply_one=apply_one):
            def body(c, _):
                pc = jax.tree_util.tree_map(
                    lambda x: x * (1.0 + c * 1e-38), p)
                out = apply_one(pc)
                return c + jnp.ravel(out)[0], None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=reps)
            return acc

        np.asarray(render_many(params))  # warm-up compile
        t0 = time.perf_counter()
        np.asarray(render_many(params))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:17s} {1e3 * dt:7.2f} ms/frame "
              f"({h * w / dt / 1e6:.0f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
