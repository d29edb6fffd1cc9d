#!/usr/bin/env python
"""Precision schedule + tf32 dot ceiling — VERDICT r4 weak #6 / item 3.

Two questions the r5 precision re-baseline raises:

1. **Is the fused-Pallas headroom still there at tf32?** The r4 "3x VPU
   headroom" compared the fit's achieved TFLOPS against the 1-PASS
   chained-dot ceiling (~73 TFLOPS). The r5 default is tensorfloat32 =
   3 MXU passes per logical matmul, so the honest same-shape ceiling is
   ~73/3 ~ 24 logical TFLOPS — and BENCH_r04 already shows the SIREN
   tf32 fit at 23.45. This script measures the chained-dot ceiling AT
   tf32 directly; if the fit sits at >90% of it, the Pallas fused-step
   item closes as a measured negative (the MXU passes, not the VPU,
   bind at the production precision).

2. **Do all steps need 3 passes?** The 6.3 dB penalty is about the
   CONVERGED basin; early optimization may not care. A precision
   schedule (1-pass bf16 for the first fraction, tf32 for the rest)
   would cut the fit wall up to ~32% at equal converged quality if the
   switch point is late enough. Measured arms: tf32-all vs switch at
   {50%, 75%} on the strict SIREN protocol point, decoded through the
   full protocol (kmeans-8 + zstd + tf32 decode).

Usage: python benchmarks/precision_schedule.py [steps=2000]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from implicit_image_tpu.coding import (  # noqa: E402
    compress_state_dict,
    decode_and_render,
    linear_state_dict,
)
from implicit_image_tpu.data import get_grid, synthetic_image  # noqa: E402
from implicit_image_tpu.models import build_model  # noqa: E402
from implicit_image_tpu.quant import QuantConfig  # noqa: E402
from implicit_image_tpu.training.fit import (  # noqa: E402
    OptimConfig,
    TrainConfig,
    make_fit_segments,
)
from implicit_image_tpu.training.quant_phase import (  # noqa: E402
    make_quant_fit_fn,
)


def tf32_dot_ceiling() -> float:
    """The bench.py chained-dot micro, run UNDER tensorfloat32 — the
    same-shape logical-TFLOPS ceiling for a 3-pass recipe."""
    depth, reps = 8, 250
    a = jnp.zeros((512 * 512, 128), jnp.float32) + 0.5
    key = jax.random.PRNGKey(0)
    bs = jnp.stack([
        jnp.eye(128) * 0.999
        + jax.random.normal(jax.random.fold_in(key, i), (128, 128)) * 1e-4
        for i in range(depth)
    ])

    def chain(a, bs):
        def body(x, _):
            with jax.default_matmul_precision("tensorfloat32"):
                for i in range(depth):
                    x = x @ bs[i]
            return x, ()
        out, _ = lax.scan(body, a, None, length=reps)
        return out[0, 0]

    cfn = jax.jit(chain).lower(a, bs).compile()
    np.asarray(cfn(a, bs))
    t0 = time.perf_counter()
    np.asarray(cfn(a, bs))
    dt = time.perf_counter() - t0
    return round(2 * 512 * 512 * 128 * 128 * depth * reps / dt / 1e12, 1)


def protocol_tail(params, masks, mdef, mcfg, grid, img, out_dir):
    """kmeans-8 + zstd + tf32 decode; returns (decoded_db, bytes)."""
    qcfg = QuantConfig(name="KMeans", bits=8, num_steps=100, log_steps=100)
    qfn = jax.jit(make_quant_fit_fn(
        mdef, mcfg, grid, qcfg, OptimConfig(), masks,
        matmul_precision="tensorfloat32"))
    params_q, codebooks, _ = qfn(params, img)
    state = linear_state_dict(params_q, codebooks, half="auto")
    nbytes = compress_state_dict(state, out_dir, "zstd")
    h, w = grid.shape[:2]
    dec, _ = decode_and_render(out_dir, "zstd", mdef, mcfg, h, w,
                               benchmark=False)
    mse = float(np.mean((np.asarray(dec, np.float64)
                         - np.asarray(img, np.float64)) ** 2))
    return round(10.0 * np.log10(1.0 / max(mse, 1e-12)), 2), nbytes


def main(kv) -> None:
    steps = int(kv.get("steps", 2000))
    h = w = 512
    img = jnp.asarray(synthetic_image(h, w, seed=0))
    grid = get_grid(h, w)
    mdef, mcfg = build_model("siren", depth=8, hidden_size=128)
    ocfg = OptimConfig()

    out = {"steps": steps}
    out["tf32_chained_dot_tflops"] = tf32_dot_ceiling()
    print(json.dumps({"tf32_chained_dot_tflops":
                      out["tf32_chained_dot_tflops"]}),
          file=sys.stderr, flush=True)

    # one segment program per precision; the carry is precision-agnostic,
    # so a schedule = run bf16 segments then tf32 segments on ONE carry
    def build(prec):
        init_fn, seg_fn = make_fit_segments(
            mdef, mcfg, grid,
            TrainConfig(num_steps=steps, log_steps=steps,
                        matmul_precision=prec),
            ocfg,
        )
        import functools
        return jax.jit(init_fn), jax.jit(
            functools.partial(seg_fn, length=500))

    jinit, jseg_1p = build(None)  # 1-pass bf16 (JAX default)
    _, jseg_tf = build("tensorfloat32")
    _, jseg_f32 = build("float32")
    # warm-up compiles
    carry0 = jinit(jax.random.PRNGKey(0), img)
    jseg_1p(carry0, img, jnp.int32(0))
    jseg_tf(carry0, img, jnp.int32(0))
    jseg_f32(carry0, img, jnp.int32(0))

    n_seg = steps // 500
    for name, n_1p, late in (("tf32_all", 0, jseg_tf),
                             ("f32_all", 0, jseg_f32),
                             ("switch_50", n_seg // 2, jseg_tf),
                             ("switch_75", (3 * n_seg) // 4, jseg_tf),
                             ("switch_50_f32", n_seg // 2, jseg_f32)):
        carry = jinit(jax.random.PRNGKey(0), img)
        t0 = time.perf_counter()
        for s in range(n_seg):
            f = jseg_1p if s < n_1p else late
            carry, m = f(carry, img, jnp.int32(s * 500))
        np.asarray(jnp.ravel(m["loss"])[-1])
        wall = time.perf_counter() - t0
        db, nb = protocol_tail(
            carry[0], None, mdef, mcfg, grid, img,
            REPO / f"outputs/bench/prec_schedule/{name}")
        out[name] = {"fit_wall_s": round(wall, 2), "decoded_db": db,
                     "bytes": nb, "bf16_segments": n_1p,
                     "precise_segments": n_seg - n_1p}
        print(json.dumps({"arm": name, **out[name]}), file=sys.stderr,
              flush=True)

    (REPO / "outputs/bench/precision_schedule.json").write_text(
        json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main(dict(a.split("=", 1) for a in sys.argv[1:]))
