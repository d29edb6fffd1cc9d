#!/usr/bin/env python
"""Where does the flagship's quant wall go? (VERDICT r4 weak #1)

BENCH_r04 measured the kmeans quant phase at 1.42-1.75 s of the ~5 s
flagship protocol (~30% of total) — the single biggest lever back to the
10x north star. This breaks the phase down and A/Bs the cheap variants:

  * stage split: kmeans init (Lloyd clustering) vs finetune scan vs
    final metrics — each timed as its own compiled execution;
  * steps knee: decoded PSNR/bytes after 0/25/50/75/100 finetune steps
    (the reference uses 100, conf/quant/kmeans.yaml — is the tail doing
    anything at tf32?);
  * pass-precision of the FINETUNE only: the fit must run tf32
    (BASELINE.md "Matmul pass precision"), but the centroid polish is a
    255-DOF/layer refinement — does a 1-pass bf16 finetune (3x cheaper
    matmuls) reach the same decoded quality? (decoded PSNR always read
    through the production tf32 decoder, so the READING is never capped);
  * pixel subsampling: centroid gradients are sums over 9k+ member
    weights — does a row-subsampled target (every 2nd/4th row, which
    keeps the CoordX tensor-product fast path) lose anything?

Usage: python benchmarks/quant_phase_breakdown.py [steps=1200]
Writes stderr JSON lines per arm + a final summary JSON line.
"""
from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from implicit_image_tpu.coding import (  # noqa: E402
    apply_xor_residual,
    compress_state_dict,
    decode_and_render,
    linear_state_dict,
    state_ref_map,
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
from implicit_image_tpu.training.quant_phase import (  # noqa: E402
    make_quant_fit_fn,
)

PRECISION = "tensorfloat32"


def _decode_psnr_bytes(params_q, codebooks, mdef, mcfg, h, w, img_np,
                       out_dir, delta_info, init_params):
    di = dict(delta_info)
    di["layers"] = [i for i, cb in enumerate(codebooks) if cb is not None]
    state = linear_state_dict(params_q, codebooks, half="auto")
    state, xor_names = apply_xor_residual(state, state_ref_map(init_params))
    di["xor"] = xor_names
    nbytes = compress_state_dict(state, out_dir, "auto", delta=di)
    dec_img, _ = decode_and_render(out_dir, "auto", mdef, mcfg, h, w,
                                   benchmark=False)
    mse = float(np.mean((np.asarray(dec_img, np.float64) - img_np) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12))), nbytes


def main(kv) -> None:
    h = w = 512
    steps = int(kv.get("steps", 1200))
    img = synthetic_image(h, w, seed=0)
    img_np = np.asarray(img, np.float64)
    grid = get_grid(h, w)
    mdef, mcfg = build_model("coordx", depth=8, hidden_size=96,
                             split_depth=5)

    meta_path = REPO / "assets/meta/coordx_s5w96_512_tf32.npz"
    from implicit_image_tpu.training.metainit import load_meta_init

    init_params = load_meta_init(meta_path, "coordx", mcfg)
    delta_info = {
        "artifact": str(meta_path),
        "sha256": hashlib.sha256(meta_path.read_bytes()).hexdigest(),
    }

    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=steps, log_steps=steps,
                    matmul_precision=PRECISION),
        OptimConfig(), MaskingConfig(density=0.85),
        init_params=init_params,
    )
    masks = res.mask_state.masks
    p = np.asarray(res.metrics["psnr"]).reshape(-1)
    print(json.dumps({"stage": "fit", "wall_s": round(res.wall_seconds, 3),
                      "fit_psnr": round(float(p[np.isfinite(p)][-1]), 2)}),
          file=sys.stderr, flush=True)

    ocfg = OptimConfig()
    out = {"fit_wall_s": round(res.wall_seconds, 3)}
    root = REPO / "outputs/bench/quant_breakdown"

    # ---- arm 1: staged tf32 (stage split + steps knee) -------------------
    qcfg = QuantConfig(name="KMeans", bits=8, num_steps=100, log_steps=100)
    qf = make_quant_fit_fn(mdef, mcfg, grid, qcfg, ocfg, masks,
                           offset_params=init_params,
                           matmul_precision=PRECISION)
    qinit, qsteps, qfinal = qf.stages
    jinit = jax.jit(qinit)
    jstep = jax.jit(qsteps, static_argnums=3)
    jfinal = jax.jit(qfinal)

    # warm-up compiles (untimed)
    carry = jinit(res.params, img)
    carry_w, _ = jstep(carry, img, jnp.int32(0), 25)
    jax.block_until_ready(jfinal(carry_w, img, {})[0])

    t0 = time.perf_counter()
    carry = jinit(res.params, img)
    jax.block_until_ready(carry[0])
    t_init = time.perf_counter() - t0

    knee = []
    chunk_walls = []
    for ci in range(4):
        t0 = time.perf_counter()
        carry, _ = jstep(carry, img, jnp.int32(25 * ci), 25)
        jax.block_until_ready(carry[0])
        chunk_walls.append(round(time.perf_counter() - t0, 3))
        params_q, codebooks, _ = jfinal(carry, img, {})
        db, nb = _decode_psnr_bytes(
            params_q, codebooks, mdef, mcfg, h, w, img_np,
            root / f"tf32_s{25 * (ci + 1)}", delta_info, init_params,
        )
        knee.append({"steps": 25 * (ci + 1), "decoded_db": round(db, 2),
                     "bytes": nb})
    t0 = time.perf_counter()
    params_q, codebooks, _ = jfinal(carry, img, {})
    jax.block_until_ready(params_q)
    t_final = time.perf_counter() - t0

    # steps=0 point: snap straight after clustering
    carry0 = jinit(res.params, img)
    params_q0, codebooks0, _ = jfinal(carry0, img, {})
    db0, nb0 = _decode_psnr_bytes(
        params_q0, codebooks0, mdef, mcfg, h, w, img_np,
        root / "tf32_s0", delta_info, init_params,
    )
    knee.insert(0, {"steps": 0, "decoded_db": round(db0, 2), "bytes": nb0})

    out["tf32_staged"] = {
        "init_wall_s": round(t_init, 3),
        "step_chunk_walls_s": chunk_walls,
        "steps_wall_s_100": round(sum(chunk_walls), 3),
        "final_metrics_wall_s": round(t_final, 3),
        "knee": knee,
    }
    print(json.dumps({"arm": "tf32_staged", **out["tf32_staged"]}),
          file=sys.stderr, flush=True)

    # ---- arm 2: whole-program walls at candidate step counts -------------
    # (the production path runs init+steps+final as ONE execution; measure
    # that wall at the knee candidates so bench.py numbers are apples)
    for s in (int(x) for x in kv.get("whole", "50,100").split(",")):
        qcfg_s = QuantConfig(name="KMeans", bits=8, num_steps=s, log_steps=s)
        fn = jax.jit(make_quant_fit_fn(
            mdef, mcfg, grid, qcfg_s, ocfg, masks,
            offset_params=init_params, matmul_precision=PRECISION))
        cfn = fn.lower(res.params, img).compile()
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            pq, cb, _m = cfn(res.params, img)
            jax.block_until_ready(pq)
            walls.append(round(time.perf_counter() - t0, 3))
        db, nb = _decode_psnr_bytes(pq, cb, mdef, mcfg, h, w, img_np,
                                    root / f"whole_tf32_s{s}", delta_info,
                                    init_params)
        out[f"whole_tf32_s{s}"] = {
            "walls_s": walls, "decoded_db": round(db, 2), "bytes": nb}
        print(json.dumps({"arm": f"whole_tf32_s{s}",
                          **out[f"whole_tf32_s{s}"]}),
              file=sys.stderr, flush=True)

    # ---- arm 3: bf16 (default 1-pass) finetune ---------------------------
    qf_b = jax.jit(make_quant_fit_fn(
        mdef, mcfg, grid, qcfg, ocfg, masks,
        offset_params=init_params, matmul_precision=None))
    cfn_b = qf_b.lower(res.params, img).compile()
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        pq_b, cb_b, _m = cfn_b(res.params, img)
        jax.block_until_ready(pq_b)
        walls.append(round(time.perf_counter() - t0, 3))
    db_b, nb_b = _decode_psnr_bytes(pq_b, cb_b, mdef, mcfg, h, w, img_np,
                                    root / "bf16_s100", delta_info,
                                    init_params)
    out["bf16_s100"] = {"walls_s": walls, "decoded_db": round(db_b, 2),
                        "bytes": nb_b}
    print(json.dumps({"arm": "bf16_s100", **out["bf16_s100"]}),
          file=sys.stderr, flush=True)

    # ---- arm 4: row-subsampled finetune target ---------------------------
    # every `f`-th row: still a tensor-product grid (CoordX fast path) and
    # every centroid keeps ~1/f of its member-pixel gradient signal
    for f in (int(x) for x in kv.get("subsample", "2,4").split(",")):
        grid_s = np.asarray(grid)[::f]
        img_s = np.asarray(img)[::f]
        qf_s = jax.jit(make_quant_fit_fn(
            mdef, mcfg, jnp.asarray(grid_s), qcfg, ocfg, masks,
            offset_params=init_params, matmul_precision=PRECISION))
        cfn_s = qf_s.lower(res.params, jnp.asarray(img_s)).compile()
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            pq_s, cb_s, _m = cfn_s(res.params, jnp.asarray(img_s))
            jax.block_until_ready(pq_s)
            walls.append(round(time.perf_counter() - t0, 3))
        db_s, nb_s = _decode_psnr_bytes(pq_s, cb_s, mdef, mcfg, h, w,
                                        img_np, root / f"sub{f}_s100",
                                        delta_info, init_params)
        out[f"sub{f}_tf32_s100"] = {
            "walls_s": walls, "decoded_db": round(db_s, 2), "bytes": nb_s}
        print(json.dumps({"arm": f"sub{f}_tf32_s100",
                          **out[f"sub{f}_tf32_s100"]}),
              file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main(dict(a.split("=", 1) for a in sys.argv[1:]))
