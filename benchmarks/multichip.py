"""Multi-chip benchmark — image x pixel mesh grids.

Two modes:
  * >1 real device: measure wall-clock for pixel-sharded single fits and
    image-batched fleets across mesh factorizations (the real-hardware
    bench VERDICT r1 asked to be ready).
  * 1 real device (this environment): force the virtual 8-device CPU mesh
    (tests/conftest.py pattern), verify numeric equality of sharded vs
    single-device fits at 512^2, and report the compiler's comms/FLOP
    cost model per mesh layout via xla_cost_analysis — ICI traffic is the
    quantity that decides whether pixel sharding pays at a given size.

    python benchmarks/multichip.py [h=512] [steps=40]

  Virtual-mode default is steps=2 at 512^2: the layout equality + cost
  model don't need convergence, and a 1-core host runs ~20 s per
  512^2 step. On real chips pass steps=2000 for wall-clock numbers.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root, so `python benchmarks/x.py` works
import time


def _ensure_devices(n: int = 8):
    import jax

    if jax.local_device_count() >= n:
        return jax.devices()
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    import jax.extend

    jax.clear_caches()
    jax.extend.backend.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)
    return jax.devices()


def main(h: int = 512, steps: int = 40) -> dict:
    import jax
    import numpy as np

    virtual = jax.local_device_count() == 1
    devices = _ensure_devices(8)
    n = len(devices)

    import jax.numpy as jnp

    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.parallel import make_mesh
    from implicit_image_tpu.parallel.sharded import make_sharded_fit_fn, sharded_fit
    from implicit_image_tpu.sparsity.counting import xla_cost_analysis
    from implicit_image_tpu.training.fit import (
        OptimConfig,
        TrainConfig,
        fit,
        make_fit_fn,
    )

    img = synthetic_image(h, h, seed=0)
    grid = get_grid(h, h)
    mdef, mcfg = build_model("siren", depth=8, hidden_size=128)
    tc = TrainConfig(num_steps=steps, log_steps=steps)
    oc = OptimConfig()
    key = jax.random.PRNGKey(0)
    report = {"mode": "virtual-cpu" if virtual else "real", "devices": n, "h": h,
              "steps": steps, "layouts": {}}

    # single-device baseline (first device only)
    t0 = time.perf_counter()
    res1 = fit(key, mdef, mcfg, grid, img, tc, oc)
    base_wall = time.perf_counter() - t0
    report["single_device_wall_s"] = round(base_wall, 3)

    for pixel_ax in (2, 4, 8):
        if n < pixel_ax or h % pixel_ax:
            continue
        mesh = make_mesh(image=1, pixel=pixel_ax)
        t0 = time.perf_counter()
        res = sharded_fit(key, mesh, mdef, mcfg, grid, img, tc, oc)
        wall = time.perf_counter() - t0
        # numeric equality: sharding must change layout, not math
        a = np.asarray(res.params[0]["w"])
        b = np.asarray(res1.params[0]["w"])
        max_diff = float(np.max(np.abs(a - b)))

        # compiler cost model for ONE train segment under this layout
        from jax.sharding import NamedSharding, PartitionSpec as P

        fit_fn = make_fit_fn(mdef, mcfg, grid, TrainConfig(num_steps=1, log_steps=1), oc)
        jf = jax.jit(
            fit_fn,
            in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("pixel"))),
        )
        compiled = jf.lower(key, jnp.asarray(img)).compile()
        ca = compiled.cost_analysis()
        ca = dict(ca[0] if isinstance(ca, list) else ca or {})
        report["layouts"][f"pixel={pixel_ax}"] = {
            "wall_s": round(wall, 3),
            "speedup_vs_single": round(base_wall / wall, 2) if wall else None,
            "max_param_diff_vs_single": max_diff,
            "flops_per_step": ca.get("flops"),
            "bytes_accessed_per_step": ca.get("bytes accessed"),
        }
        print(f"pixel={pixel_ax}: wall={wall:.3f}s (single {base_wall:.3f}s) "
              f"max_diff={max_diff:.2e}", file=sys.stderr)

    # dense-FLOP reference for the comms/FLOP ratio
    single_ca = xla_cost_analysis(
        lambda p, g: mdef.apply(p, g, mcfg), res1.params, grid
    )
    report["single_forward_flops"] = single_ca.get("flops")
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    if "--multihost" in sys.argv:
        # DCN-path dryrun: 2 real jax.distributed processes over localhost
        # (gloo), global mesh + cross-process psum + independent-fit fleet
        # (SURVEY §2.8 multi-host scope) — no multi-host hardware needed
        import json as _json

        from implicit_image_tpu.parallel.multihost import launch_dryrun

        reports = launch_dryrun(num_processes=2)
        for r in reports:
            print(_json.dumps(r))
        ok = (
            len(reports) == 2
            and all(r["global_devices"] == 8 and r["psum_ok"] for r in reports)
            and reports[0]["fleet_psnrs"] == reports[1]["fleet_psnrs"]
        )
        print(_json.dumps({"multihost_dryrun_ok": ok}))
        sys.exit(0 if ok else 1)

    import jax as _jax

    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    default_steps = 40 if _jax.local_device_count() > 1 else 2
    main(int(kv.get("h", 512)), int(kv.get("steps", default_steps)))
