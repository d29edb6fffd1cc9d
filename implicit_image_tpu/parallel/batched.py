"""Batched multi-image fitting — vmap over the image axis.

The TPU-native replacement for the reference's Hydra-multirun / SLURM-array
sweeps (Makefile:5-6, slurm_scripts/*.sh): instead of one OS process per
image/config, the ENTIRE fit (init, scan of train steps, mask topology
updates, eval) is `jax.vmap`-ed over a batch of (key, image) pairs and
compiled once. Per-image masks are just a batched 0/1 tensor — RigL's
rank-based top-k vmaps cleanly where the reference's Python dict-of-masks
loop could not.

Sharding: with a ("image", "pixel") mesh the batch axis is laid out over
"image" so B/n_image fits run per chip with zero cross-chip traffic (the
fits are independent) — 64+ concurrent fits per chip is a tracked
BASELINE.md target.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from implicit_image_tpu.models import ModelDef
from implicit_image_tpu.training.fit import (
    FitResult,
    OptimConfig,
    TrainConfig,
    make_fit_fn,
)

__all__ = ["make_batched_fit_fn", "batched_fit"]


def make_batched_fit_fn(
    mdef: ModelDef,
    mcfg,
    grid,
    train_cfg: TrainConfig,
    optim_cfg: OptimConfig,
    masking_cfg=None,
    mesh: Optional[Mesh] = None,
    init_params=None,
):
    """Build fit(keys (B,), imgs (B,H,W,C)) -> batched results, jitted.

    With a mesh, inputs/outputs are sharded over the "image" axis.
    `init_params` (unbatched) warm-starts EVERY lane from the same
    meta-learned init (training/metainit.py) — the fleet-encode use case.
    """
    fit_fn = jax.vmap(
        make_fit_fn(mdef, mcfg, grid, train_cfg, optim_cfg, masking_cfg,
                    init_params)
    )
    if mesh is None:
        return jax.jit(fit_fn)
    batch_sharding = NamedSharding(mesh, P("image"))
    return jax.jit(
        fit_fn,
        in_shardings=(batch_sharding, batch_sharding),
        out_shardings=batch_sharding,
    )


def batched_fit(
    key,
    mdef: ModelDef,
    mcfg,
    grid,
    imgs,
    train_cfg: TrainConfig,
    optim_cfg: OptimConfig,
    masking_cfg=None,
    mesh: Optional[Mesh] = None,
    init_params=None,
) -> FitResult:
    """Fit a batch of images concurrently; one compile, one launch.

    imgs: (B, H, W, C). Each image gets an independent PRNG fold of `key`.
    """
    import numpy as _np

    imgs = jnp.asarray(imgs)
    b = imgs.shape[0]
    keys = jax.random.split(key, b)
    sparse = masking_cfg is not None and not masking_cfg.dense

    # Per-execution wall budget is shared by the whole batch (the runtime
    # kills executions ~60 s, see fit.py): shrink the per-segment step
    # count by the batch size.
    n = train_cfg.num_steps
    seg = max(1, train_cfg.segment_steps // max(1, b))

    from implicit_image_tpu.training.fit import plan_precision_schedule

    early_prec, switch_step, plan_main, plan_early = (
        plan_precision_schedule(train_cfg, n, seg)
    )

    if n <= seg and not early_prec:
        fn = make_batched_fit_fn(
            mdef, mcfg, grid, train_cfg, optim_cfg, masking_cfg, mesh,
            init_params,
        )
        compiled = fn.lower(keys, imgs).compile()
        t0 = time.perf_counter()
        params, opt_state, mask_state, metrics = compiled(keys, imgs)
        _np.asarray(jnp.ravel(metrics["loss"])[-1])  # force completion (fit.py)
        wall = time.perf_counter() - t0
        return FitResult(
            params=params,
            mask_state=mask_state if sparse else None,
            opt_state=opt_state,
            metrics=metrics,
            wall_seconds=wall,
        )

    from implicit_image_tpu.training.fit import make_fit_segments

    init_fn, segment_fn = make_fit_segments(
        mdef, mcfg, grid, train_cfg, optim_cfg, masking_cfg, init_params
    )
    shard = NamedSharding(mesh, P("image")) if mesh is not None else None

    vinit = (
        jax.jit(jax.vmap(init_fn))
        if shard is None
        else jax.jit(
            jax.vmap(init_fn), in_shardings=(shard, shard), out_shardings=shard
        )
    )

    def _vsegs_for(seg_fn, lengths):
        out = {}
        for length in lengths:
            vf = jax.vmap(
                lambda c, im, s, _l=length, _f=seg_fn: _f(c, im, s, _l),
                in_axes=(0, 0, None),
            )
            out[length] = (
                jax.jit(vf)
                if shard is None
                else jax.jit(
                    vf, in_shardings=(shard, shard, None), out_shardings=shard
                )
            )
        return out

    vsegs = _vsegs_for(segment_fn, plan_main)
    vsegs_early = None
    if early_prec:
        # precision annealing rides the batch exactly as single fits
        # (training/fit.py plan_precision_schedule)
        import dataclasses as _dc

        _, segment_fn_e = make_fit_segments(
            mdef, mcfg, grid,
            _dc.replace(train_cfg, matmul_precision=early_prec),
            optim_cfg, masking_cfg, init_params,
        )
        vsegs_early = _vsegs_for(segment_fn_e, plan_early)

    from implicit_image_tpu.training.fit import (
        estimate_step_flops,
        run_segment_chain,
    )

    # per-step FLOPs for the whole batch = one image's cost model x B
    fps1 = estimate_step_flops(
        init_fn, segment_fn, (keys[0], imgs[0]), (imgs[0],)
    )
    carry, metrics, wall, flops = run_segment_chain(
        vinit, vsegs, (keys, imgs), (imgs,), n, seg, concat_axis=1,
        flops_per_step=fps1 * imgs.shape[0] if fps1 else None,
        jsegs_early=vsegs_early, switch_step=switch_step,
    )
    params, opt_state, mask_state = carry[0], carry[1], carry[2]
    return FitResult(
        params=params,
        mask_state=mask_state if sparse else None,
        opt_state=opt_state,
        metrics=metrics,
        wall_seconds=wall,
        flops=flops,
    )
