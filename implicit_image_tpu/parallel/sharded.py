"""Pixel-axis sharded fitting — one image, many chips.

The workload's "sequence axis" is the pixel axis H·W (SURVEY.md §5): the
reference always processes the full grid as one batch on one device
(compress.py:138). Here the image's ROW axis is sharded across the mesh's
"pixel" axis, so each chip owns H/n rows of the coordinate grid and target:

  * forward/backward matmuls are embarrassingly row-parallel
  * the MSE mean and parameter gradients are all-reduced by XLA (psum over
    ICI) because params are replicated while activations are sharded —
    the standard data-parallel-over-tokens layout from the scaling
    playbook, expressed with NamedSharding and left to GSPMD

Eval metrics inside the scan reduce over the sharded axis the same way, so
per-step metrics stay replicated scalars.
"""
from __future__ import annotations

import functools
import time
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

__all__ = ["make_sharded_fit_fn", "sharded_fit", "sharded_render"]


def sharded_render(
    mesh: Mesh,
    mdef: ModelDef,
    mcfg,
    params,
    height: int,
    width: int,
    roi=None,
):
    """Multi-chip decode: render (a window of) an H×W lattice with rows
    sharded over the mesh "pixel" axis.

    The decode counterpart of make_sharded_fit_fn — params are replicated,
    each chip renders rows/n of the (optionally ROI-windowed,
    data.get_grid_window) lattice, and the output stays row-sharded, so
    lattices whose per-pixel activations exceed one chip's HBM render
    across the mesh (e.g. gigapixel resolution-free decode; single-chip
    tiling is coding.render_region). Separable families (CoordX/hashgrid)
    keep their fast path: GSPMD gathers the column-coordinate vector
    where needed. The reference is single-device throughout (SURVEY.md
    §2.8)."""
    from implicit_image_tpu.data import get_grid_window

    r0, r1, c0, c1 = roi if roi is not None else (0, height, 0, width)
    n_pixel = mesh.shape["pixel"]
    if (r1 - r0) % n_pixel != 0:
        raise ValueError(
            f"window rows {r1 - r0} not divisible by pixel axis {n_pixel}"
        )
    grid = get_grid_window(height, width, r0, r1, c0, c1)
    fn = jax.jit(
        lambda p, g: mdef.apply(p, g, mcfg),
        in_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P("pixel")),
        ),
        out_shardings=NamedSharding(mesh, P("pixel")),
    )
    return fn(params, grid)


def make_sharded_fit_fn(
    mesh: Mesh,
    mdef: ModelDef,
    mcfg,
    grid,
    train_cfg: TrainConfig,
    optim_cfg: OptimConfig,
    masking_cfg=None,
):
    """Build fit(key, img) with img row-sharded over the mesh "pixel" axis.

    Params/opt state are replicated (out_shardings=None lets XLA keep its
    propagated layout; params end up replicated because every shard needs
    them)."""
    h = grid.shape[0]
    n_pixel = mesh.shape["pixel"]
    assert h % n_pixel == 0, f"H={h} not divisible by pixel axis {n_pixel}"
    fit_fn = make_fit_fn(mdef, mcfg, grid, train_cfg, optim_cfg, masking_cfg)
    return jax.jit(
        fit_fn,
        in_shardings=(
            NamedSharding(mesh, P()),  # key replicated
            NamedSharding(mesh, P("pixel")),  # img (H, W, C) sharded over rows
        ),
    )


def sharded_fit(
    key,
    mesh: Mesh,
    mdef: ModelDef,
    mcfg,
    grid,
    img,
    train_cfg: TrainConfig,
    optim_cfg: OptimConfig,
    masking_cfg=None,
) -> FitResult:
    """Compile + run one pixel-sharded fit.

    Segmented like fit()/batched_fit(): runs longer than
    train_cfg.segment_steps chain executions of one compiled segment so no
    single device execution exceeds the runtime's wall-time budget.
    """
    import numpy as _np

    from implicit_image_tpu.training.fit import make_fit_segments

    img = jnp.asarray(img)
    sparse = masking_cfg is not None and not masking_cfg.dense
    n = train_cfg.num_steps
    seg = max(1, train_cfg.segment_steps)

    if n <= seg:
        fn = make_sharded_fit_fn(
            mesh, mdef, mcfg, grid, train_cfg, optim_cfg, masking_cfg
        )
        compiled = fn.lower(key, img).compile()
        t0 = time.perf_counter()
        params, opt_state, mask_state, metrics = compiled(key, img)
        _np.asarray(jnp.ravel(metrics["loss"])[-1])  # force completion (fit.py)
        wall = time.perf_counter() - t0
        return FitResult(
            params=params,
            mask_state=mask_state if sparse else None,
            opt_state=opt_state,
            metrics=metrics,
            wall_seconds=wall,
        )

    h = grid.shape[0]
    n_pixel = mesh.shape["pixel"]
    assert h % n_pixel == 0, f"H={h} not divisible by pixel axis {n_pixel}"
    init_fn, segment_fn = make_fit_segments(
        mdef, mcfg, grid, train_cfg, optim_cfg, masking_cfg
    )
    rep = NamedSharding(mesh, P())
    img_shard = NamedSharding(mesh, P("pixel"))
    jinit = jax.jit(init_fn, in_shardings=(rep, img_shard))
    jseg = {
        length: jax.jit(
            functools.partial(segment_fn, length=length),
            in_shardings=(None, img_shard, None),
        )
        for length in {seg, n % seg or seg}
    }
    from implicit_image_tpu.training.fit import (
        estimate_step_flops,
        run_segment_chain,
    )

    carry, metrics, wall, flops = run_segment_chain(
        jinit, jseg, (key, img), (img,), n, seg,
        flops_per_step=estimate_step_flops(
            init_fn, segment_fn, (key, img), (img,)
        ),
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
