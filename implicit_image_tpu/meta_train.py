"""Meta-init training CLI — `python -m implicit_image_tpu.meta_train`.

Produces the .npz warm-start artifact any fit can consume via
`train.init_path` (compress.py). Uses the same composed-config CLI as the
rest of the framework; `meta.*` keys configure the REPTILE loop
(training/metainit.py — Tancik et al. arXiv:2012.02189 via the
first-order REPTILE estimator, arXiv:1803.02999):

    python -m implicit_image_tpu.meta_train mlp=coordx \
        img.height=512 img.width=512 \
        meta.pool_size=16 meta.inner_steps=100 meta.outer_steps=200 \
        meta.out=outputs/meta/coordx.npz

The reference has no equivalent — every reference run starts from the
random init (/root/reference/implicit_image/compress.py:74-77).
"""
from __future__ import annotations

import logging
import sys
from pathlib import Path

from implicit_image_tpu.config import compose
from implicit_image_tpu.models import build_model_from_config
from implicit_image_tpu.training.metainit import (
    MetaConfig,
    meta_pool,
    meta_train,
    save_meta_init,
)
from implicit_image_tpu.utils import catch_error_decorator

log = logging.getLogger(__name__)


def _largest_divisor_leq(n: int, k: int) -> int:
    for d in range(min(n, k), 0, -1):
        if n % d == 0:
            return d
    return 1


def run(cfg) -> str:
    """Meta-train from a composed config; returns the artifact path."""
    from implicit_image_tpu.data import get_grid

    h = int(cfg.img.height)
    w = int(cfg.img.width)
    meta_raw = dict(cfg.get("meta") or {})
    out = meta_raw.pop("out", None)
    fields = {
        k: v for k, v in meta_raw.items()
        if k in MetaConfig.__dataclass_fields__
    }
    meta_cfg = MetaConfig(**{
        k: (type(MetaConfig.__dataclass_fields__[k].default)(v))
        for k, v in fields.items()
    })
    # clamp chunk to a divisor of outer_steps (execution-count detail,
    # not math) so users can't trip the divisibility check from the CLI
    chunk = _largest_divisor_leq(meta_cfg.outer_steps, meta_cfg.chunk)
    if chunk != meta_cfg.chunk:
        import dataclasses

        meta_cfg = dataclasses.replace(meta_cfg, chunk=chunk)

    mdef, mcfg = build_model_from_config(cfg)
    grid = get_grid(h, w)
    pool = meta_pool(h, w, meta_cfg.pool_size)
    log.info(
        "meta-train: %s %dx%d pool=%d inner=%d outer=%d batch=%d",
        mdef.name, h, w, meta_cfg.pool_size, meta_cfg.inner_steps,
        meta_cfg.outer_steps, meta_cfg.meta_batch,
    )

    def progress(step, loss):
        log.info("meta-step %d/%d post-adapt loss %.3e",
                 step, meta_cfg.outer_steps, loss)

    prec = cfg.get("train", {}).get("matmul_precision") or None
    if prec:
        # meta-train under the same MXU pass precision the consuming fits
        # will use — the basin is precision-specific (metainit.py
        # save_meta_init docstring)
        import jax as _jax

        with _jax.default_matmul_precision(str(prec)):
            params, losses, wall = meta_train(
                mdef, mcfg, grid, pool, meta_cfg, log=progress
            )
    else:
        params, losses, wall = meta_train(
            mdef, mcfg, grid, pool, meta_cfg, log=progress
        )
    out = out or f"outputs/meta/{mdef.name}_{h}x{w}.npz"
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    save_meta_init(out, params, mdef.name, mcfg, matmul_precision=prec)
    log.info("meta-train: %.1fs, final post-adapt loss %.3e -> %s",
             wall, float(losses[-1]), out)
    print(f"META_INIT path={out} wall_s={wall:.1f} "
          f"final_loss={float(losses[-1]):.4e}")
    return out


@catch_error_decorator
def cli(argv=None) -> None:
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )
    argv = list(sys.argv[1:] if argv is None else argv)
    run(compose(argv))


if __name__ == "__main__":
    cli()
