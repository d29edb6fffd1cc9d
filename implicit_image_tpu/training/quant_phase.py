"""Quantization-aware finetune phase — one compiled scan, like the fit.

Reproduces the reference's quant phase (compress.py:172-240): deepcopy the
fitted model, build a FRESH optimizer with the quantize-mode scheduler
StepLR(1000, 0.5) (train_helper.py:79-80), then `quant.num_steps` train
steps where every forward snaps weights to the codebook (KmeansQuant
forward-pre hooks, kmeans.py:65-71) and the optimizer steps FROM the
snapped values (weight.data replacement semantics). The sparsity mask keeps
being applied (compress.py:187-188 passes mask into train_epoch).

Returns final (snapped params, codebooks) via `convert` — the reference's
`q.convert()` (context.py:24-33).
"""
from __future__ import annotations

import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from implicit_image_tpu.models import ModelDef
from implicit_image_tpu.ops.metrics import mse, psnr_8bit
from implicit_image_tpu.optim import (
    adam_init,
    adam_update,
    shampoo_init,
    shampoo_update,
    step_lr,
)
from implicit_image_tpu.quant import QuantConfig, convert, quantize_params
from implicit_image_tpu.sparsity import MaskState, apply_masks, mask_grads
from implicit_image_tpu.training.fit import OptimConfig

__all__ = ["QuantResult", "make_quant_fit_fn", "quant_finetune"]


class QuantResult(NamedTuple):
    params: Any  # snapped params (weights == centroids[labels])
    codebooks: Any  # per-layer LayerCodebook or None
    metrics: Dict[str, jnp.ndarray]
    wall_seconds: float


def make_quant_fit_fn(
    mdef: ModelDef,
    mcfg,
    grid,
    quant_cfg: QuantConfig,
    optim_cfg: OptimConfig,
    masks: Optional[Tuple] = None,
    compute_dtype=None,
):
    """Build quant_fit(params, img) -> (final params, metrics).

    Pure in (params, img): vmap/shard it like the fit itself.
    `masks` is the (static-structure) mask tuple from the sparse fit, or
    None for dense models.
    """
    h, w, c = grid.shape
    coords = grid.reshape(h * w, c)
    # quantize-mode scheduler: StepLR(1000, 0.5) (train_helper.py:79-80)
    schedule = step_lr(optim_cfg.lr, 1000, 0.5)

    def quant_fit(params, img):
        target_flat = img.reshape(h * w, -1)

        def loss_fn(params):
            pred = mdef.apply_flat(params, coords, mcfg, compute_dtype)
            return mse(pred, target_flat)

        grad_fn = jax.value_and_grad(loss_fn)

        if optim_cfg.name == "adam":
            opt_state = adam_init(params)
        else:
            opt_state = shampoo_init(params, optim_cfg.epsilon)

        def step_fn(carry, step):
            params, opt_state = carry
            # snap to codebook (forward-pre-hook equivalent)
            params_q = quantize_params(params, quant_cfg)
            if masks is not None:
                params_q = apply_masks(params_q, masks)
            loss, grads = grad_fn(params_q)
            lr = schedule(step)
            if optim_cfg.name == "adam":
                new_params, opt_state = adam_update(grads, opt_state, params_q, lr)
            else:
                new_params, opt_state = shampoo_update(
                    grads,
                    opt_state,
                    params_q,
                    lr,
                    momentum=optim_cfg.momentum,
                    weight_decay=optim_cfg.weight_decay,
                )
            if masks is not None:
                new_params = apply_masks(new_params, masks)
            return (new_params, opt_state), {"loss": loss}

        (params, _), metrics = jax.lax.scan(
            step_fn, (params, opt_state), jnp.arange(quant_cfg.num_steps)
        )

        # final snap + codebook freeze (q.convert)
        params_q, codebooks = convert(params, quant_cfg)
        if masks is not None:
            params_q = apply_masks(params_q, masks)
        # final eval (compress.py:208-216 "Quant PSNR")
        pred = mdef.apply_flat(params_q, coords, mcfg, compute_dtype)
        qloss = mse(pred, target_flat)
        metrics = {
            **metrics,
            "quant_loss": qloss,
            "quant_psnr": 10.0 * jnp.log10(1.0 / qloss),
            "quant_psnr_8bit": psnr_8bit(pred, target_flat),
        }
        return params_q, codebooks, metrics

    return quant_fit


def quant_finetune(
    params,
    img,
    mdef: ModelDef,
    mcfg,
    grid,
    quant_cfg: QuantConfig,
    optim_cfg: OptimConfig,
    masks=None,
    compute_dtype=None,
) -> QuantResult:
    """Compile + run the quant phase once (single image)."""
    fn = jax.jit(
        make_quant_fit_fn(mdef, mcfg, grid, quant_cfg, optim_cfg, masks, compute_dtype)
    )
    img = jnp.asarray(img)
    compiled = fn.lower(params, img).compile()
    t0 = time.perf_counter()
    params_q, codebooks, metrics = compiled(params, img)
    jax.block_until_ready(params_q)
    return QuantResult(
        params=params_q,
        codebooks=codebooks,
        metrics=metrics,
        wall_seconds=time.perf_counter() - t0,
    )
