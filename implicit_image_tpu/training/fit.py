"""The fit loop — one compiled XLA program per fit.

The reference runs a Python loop of `train_epoch` calls (compress.py:137,
train_helper.py:132-185): full-grid forward, MSE, backward, optimizer step,
re-apply mask, and a mask topology update every `interval` steps. Here the
ENTIRE fit is a single `jax.lax.scan` under `jit`:

  * full-grid matmul chain forward/backward (the H·W pixel axis is the large
    MXU dimension)
  * functional Adam / Shampoo update with StepLR(2000, 0.5) closed form
  * mask re-application each step, topology updates under `lax.cond`
    gated on (step % interval == 0) & (step <= end_when) — both branches
    are compiled once; only the taken branch executes at runtime
  * eval metrics (PSNR / PSNR_8bit) computed under `lax.cond` at the
    log cadence, emitted as per-step arrays

Because the program is pure in (key, image), it is `jax.vmap`-compatible:
batched multi-image fitting (the TPU-native replacement for the reference's
Hydra-multirun sweeps) falls out for free — see parallel/batched.py.

Reference AMP note: the reference's autocast context is never actually
entered (train_helper.py:44,141 looks up the wrong kwarg), so its effective
compute is fp32 with loss scaling. We default to fp32 compute and expose
bfloat16 via TrainConfig.compute_dtype (no loss scaling needed on TPU).
"""
from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from implicit_image_tpu.models import ModelDef
from implicit_image_tpu.ops.metrics import mse, psnr_8bit
from implicit_image_tpu.optim import adam_momentum, opt_init, opt_update, step_lr
from implicit_image_tpu.sparsity import (
    MaskState,
    MaskingConfig,
    apply_masks,
    build_decay,
    create_mask_state,
    load_lottery_masks,
    mask_grads,
    mask_momentum,
    total_density,
    update_connections,
)

__all__ = [
    "TrainConfig",
    "OptimConfig",
    "FitResult",
    "make_train_step",
    "make_fit_segments",
    "run_segment_chain",
    "make_fit_fn",
    "fit",
]


@dataclass(frozen=True)
class TrainConfig:
    """Mirrors the reference's cfg.train block (conf/config.yaml:17-24)."""

    num_steps: int = 2000
    log_steps: int = 1000
    compute_dtype: Optional[str] = None  # None -> float32; "bfloat16" for MXU bf16
    multiplier: int = 1
    save_weights: bool = True
    use_pallas: bool = False  # fused sine-MLP Pallas kernel (siren only)
    # jax.checkpoint the forward (saves forward-pass residency only; the
    # backward recompute still materializes all activations, so this does
    # NOT reduce peak memory — pixel_chunks does).
    remat: bool = False
    # Gradient accumulation over the pixel axis: the full-grid loss/grad is
    # computed as a lax.scan over `pixel_chunks` equal coordinate chunks,
    # bounding activation memory at (batch · HW/pixel_chunks · width) per
    # layer. Required for large vmapped batches — 64 concurrent 256² fits
    # store ~15 GB of backward activations unchunked, exceeding v5e HBM.
    # The accumulated gradient is bit-equivalent to the full-batch gradient
    # (MSE over equal chunks averages exactly).
    pixel_chunks: int = 1
    # Longest scan executed as ONE device program. Runs with more steps are
    # chained as several executions of the same compiled segment (identical
    # math — the step index is global). Needed because the axon TPU tunnel
    # kills single executions around ~60 s wall (2000 steps ≈ 14 s at the
    # w128 operating point leaves ample margin; lower it for wide models).
    segment_steps: int = 2000
    # Training objective: "mse" (reference parity, default) or "ms-ssim"
    # (perceptual: (1-w)*MSE + w*(1 - MS-SSIM), Zhao et al.
    # arXiv:1511.08861's mix). MS-SSIM is not sum-decomposable over pixel
    # chunks, so it requires pixel_chunks=1; eval metrics stay PSNR-based
    # either way (the protocol's distortion axis).
    loss: str = "mse"
    ssim_weight: float = 0.84
    # MXU pass precision for the fit's matmuls: None (JAX default = ONE
    # bf16 pass on TPU) | "tensorfloat32" (3 passes) | "float32" (6) |
    # "bfloat16" (explicit 1). The torch reference computes fp32, and the
    # single-pass default is MEASURED to cost the protocol SIREN 6.3 dB
    # of converged quality; "tensorfloat32" recovers it at +32% wall
    # (BASELINE.md "Matmul pass precision").
    matmul_precision: Optional[str] = None
    # Precision ANNEALING (round 5, measured — BASELINE.md "Precision
    # schedule"): run the first `matmul_precision_switch` fraction of
    # steps at `matmul_precision_early` passes and only the convergence
    # tail at `matmul_precision`. Early-phase 1-pass noise costs nothing
    # (measured slightly BETTER converged quality: protocol SIREN
    # 59.21 dB @ 15.3 s vs 58.46 @ 24.6 s all-tf32) because only the
    # converged basin needs the extra passes. None = no schedule
    # (every step at matmul_precision). The switch is an exact step
    # index (round(num_steps * switch)); segments are planned around it.
    matmul_precision_early: Optional[str] = None
    matmul_precision_switch: float = 0.75


@dataclass(frozen=True)
class OptimConfig:
    """Mirrors conf/optim/*.yaml."""

    name: str = "adam"
    lr: float = 3e-4
    momentum: float = 0.9
    weight_decay: float = 0.0
    epsilon: float = 1e-4
    update_freq: int = 1
    # "ekfac" enables the EKFAC natural-gradient preconditioner
    # (optim/ekfac.py; the reference plumbs-but-never-constructs it,
    # train_helper.py:163-164 — here it is a live capability)
    preconditioner: Optional[str] = None
    precond_eps: float = 0.1
    precond_interval: int = 10
    # Shampoo: rescale the preconditioned direction to the momentum-grad
    # norm (distributed-Shampoo grafting; raw torch_optimizer semantics
    # diverge at the reference's lr - see optim/shampoo.py)
    graft_norm: bool = True
    # StepLR params (train_helper.py:81-84)
    lr_step_size: int = 2000
    lr_gamma: float = 0.5
    # "step" (reference parity, default) or "cosine" (opt-in: linear
    # warmup + cosine decay over the FULL num_steps budget — pays at
    # short time-to-quality budgets, see BASELINE.md)
    lr_schedule: str = "step"
    lr_warmup: int = 0
    # opt-in global-norm gradient clipping (0 = off, the reference's
    # behavior). Guard rail for the w=512 @ lr 3e-4 collapse documented
    # in BASELINE.md tracked config 2; see optim.clip_by_global_norm.
    grad_clip: float = 0.0


class FitResult(NamedTuple):
    params: Any
    mask_state: Optional[MaskState]
    opt_state: Any
    metrics: Dict[str, jnp.ndarray]
    wall_seconds: float
    # early stop (fit(stop_psnr=...)): global step the fit halted at and
    # the boundary-eval PSNR that triggered it; None when the full budget
    # ran. Metric arrays then cover only the executed steps.
    stopped_at: Optional[int] = None
    stop_psnr_db: Optional[float] = None
    # total FLOPs of the executed fit programs from XLA's own cost model
    # (compiled.cost_analysis(); None when the backend reports no model).
    # achieved TFLOPS = flops / wall_seconds / 1e12 — reported by bench.py
    # so the shape-ceiling claim is auditable from BENCH_r*.json alone.
    flops: Optional[float] = None


def estimate_step_flops(init_fn, segment_fn, init_args, seg_args):
    """FLOPs of ONE training step, from XLA's cost model.

    Lowers a length-1 segment program against abstract shapes (eval_shape
    carry) and runs HLO cost analysis on the CPU BACKEND explicitly —
    flop counts are platform-independent, the CPU analysis is local and
    ~0.3-0.6 s of host work, and crucially it never touches the device
    runtime (measured: Lowered.cost_analysis against the tunneled TPU
    backend stalls for MINUTES on sparse fit programs — it ships the HLO
    to the server's cost model). XLA's cost model counts a while/scan
    body ONCE regardless of trip count (verified on cpu and TPU), so the
    faithful total for a fit is per-step FLOPs x executed steps — NOT
    cost_analysis() of the scanned program. Returns None when no local
    cpu backend or no cost model is available."""
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            carry = jax.eval_shape(init_fn, *init_args)
            low = jax.jit(functools.partial(segment_fn, length=1)).trace(
                carry, *seg_args, jnp.int32(0)
            ).lower()
            ca = low.cost_analysis()
    except Exception:  # noqa: BLE001 - backend-dependent API
        return None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else None
    if not isinstance(ca, dict):
        return None
    f = ca.get("flops")
    return float(f) if f is not None and f > 0 else None


def _needs_momentum(masking_cfg: Optional[MaskingConfig]) -> bool:
    if masking_cfg is None:
        return False
    return (
        masking_cfg.growth_mode == "momentum"
        or masking_cfg.redistribution_mode == "momentum"
    )


def _compute_dtype(train_cfg: TrainConfig):
    if train_cfg.compute_dtype in (None, "float32", "fp32"):
        return None
    return jnp.dtype(train_cfg.compute_dtype)


def make_loss_fn(
    mdef: ModelDef,
    mcfg,
    coords,
    target_flat,
    compute_dtype,
    use_pallas=False,
    remat=False,
    grid_hw=None,
    loss_name="mse",
    ssim_weight=0.84,
    matmul_precision=None,
):
    apply_flat = mdef.apply_flat
    if use_pallas and mdef.name == "siren":
        from implicit_image_tpu.ops.sine_mlp import siren_apply_flat_pallas

        apply_flat = lambda p, c, cfg, dt: siren_apply_flat_pallas(p, c, cfg)

    if loss_name == "ms-ssim":
        if grid_hw is None:
            raise ValueError("loss='ms-ssim' needs the (H, W) grid geometry")
        from implicit_image_tpu.ops.ssim import ms_ssim

        gh, gw = grid_hw
        win = 11
        levels = 1
        while levels < 5 and min(gh, gw) >= win * 2 ** levels:
            levels += 1
        c_out = target_flat.shape[-1]
        target_img = target_flat.reshape(gh, gw, c_out)
        w_mix = float(ssim_weight)

        def distortion(pred_flat):
            pred_img = pred_flat.reshape(gh, gw, c_out)
            ms = ms_ssim(pred_img, target_img, levels=levels, win_size=win)
            return (1.0 - w_mix) * mse(pred_flat, target_flat) + w_mix * (
                1.0 - ms
            )

    else:
        distortion = lambda pred_flat: mse(pred_flat, target_flat)

    if grid_hw is not None and mdef.separable and not use_pallas:
        # separable models (CoordX) run their early layers O(H+W) on the
        # tensor-product grid — evaluate the loss through the factorized
        # grid path instead of the flattened coordinate list
        h, w = grid_hw
        grid = coords.reshape(h, w, coords.shape[-1])

        def raw_loss_fn(params):
            pred = mdef.apply(params, grid, mcfg, compute_dtype)
            return distortion(pred.reshape(h * w, -1))

    else:

        def raw_loss_fn(params):
            pred = apply_flat(params, coords, mcfg, compute_dtype)
            return distortion(pred)

    if matmul_precision:
        # MXU pass precision for the fit's dot_generals (train.
        # matmul_precision). The silent TPU default is ONE bf16 pass —
        # measured to cost the protocol SIREN 6.3 dB of converged fit
        # quality vs "tensorfloat32" (3 passes) at +32% wall
        # (BASELINE.md "Matmul pass precision"). The precision attr is
        # baked into the primal dots at trace time, so the backward
        # transpose inherits it.
        raw = raw_loss_fn

        def loss_fn(params):
            with jax.default_matmul_precision(matmul_precision):
                return raw(params)

    else:
        loss_fn = raw_loss_fn

    if remat:
        loss_fn = jax.checkpoint(loss_fn)
    return loss_fn


def make_train_step(
    mdef: ModelDef,
    mcfg,
    coords,
    target_flat,
    train_cfg: TrainConfig,
    optim_cfg: OptimConfig,
    masking_cfg: Optional[MaskingConfig] = None,
    grid_hw=None,
):
    """Build the pure (carry, step) -> (carry, metrics) scan body."""
    compute_dtype = _compute_dtype(train_cfg)
    loss_name = getattr(train_cfg, "loss", "mse")
    if loss_name not in ("mse", "ms-ssim"):
        raise ValueError(f"train.loss must be 'mse' or 'ms-ssim', got {loss_name!r}")
    if loss_name == "ms-ssim" and train_cfg.pixel_chunks > 1:
        # the SSIM windows straddle chunk boundaries — the chunked gradient
        # accumulation is only exact for sum-decomposable losses
        raise ValueError("loss='ms-ssim' requires pixel_chunks=1")
    loss_fn = make_loss_fn(
        mdef,
        mcfg,
        coords,
        target_flat,
        compute_dtype,
        train_cfg.use_pallas,
        train_cfg.remat,
        grid_hw=grid_hw,
        loss_name=loss_name,
        ssim_weight=getattr(train_cfg, "ssim_weight", 0.84),
        matmul_precision=getattr(train_cfg, "matmul_precision", None),
    )
    if getattr(optim_cfg, "lr_schedule", "step") == "cosine":
        from implicit_image_tpu.optim import cosine_lr

        schedule = cosine_lr(
            optim_cfg.lr, train_cfg.num_steps,
            warmup=int(getattr(optim_cfg, "lr_warmup", 0)),
        )
    else:
        schedule = step_lr(
            optim_cfg.lr, optim_cfg.lr_step_size, optim_cfg.lr_gamma
        )
    sparse = masking_cfg is not None and not masking_cfg.dense
    decay_fn = build_decay(masking_cfg) if sparse else None

    if train_cfg.pixel_chunks > 1:
        n = coords.shape[0]
        k = train_cfg.pixel_chunks
        if n % k:
            raise ValueError(f"pixel_chunks={k} must divide pixel count {n}")
        # separable models (CoordX) keep their O(H+W) factorized branches
        # under chunking when chunks are whole row blocks: each contiguous
        # H/k-row slice of a tensor-product grid is itself a tensor
        # product, so the chunk loss runs the separable grid path with the
        # same memory bound ((H/k)·W fused activations per chunk)
        sub_hw = None
        if (grid_hw is not None and mdef.separable
                and not train_cfg.use_pallas and grid_hw[0] % k == 0):
            sub_hw = (grid_hw[0] // k, grid_hw[1])
        coords_c = coords.reshape(k, n // k, coords.shape[-1])
        target_c = target_flat.reshape(k, n // k, target_flat.shape[-1])

        def grad_fn(params):
            def chunk_loss(p, c, t):
                # matmul_precision MUST ride the per-chunk loss too: the
                # r5 multi-seed precision ladder caught the chunked path
                # silently dropping it (a pixel_chunks>1 "tf32" fit ran
                # 1-pass bf16, −6 dB converged — BASELINE.md "Multi-seed
                # precision bar"); regression-pinned by
                # tests/test_fit.py::test_matmul_precision_reaches_chunked_loss
                return make_loss_fn(
                    mdef, mcfg, c, t, compute_dtype,
                    train_cfg.use_pallas, train_cfg.remat,
                    grid_hw=sub_hw,
                    matmul_precision=getattr(
                        train_cfg, "matmul_precision", None),
                )(p)

            def body(acc, ct):
                c, t = ct
                l, g = jax.value_and_grad(chunk_loss)(params, c, t)
                acc_l, acc_g = acc
                return (
                    acc_l + l,
                    jax.tree_util.tree_map(jnp.add, acc_g, g),
                ), None

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                body, (jnp.zeros((), jnp.float32), zero_g), (coords_c, target_c)
            )
            inv = 1.0 / k
            return loss_sum * inv, jax.tree_util.tree_map(
                lambda g: g * inv, grad_sum
            )

    else:
        grad_fn = jax.value_and_grad(loss_fn)

    use_ekfac = optim_cfg.preconditioner == "ekfac"
    if (use_ekfac and train_cfg.pixel_chunks > 1
            and mdef.name == "wavelet_siren"):
        # the chunked capture accumulates per-pixel Grams; wavelet_siren
        # renders on its own full DWT grids and cannot chunk
        raise ValueError(
            "preconditioner='ekfac' with pixel_chunks>1 is undefined for "
            "full-grid models (wavelet_siren)"
        )
    if use_ekfac and mdef.name.startswith("feather"):
        # Feathermap params are (V1, V2, scalers), not layer weights; the
        # EKFAC capture needs materialized per-layer (a, g)
        raise ValueError("preconditioner='ekfac' does not support Feathermap models")

    def train_step(carry, step):
        params, opt_state, mask_state, key, ekfac_state = carry
        loss, grads = grad_fn(params)

        if sparse and not masking_cfg.dense_gradients:
            grads = mask_grads(grads, mask_state.masks)

        if use_ekfac:
            from implicit_image_tpu.optim.ekfac import (
                capture_layer_stats,
                ekfac_precondition,
                ekfac_update_stats,
                ekfac_update_stats_chunked,
                model_skip_indices,
            )

            # recompute eigenbases every precond_interval steps; KFE second
            # moments update every step (EKFAC's amortized schedule)
            if train_cfg.pixel_chunks > 1:
                # chunked capture: Gram accumulation over pixel chunks
                # bounds activation memory like the loss/grad path does
                def with_eigs(st):
                    return ekfac_update_stats_chunked(
                        st, mdef, mcfg, params, coords, target_flat,
                        train_cfg.pixel_chunks, recompute_eigs=True,
                    )

                def without_eigs(st):
                    return ekfac_update_stats_chunked(
                        st, mdef, mcfg, params, coords, target_flat,
                        train_cfg.pixel_chunks, recompute_eigs=False,
                    )
            else:
                acts, pgrads = capture_layer_stats(
                    mdef, mcfg, params, coords, target_flat
                )

                def with_eigs(st):
                    return ekfac_update_stats(
                        st, acts, pgrads, recompute_eigs=True
                    )

                def without_eigs(st):
                    return ekfac_update_stats(
                        st, acts, pgrads, recompute_eigs=False
                    )

            ekfac_state = jax.lax.cond(
                step % optim_cfg.precond_interval == 0,
                with_eigs,
                without_eigs,
                ekfac_state,
            )
            grads = ekfac_precondition(
                ekfac_state, grads, eps=optim_cfg.precond_eps,
                skip=model_skip_indices(mdef.name, params),
            )

        lr = schedule(step)
        params, opt_state = opt_update(grads, opt_state, params, lr, optim_cfg)

        prune_rate = jnp.zeros((), jnp.float32)
        density = jnp.ones((), jnp.float32)
        if sparse:
            params = apply_masks(params, mask_state.masks)
            if not masking_cfg.dense_gradients:
                opt_state = mask_momentum(opt_state, mask_state.masks)

            current_sparsity = 1.0 - total_density(mask_state)
            prune_rate = decay_fn(
                step, current_sparsity,
                final_sparsity=mask_state.final_sparsity,
            )

            def do_update(args):
                params, opt_state, mask_state, key = args
                key, ukey = jax.random.split(key)
                if _needs_momentum(masking_cfg):
                    momenta = [
                        adam_momentum(opt_state, i) if m is not None else None
                        for i, m in enumerate(mask_state.masks)
                    ]
                else:
                    momenta = [None] * len(mask_state.masks)
                new_params, new_mask_state = update_connections(
                    params, grads, momenta, mask_state, prune_rate, ukey, masking_cfg
                )
                return new_params, opt_state, new_mask_state, key

            def no_update(args):
                return args

            # reference cadence (compress.py:141-143): update when
            # i <= end_when and (i+1) % interval == 0 — NEVER at step 0,
            # so a lottery-ticket run with end_when=0 keeps its mask frozen
            should = ((step + 1) % masking_cfg.interval == 0) & (
                step <= masking_cfg.end_when
            )
            params, opt_state, mask_state, key = jax.lax.cond(
                should, do_update, no_update, (params, opt_state, mask_state, key)
            )
            density = total_density(mask_state)

        # eval at the log cadence: (i+1) % log_steps == 0 (compress.py:146),
        # plus the final step so short runs (num_steps < log_steps) still
        # report a PSNR instead of NaN
        should_log = ((step + 1) % train_cfg.log_steps == 0) | (
            step == train_cfg.num_steps - 1
        )

        def eval_branch(params):
            # eval forward at the SAME matmul precision as the training
            # loss — a 1-pass bf16 eval render caps the READING near
            # ~53 dB and would misreport a tf32 trajectory that actually
            # sits at 58+ (measured; BASELINE.md "Matmul pass precision")
            mp = getattr(train_cfg, "matmul_precision", None)

            def fwd(params):
                if grid_hw is not None and mdef.separable:
                    gh, gw = grid_hw
                    return mdef.apply(
                        params, coords.reshape(gh, gw, -1), mcfg,
                        compute_dtype,
                    ).reshape(gh * gw, -1)
                return mdef.apply_flat(params, coords, mcfg, compute_dtype)

            if mp:
                with jax.default_matmul_precision(mp):
                    pred = fwd(params)
            else:
                pred = fwd(params)
            test_loss = mse(pred, target_flat)
            return (
                test_loss,
                10.0 * jnp.log10(1.0 / test_loss),
                psnr_8bit(pred, target_flat),
            )

        def no_eval(params):
            nan = jnp.full((), jnp.nan, jnp.float32)
            return nan, nan, nan

        test_loss, test_psnr, test_psnr8 = jax.lax.cond(
            should_log, eval_branch, no_eval, params
        )

        metrics = {
            "loss": loss,
            "test_loss": test_loss,
            "psnr": test_psnr,
            "psnr_8bit": test_psnr8,
            "density": density,
            "prune_rate": prune_rate,
        }
        return (params, opt_state, mask_state, key, ekfac_state), metrics

    return train_step


def make_fit_segments(
    mdef: ModelDef,
    mcfg,
    grid,
    train_cfg: TrainConfig,
    optim_cfg: OptimConfig,
    masking_cfg: Optional[MaskingConfig] = None,
    init_params=None,
):
    """Build (init_fn, segment_fn) for segmented execution.

    init_fn(key, img) -> carry; segment_fn(carry, img, start, length) scans
    `length` (static) train steps whose GLOBAL step indices begin at `start`
    (traced), returning (carry, metrics). Splitting a long fit into several
    compiled executions of the same segment program is required on runtimes
    that bound single-execution wall time (the axon tunnel kills executions
    around ~60 s; a 5x-multiplier finals fit runs ~71 s monolithic).
    """
    h, w, c = grid.shape
    coords = grid.reshape(h * w, c)
    sparse = masking_cfg is not None and not masking_cfg.dense
    # lottery-ticket / resume masks come from a prior run's npz; load once
    # host-side at build time (file IO can't live inside the jitted init)
    lottery = (
        load_lottery_masks(masking_cfg.mask_path)
        if sparse and masking_cfg.mask_path
        else None
    )

    def init_fn(key, img):
        key, init_key, mask_key, loop_key = jax.random.split(key, 4)
        # transplanted / warm-start weights (e.g. the mechanical
        # trajectory-parity tests load the reference's torch init here);
        # the RNG split stays identical so masks/loop keys don't shift
        params = init_params if init_params is not None else mdef.init(
            init_key, mcfg
        )
        opt_state = opt_init(params, optim_cfg)
        if sparse:
            mask_state = create_mask_state(
                mask_key, params, masking_cfg, lottery_masks=lottery
            )
            params = apply_masks(params, mask_state.masks)
        else:
            mask_state = _dummy_mask_state(params)
        if optim_cfg.preconditioner == "ekfac":
            from implicit_image_tpu.optim.ekfac import (
                ekfac_init,
                model_skip_indices,
            )

            ekfac_state = ekfac_init(
                params, model_skip_indices(mdef.name, params)
            )
        else:
            ekfac_state = ()
        return (params, opt_state, mask_state, loop_key, ekfac_state)

    def segment_fn(carry, img, start, length: int):
        target_flat = img.reshape(h * w, -1)
        train_step = make_train_step(
            mdef, mcfg, coords, target_flat, train_cfg, optim_cfg,
            masking_cfg if sparse else None,
            grid_hw=(h, w),
        )
        steps = jnp.asarray(start, jnp.int32) + jnp.arange(length)
        return jax.lax.scan(train_step, carry, steps)

    return init_fn, segment_fn


def plan_precision_schedule(train_cfg, n: int, seg: int):
    """(early_prec, switch_step, main_lengths, early_lengths) for a
    precision-annealed chain from step 0 (TrainConfig
    .matmul_precision_early) — shared by fit/batched_fit/ladder_fit so
    every driver plans the same exact-step switch (segment lengths are
    planned around it; they never straddle the switch)."""
    early_prec = getattr(train_cfg, "matmul_precision_early", None)
    switch_step = 0
    if early_prec:
        frac = float(getattr(train_cfg, "matmul_precision_switch", 0.75))
        # the switch is an exact step index (NOT segment-aligned): the
        # chain below plans a shorter early/main remainder segment on
        # each side, so e.g. a 1200-step fit under a 2000-step segment
        # budget still switches at step 900
        switch_step = max(0, min(n, int(round(n * frac))))
        if switch_step == 0:
            early_prec = None
    main, early = set(), set()
    s = 0
    while s < n:
        is_early = early_prec is not None and s < switch_step
        limit = switch_step if is_early else n
        length = min(seg, limit - s)
        (early if is_early else main).add(length)
        s += length
    return early_prec, switch_step, (main or {min(seg, n)}), early


def run_segment_chain(
    jinit,
    jsegs,
    init_args,
    seg_args,
    n,
    seg,
    concat_axis=0,
    start0: int = 0,
    carry_override=None,
    on_segment=None,
    flops_per_step=None,
    warm_compile=True,
    jsegs_early=None,
    switch_step=0,
):
    """Warm-compile then chain jitted segment executions.

    jsegs: {length: jitted (carry, *seg_args, start) -> (carry, metrics)}.
    Returns (final carry, concatenated metrics, wall_seconds, flops) —
    flops = `flops_per_step` (estimate_step_flops) x the steps actually
    executed (None when no per-step figure was supplied) — the shared
    driver for fit/batched_fit/sharded_fit's runtime-watchdog workaround.
    `start0`/`carry_override` resume from a checkpointed state (metrics
    then cover steps [start0, n)); `on_segment(carry, next_step)` fires at
    every segment boundary (mid-run checkpointing). A truthy on_segment
    return STOPS the chain early (encode-to-quality: fit(stop_psnr=...));
    metrics then cover [start0, stop).
    """
    import numpy as _np

    carry0 = carry_override if carry_override is not None else jinit(*init_args)
    if warm_compile:
        # skip when the caller reuses already-executed jitted segments (a
        # fit() program_cache hit): their __call__ cache is warm, and an
        # AOT lower().compile() here would re-trace + re-compile
        for f in jsegs.values():
            f.lower(carry0, *seg_args, jnp.int32(0)).compile()
        for f in (jsegs_early or {}).values():
            f.lower(carry0, *seg_args, jnp.int32(0)).compile()

    t0 = time.perf_counter()
    carry = carry0
    chunks = []
    start = start0
    while start < n:
        # precision annealing (TrainConfig.matmul_precision_early): the
        # early program runs [start0, switch_step), the main program the
        # rest; segment lengths never straddle the switch
        early = jsegs_early is not None and start < switch_step
        limit = switch_step if early else n
        length = min(seg, limit - start)
        fns = jsegs_early if early else jsegs
        carry, m = fns[length](carry, *seg_args, jnp.int32(start))
        chunks.append(m)
        start += length
        if on_segment is not None and on_segment(carry, start):
            break
    metrics = {
        k: jnp.concatenate([c[k] for c in chunks], axis=concat_axis)
        for k in chunks[0]
    }
    _np.asarray(jnp.ravel(metrics["loss"])[-1])  # force completion
    executed = start - start0
    flops = flops_per_step * executed if flops_per_step else None
    return carry, metrics, time.perf_counter() - t0, flops


def make_fit_fn(
    mdef: ModelDef,
    mcfg,
    grid,
    train_cfg: TrainConfig,
    optim_cfg: OptimConfig,
    masking_cfg: Optional[MaskingConfig] = None,
    init_params=None,
):
    """Build fit(key, img) -> (params, opt_state, mask_state, metrics).

    Pure in (key, img): jit it once, vmap it over images, or shard the pixel
    axis — see parallel/. Runs the whole fit as ONE scan; for runs longer
    than the runtime's per-execution wall-time budget use the segmented
    driver (`fit`, which chains make_fit_segments executions).
    """
    init_fn, segment_fn = make_fit_segments(
        mdef, mcfg, grid, train_cfg, optim_cfg, masking_cfg, init_params
    )

    def fit_fn(key, img):
        carry = init_fn(key, img)
        carry, metrics = segment_fn(carry, img, 0, train_cfg.num_steps)
        params, opt_state, mask_state = carry[0], carry[1], carry[2]
        return params, opt_state, mask_state, metrics

    return fit_fn


def _dummy_mask_state(params) -> MaskState:
    zero = jnp.zeros((), jnp.float32)
    return MaskState(
        masks=tuple(None for _ in params),
        baseline_nonzero=zero,
        total_params=jnp.ones((), jnp.float32),
        adjusted_growth=zero,
        adj_sum=zero,
        adj_count=zero,
        final_sparsity=zero,
    )


def fit(
    key,
    mdef: ModelDef,
    mcfg,
    grid,
    img,
    train_cfg: TrainConfig,
    optim_cfg: OptimConfig,
    masking_cfg: Optional[MaskingConfig] = None,
    checkpoint_path=None,
    resume_from=None,
    watch=None,
    init_params=None,
    stop_psnr=None,
    program_cache=None,
) -> FitResult:
    """Compile + run one fit; returns final params and per-step metric arrays.

    `program_cache`: a caller-owned dict; when passed, the compiled fit
    programs (and the per-step FLOPs estimate) are stashed in it on the
    first call and REUSED on later calls — the caller must pass the same
    (mdef, mcfg, grid shape, configs, init_params) every time, since
    those are baked into the cached programs. This is the fleet-warm
    serving shape: repeated fits pay compile + the first-execution
    warm-up (~0.7-1.5 s on this runtime) once, not per image —
    BENCH_r04's quant stage overcounted exactly this (BASELINE.md
    "Quant-phase breakdown").

    Fits longer than train_cfg.segment_steps are chained as repeated
    executions of one compiled segment (plus one remainder program) —
    identical math, but each device execution stays inside the runtime's
    wall-time budget.

    `watch(params, opt_state, step)` fires host-side at every segment
    boundary — the TPU-native wandb.watch equivalent (weight/momentum
    histograms without touching the compiled scan).

    `stop_psnr` (dB) enables encode-to-quality early stop: a boundary
    PSNR eval runs after every segment and the chain halts once it
    reaches the threshold (granularity = train_cfg.segment_steps; the
    completed segments are bit-identical to an untruncated fit). The
    reference's Python loop has no counterpart — its budget is fixed
    (reference compress.py:137).
    """
    import numpy as _np

    img = jnp.asarray(img)
    sparse = masking_cfg is not None and not masking_cfg.dense
    n = train_cfg.num_steps
    seg = max(1, train_cfg.segment_steps)

    if checkpoint_path is not None or resume_from is not None:
        # mid-run checkpoint/resume rides the segment boundaries (the scan
        # carry IS the training state); adam (optionally +EKFAC — the
        # checkpoint format carries the KFE state, training/checkpoint.py)
        if optim_cfg.name != "adam" or optim_cfg.preconditioner not in (
            None, "", "ekfac",
        ):
            raise ValueError(
                "checkpoint/resume supports adam fits (plain or ekfac)"
            )

    if (watch is not None or checkpoint_path is not None
            or resume_from is not None or stop_psnr is not None):
        # watching/checkpointing/early-stop ride segment boundaries; use
        # the segmented driver even for short fits
        return _fit_segmented(
            key, mdef, mcfg, grid, img, train_cfg, optim_cfg, masking_cfg,
            checkpoint_path, resume_from, watch, init_params, stop_psnr,
        )

    if getattr(train_cfg, "matmul_precision_early", None):
        # precision annealing switches programs mid-chain — always the
        # segmented driver (the switch lands on a segment boundary)
        return _fit_segmented(
            key, mdef, mcfg, grid, img, train_cfg, optim_cfg, masking_cfg,
            None, None, None, init_params, program_cache=program_cache,
        )

    if n <= seg:
        if program_cache is not None and "monolithic" in program_cache:
            compiled, fps = program_cache["monolithic"]
        else:
            init_fn, segment_fn = make_fit_segments(
                mdef, mcfg, grid, train_cfg, optim_cfg, masking_cfg,
                init_params
            )
            fit_fn = jax.jit(
                make_fit_fn(mdef, mcfg, grid, train_cfg, optim_cfg,
                            masking_cfg, init_params)
            )
            # warm-up compile outside the timed region
            compiled = fit_fn.lower(key, img).compile()
            fps = estimate_step_flops(
                init_fn, segment_fn, (key, img), (img,)
            )
            if program_cache is not None:
                program_cache["monolithic"] = (compiled, fps)
        t0 = time.perf_counter()
        params, opt_state, mask_state, metrics = compiled(key, img)
        # force a value to host: block_until_ready alone can return before
        # remote execution finishes on tunneled TPU runtimes
        _np.asarray(jnp.ravel(metrics["loss"])[-1])
        wall = time.perf_counter() - t0
        return FitResult(
            params=params,
            mask_state=mask_state if sparse else None,
            opt_state=opt_state,
            metrics=metrics,
            wall_seconds=wall,
            flops=fps * n if fps else None,
        )

    return _fit_segmented(
        key, mdef, mcfg, grid, img, train_cfg, optim_cfg, masking_cfg,
        None, None, None, init_params, program_cache=program_cache,
    )


def _fit_segmented(
    key, mdef, mcfg, grid, img, train_cfg, optim_cfg, masking_cfg,
    checkpoint_path, resume_from, watch=None, init_params=None,
    stop_psnr=None, program_cache=None,
):
    sparse = masking_cfg is not None and not masking_cfg.dense
    n = train_cfg.num_steps
    seg = max(1, train_cfg.segment_steps)
    # precision annealing (TrainConfig.matmul_precision_early): early
    # steps run a segment program traced at the cheaper pass precision;
    # the switch is rounded to a segment boundary
    early_prec, switch_step, plan_main, plan_early = (
        plan_precision_schedule(train_cfg, n, seg)
    )

    cached = program_cache is not None and "segmented" in program_cache
    if cached:
        (jinit, _jseg_cached, _fps_cached,
         _jseg_early_cached, _switch_cached) = program_cache["segmented"]
        if _switch_cached != switch_step:
            raise ValueError(
                "program_cache was built for a different precision-"
                f"schedule switch ({_switch_cached} vs {switch_step}) — "
                "pass identical arguments on every cached fit() call"
            )
        init_fn = segment_fn = None
    else:
        init_fn, segment_fn = make_fit_segments(
            mdef, mcfg, grid, train_cfg, optim_cfg, masking_cfg, init_params
        )
        jinit = jax.jit(init_fn)
        segment_fn_early = None
        if early_prec:
            import dataclasses as _dc

            _, segment_fn_early = make_fit_segments(
                mdef, mcfg, grid,
                _dc.replace(train_cfg, matmul_precision=early_prec),
                optim_cfg, masking_cfg, init_params,
            )
    start_probe = 0
    if resume_from is not None:
        from implicit_image_tpu.training.checkpoint import load_checkpoint

        ck = load_checkpoint(resume_from)
        start_probe = ck["step"]
        if start_probe >= n:
            raise ValueError(
                f"checkpoint is at step {start_probe} >= num_steps {n}; "
                "nothing to resume"
            )
    lengths, lengths_early = plan_main, plan_early
    if cached:
        jseg, jseg_early = _jseg_cached, _jseg_early_cached
        if not set(lengths) <= set(jseg) or not (
            lengths_early <= set(jseg_early or {})
        ):
            raise ValueError(
                "program_cache was built for different segment lengths "
                f"({sorted(jseg)}) than this call needs "
                f"({sorted(lengths)}) — pass identical arguments on every "
                "cached fit() call"
            )
    else:
        jseg = {
            length: jax.jit(functools.partial(segment_fn, length=length))
            for length in lengths
        }
        jseg_early = (
            {
                length: jax.jit(
                    functools.partial(segment_fn_early, length=length)
                )
                for length in lengths_early
            }
            if early_prec
            else None
        )

    carry_override = None
    start0 = 0
    if resume_from is not None:
        mask_state = ck.get("mask_state")
        if mask_state is None:
            mask_state = _dummy_mask_state(ck["params"])
        elif bool(jnp.isnan(mask_state.final_sparsity)):
            # pre-field checkpoint: re-seed from config (pure config value)
            mask_state = mask_state._replace(
                final_sparsity=jnp.asarray(
                    1.0 - (masking_cfg.final_density if sparse else 1.0),
                    jnp.float32,
                )
            )
        if optim_cfg.preconditioner == "ekfac":
            if "ekfac_state" not in ck:
                raise ValueError(
                    "resume with preconditioner='ekfac' needs a checkpoint "
                    "written by an ekfac fit (no EKFAC state found in "
                    f"{resume_from})"
                )
            ekfac_override = ck["ekfac_state"]
        else:
            ekfac_override = ()
        carry_override = (
            ck["params"], ck["opt_state"], mask_state, ck["key"],
            ekfac_override,
        )
        start0 = ck["step"]

    jeval = None
    stop_state = {"step": None, "psnr": None}
    if stop_psnr is not None:
        h, w, c = grid.shape
        coords = grid.reshape(h * w, c)
        target_flat = jnp.asarray(img).reshape(h * w, -1)
        # same dtype convention as the in-scan eval metric (make_train_step
        # eval_branch) — a bf16 fit must not stop on an f32 reading its own
        # logged metric has not reached
        eval_dtype = _compute_dtype(train_cfg)

        def eval_psnr(params):
            if mdef.separable:
                pred = mdef.apply(params, grid, mcfg, eval_dtype).reshape(
                    h * w, -1
                )
            else:
                pred = mdef.apply_flat(params, coords, mcfg, eval_dtype)
            return 10.0 * jnp.log10(1.0 / mse(pred, target_flat))

        jeval = jax.jit(eval_psnr)

    on_segment = None
    if checkpoint_path is not None or watch is not None or jeval is not None:
        if checkpoint_path is not None:
            from implicit_image_tpu.training.checkpoint import save_checkpoint

        def on_segment(carry, next_step):
            params, opt_state, mask_state = carry[0], carry[1], carry[2]
            if checkpoint_path is not None:
                save_checkpoint(
                    checkpoint_path,
                    params,
                    opt_state=opt_state,
                    mask_state=mask_state if sparse else None,
                    key=carry[3],
                    step=next_step,
                    ekfac_state=carry[4] if len(carry) > 4 else None,
                )
            if watch is not None:
                watch(params, opt_state, next_step)
            if jeval is not None:
                val = float(jeval(params))
                if val >= stop_psnr:
                    stop_state["step"], stop_state["psnr"] = next_step, val
                    return True
            return False

    if cached:
        fps = _fps_cached
    else:
        fps = estimate_step_flops(init_fn, segment_fn, (key, img), (img,))
        if program_cache is not None:
            program_cache["segmented"] = (
                jinit, jseg, fps, jseg_early, switch_step
            )
    carry, metrics, wall, flops = run_segment_chain(
        jinit, jseg, (key, img), (img,), n, seg,
        start0=start0, carry_override=carry_override, on_segment=on_segment,
        flops_per_step=fps,
        warm_compile=not cached,
        jsegs_early=jseg_early, switch_step=switch_step,
    )
    params, opt_state, mask_state = carry[0], carry[1], carry[2]
    return FitResult(
        params=params,
        mask_state=mask_state if sparse else None,
        opt_state=opt_state,
        metrics=metrics,
        wall_seconds=wall,
        stopped_at=stop_state["step"],
        stop_psnr_db=stop_state["psnr"],
        flops=flops,
    )
