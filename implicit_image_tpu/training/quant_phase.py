"""Quantization-aware finetune phase — one compiled scan, like the fit.

Reproduces the reference's quant phase (compress.py:172-240): deepcopy the
fitted model, build a FRESH optimizer with the quantize-mode scheduler
StepLR(1000, 0.5) (train_helper.py:79-80), then `quant.num_steps` train
steps against the quantized forward, and freeze (labels, centroids) at the
end (q.convert(), context.py:24-33). The sparsity mask keeps being applied
(compress.py:187-188 passes mask into train_epoch).

GRADIENT SEMANTICS — deliberate improvement over the reference:

  * KMeans mode trains the CODEBOOK: weights are clustered ONCE, the labels
    are frozen, and the finetune trains the per-layer centroids (gradients
    flow through the `centroids[labels]` gather — each centroid's gradient
    is the sum over its cluster, so 2^bits-1 DOF per layer with a strong
    signal) together with the unquantized layers and biases. This is the
    actual Deep Compression shared-weight scheme (Han et al. §3.2) the
    reference's backward hooks gesture at (kmeans.py:163-181).
  * The reference instead replaces weight.data with re-clustered snapped
    values every forward, so Adam steps FROM the projection: measured at
    the reference operating point (512² SIREN d8 w128, kmeans 8-bit,
    lr 3e-4) that scheme LOSES ~8 dB versus not finetuning at all, and a
    plain straight-through estimator on the full weights still loses ~4 dB
    (at a converged fit the MSE gradient is noise-dominated, so free-weight
    finetune drifts). Codebook finetune strictly refines
    (tests/test_quant.py::test_codebook_finetune_improves).
  * QAT (uniform fake-quant, the fbgemm stand-in) keeps the standard STE
    on the latent weights.

Masked (pruned) weights: `quantize_weight` assigns zeros to the frozen 0
centroid (index 0 after the |c| sort), whose gradient is zeroed each step,
so pruned weights stay exactly zero through the phase.
"""
from __future__ import annotations

import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from implicit_image_tpu.models import ModelDef
from implicit_image_tpu.ops.metrics import mse, psnr_8bit
from implicit_image_tpu.optim import opt_init, opt_update, step_lr
from implicit_image_tpu.quant import (
    LayerCodebook,
    QuantConfig,
    convert,
    ecvq_refine,
    quantize_params,
    quantize_weight,
    quantized_layer_indices,
)
from implicit_image_tpu.sparsity import apply_masks, mask_grads
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
    pixel_chunks: int = 1,
    offset_params=None,
    matmul_precision=None,
):
    """Build quant_fit(params, img) -> (final params, codebooks, metrics).

    Pure in (params, img): vmap/shard it like the fit itself.
    `masks` is the (static-structure) mask tuple from the sparse fit, or
    None for dense models. `pixel_chunks` bounds HBM exactly as in the fit
    (training/fit.py TrainConfig.pixel_chunks): the finetune loss/grad is
    accumulated over equal pixel chunks — row-aligned blocks when possible
    so CoordX keeps its factorized-grid path per chunk.

    `offset_params` (delta mode, KMeans only — quant.delta): a params-like
    pytree of shared encoder/decoder state (the warm-start meta artifact).
    Quantized layers cluster and code the RESIDUAL w - offset; the model
    weight is reconstructed as (offset + centroids[labels]) * (labels != 0)
    everywhere the finetune forward runs, and the container stores the
    residual codebook (coding/__init__.py delta manifest).
    """
    if offset_params is not None and quant_cfg.name != "KMeans":
        raise ValueError("delta (offset_params) is KMeans-only")
    h, w, c = grid.shape
    n = h * w
    coords = grid.reshape(n, c)
    k = int(pixel_chunks)
    if k > 1 and n % k:
        raise ValueError(f"pixel_chunks={k} must divide pixel count {n}")
    # quantize-mode scheduler: StepLR(1000, 0.5) (train_helper.py:79-80);
    # quant.lr (when set) overrides the inherited fit lr — see QuantConfig
    base_lr = optim_cfg.lr if quant_cfg.lr is None else float(quant_cfg.lr)
    schedule = step_lr(base_lr, 1000, 0.5)

    if mdef.separable:
        # CoordX-family fast path: evaluate through the factorized grid
        # apply (O(H+W) branch work), exactly as the fit loss does
        # (training/fit.py make_loss_fn) — ~2x the per-step speed of the
        # flat path at the reference shapes
        def _forward_raw(params):
            return mdef.apply(params, grid, mcfg, compute_dtype).reshape(
                h * w, -1
            )
    else:
        def _forward_raw(params):
            return mdef.apply_flat(params, coords, mcfg, compute_dtype)

    if matmul_precision:
        # same MXU pass-precision control as the fit loss
        # (training/fit.py make_loss_fn matmul_precision)
        def _forward(params):
            with jax.default_matmul_precision(matmul_precision):
                return _forward_raw(params)
    else:
        _forward = _forward_raw

    if k > 1:
        # contiguous row blocks of a tensor-product grid are themselves
        # tensor products, so separable models keep the O(H+W) branch path
        # per chunk whenever k divides H (same reasoning as fit.py:215-223)
        if mdef.separable and h % k == 0:
            chunk_inputs = grid.reshape(k, h // k, w, c)

            def _forward_chunk_raw(params, g):
                return mdef.apply(params, g, mcfg, compute_dtype).reshape(
                    (h // k) * w, -1
                )
        else:
            chunk_inputs = coords.reshape(k, n // k, c)

            def _forward_chunk_raw(params, cc):
                return mdef.apply_flat(params, cc, mcfg, compute_dtype)

        if matmul_precision:
            def _forward_chunk(params, x):
                with jax.default_matmul_precision(matmul_precision):
                    return _forward_chunk_raw(params, x)
        else:
            _forward_chunk = _forward_chunk_raw

    def _make_grad_fn(transform, target_flat):
        """value_and_grad of mse(_forward(transform(state)), target),
        chunk-accumulated when pixel_chunks > 1 (equal chunks -> the mean
        of chunk means equals the full-batch mean exactly)."""
        if k == 1:
            return jax.value_and_grad(
                lambda st: mse(_forward(transform(st)), target_flat)
            )
        target_c = target_flat.reshape(k, n // k, target_flat.shape[-1])

        def grad_fn(st):
            def chunk_loss(s, g, t):
                return mse(_forward_chunk(transform(s), g), t)

            def body(acc, gt):
                g, t = gt
                l, gr = jax.value_and_grad(chunk_loss)(st, g, t)
                acc_l, acc_g = acc
                return (
                    acc_l + l,
                    jax.tree_util.tree_map(jnp.add, acc_g, gr),
                ), None

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, st)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                body,
                (jnp.zeros((), jnp.float32), zero_g),
                (chunk_inputs, target_c),
            )
            inv = 1.0 / k
            return loss_sum * inv, jax.tree_util.tree_map(
                lambda g: g * inv, grad_sum
            )

        return grad_fn

    def _final_metrics(params_q, target_flat, metrics):
        if k == 1:
            pred = _forward(params_q)
            qloss = mse(pred, target_flat)
            return {
                **metrics,
                "quant_loss": qloss,
                "quant_psnr": 10.0 * jnp.log10(1.0 / qloss),
                "quant_psnr_8bit": psnr_8bit(pred, target_flat),
            }
        # chunked eval: equal chunks -> mean of per-chunk MSEs is the
        # full-image MSE (float and 8-bit alike)
        target_c = target_flat.reshape(k, n // k, target_flat.shape[-1])

        def body(acc, gt):
            g, t = gt
            pred = _forward_chunk(params_q, g)
            d = pred.astype(jnp.float32) - t.astype(jnp.float32)
            d8 = (
                (t * 255.0).astype(jnp.int32) - (pred * 255.0).astype(jnp.int32)
            ).astype(jnp.float32)
            return (
                acc[0] + jnp.mean(d * d),
                acc[1] + jnp.mean(d8 * d8),
            ), None

        (mse_sum, mse8_sum), _ = jax.lax.scan(
            body,
            (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
            (chunk_inputs, target_c),
        )
        qloss = mse_sum / k
        return {
            **metrics,
            "quant_loss": qloss,
            "quant_psnr": 10.0 * jnp.log10(1.0 / qloss),
            "quant_psnr_8bit": 10.0 * jnp.log10(255.0**2 / (mse8_sum / k)),
        }

    is_kmeans = quant_cfg.name == "KMeans"

    # --- init / steps / final stages -------------------------------------
    # The phase is factored so the scan can run either as ONE device
    # execution (quant_fit below, the default) or CHAINED over shorter
    # segments (quant_finetune(segment_steps=...)) when a single
    # num_steps-long execution would blow the runtime's ~60 s watchdog
    # (gather-bound hashgrid, very large grids) — same workaround as the
    # fit's run_segment_chain (training/fit.py).
    # Carry: kmeans (state, opt_state, labels) — labels ride the carry so
    # segments stay pure; STE (latent, opt_state, ()).

    def _closure_offs(params):
        """The per-layer offset arrays from the make-time closure (None
        entries where a layer has no offset)."""
        if offset_params is None:
            return tuple(None for _ in params)
        return tuple(
            layer.get("w") if isinstance(layer, dict) else None
            for layer in offset_params
        )

    def _closure_masks(params):
        if masks is None:
            return tuple(None for _ in params)
        return tuple(masks)

    def _reconstruct(st, labels, offs, mks):
        out = []
        for i, layer in enumerate(st):
            if labels[i] is not None:
                rest = {k: v for k, v in layer.items() if k != "centroids"}
                w = layer["centroids"][labels[i]]
                if offs[i] is not None:
                    # delta decode rule: labels carry the prune mask
                    w = (w + offs[i]) * (labels[i] != 0)
                out.append(rest | {"w": w})
            else:
                out.append(layer)
        out = tuple(out)
        return (
            apply_masks(out, mks) if any(m is not None for m in mks) else out
        )

    def quant_init(params, img, offs=None, mks=None):
        """Cluster (kmeans) / pass through (STE) -> segment carry.

        `offs`/`mks`: per-layer offset / mask arrays (None entries where a
        layer has neither) — the traced counterparts of the make-time
        `offset_params`/`masks` closures; they ride the carry so one
        compiled program serves many values (sequence.py codes every
        P-frame against a different previous frame with ONE quant compile).
        """
        if offs is None:
            offs = _closure_offs(params)
        if mks is None:
            mks = _closure_masks(params)
        if not is_kmeans:
            return (params, opt_init(params, optim_cfg), (), offs, mks)
        qset = set(quantized_layer_indices(params, quant_cfg))
        labels = []
        state = []
        for i, layer in enumerate(params):
            if i in qset:
                off = offs[i]
                _, book = quantize_weight(
                    layer["w"], quant_cfg.layer_bits(i),
                    quant_cfg.lloyd_iters, offset=off,
                )
                if quant_cfg.ecvq_lambda > 0.0:
                    book = ecvq_refine(
                        layer["w"], book,
                        quant_cfg.ecvq_lambda, quant_cfg.ecvq_iters,
                        offset=off,
                    )
                labels.append(book.labels)
                state.append(
                    {k: v for k, v in layer.items() if k != "w"}
                    | {"centroids": book.centroids}
                )
            else:
                labels.append(None)
                state.append(dict(layer))
        state = tuple(state)
        return (state, opt_init(state, optim_cfg), tuple(labels), offs, mks)

    def quant_steps(carry, img, start, length: int):
        """Run `length` finetune steps [start, start+length) on the carry."""
        target_flat = img.reshape(h * w, -1)
        st0, opt_state, labels, offs, mks = carry
        masked = any(m is not None for m in mks)

        if is_kmeans:
            grad_fn = _make_grad_fn(
                lambda st: _reconstruct(st, labels, offs, mks), target_flat
            )

            def step_fn(inner, step):
                st, opt_state = inner
                loss, grads = grad_fn(st)
                # pruned weights point at centroid 0: keep it exactly zero
                grads = tuple(
                    layer | {"centroids": layer["centroids"].at[0].set(0.0)}
                    if "centroids" in layer
                    else layer
                    for layer in grads
                )
                st, opt_state = opt_update(
                    grads, opt_state, st, schedule(step), optim_cfg
                )
                return (st, opt_state), {"loss": loss}

        else:

            def ste_transform(latent):
                snapped = quantize_params(latent, quant_cfg)
                ste = jax.tree_util.tree_map(
                    lambda q, w: jax.lax.stop_gradient(q)
                    + w
                    - jax.lax.stop_gradient(w),
                    snapped,
                    latent,
                )
                if masked:
                    ste = apply_masks(ste, mks)
                return ste

            grad_fn = _make_grad_fn(ste_transform, target_flat)

            def step_fn(inner, step):
                latent, opt_state = inner
                loss, grads = grad_fn(latent)
                if masked:
                    grads = mask_grads(grads, mks)
                latent, opt_state = opt_update(
                    grads, opt_state, latent, schedule(step), optim_cfg
                )
                if masked:
                    latent = apply_masks(latent, mks)
                return (latent, opt_state), {"loss": loss}

        (st, opt_state), metrics = jax.lax.scan(
            step_fn, (st0, opt_state), jnp.arange(length) + start
        )
        return (st, opt_state, labels, offs, mks), metrics

    def quant_final(carry, img, metrics):
        """Freeze codebooks/labels, snap params, compute decode metrics."""
        target_flat = img.reshape(h * w, -1)
        st, _, labels, offs, mks = carry
        if is_kmeans:
            params_q = _reconstruct(st, labels, offs, mks)
            codebooks = tuple(
                LayerCodebook(centroids=layer["centroids"], labels=lab)
                if lab is not None
                else None
                for layer, lab in zip(st, labels)
            )
        else:
            params_q, codebooks = convert(st, quant_cfg)
            if any(m is not None for m in mks):
                params_q = apply_masks(params_q, mks)
        return params_q, codebooks, _final_metrics(params_q, target_flat, metrics)

    def quant_fit(params, img):
        carry = quant_init(params, img)
        carry, metrics = quant_steps(
            carry, img, jnp.int32(0), quant_cfg.num_steps
        )
        return quant_final(carry, img, metrics)

    def quant_fit_with_offsets(params, img, offs, mks=None):
        """`quant_fit` with the delta offsets (and optionally the sparsity
        masks) as TRACED arguments (per-layer tuples of arrays / None):
        jit once, feed different values per call — the sequence encoder's
        per-frame path (every P-frame quantizes against a different
        previous frame under a different resume mask, ONE compile)."""
        carry = quant_init(params, img, offs, mks)
        carry, metrics = quant_steps(
            carry, img, jnp.int32(0), quant_cfg.num_steps
        )
        return quant_final(carry, img, metrics)

    quant_fit.stages = (quant_init, quant_steps, quant_final)
    quant_fit.with_offsets = quant_fit_with_offsets
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
    pixel_chunks: int = 1,
    segment_steps: Optional[int] = None,
    offset_params=None,
    matmul_precision=None,
) -> QuantResult:
    """Compile + run the quant phase (single image).

    `segment_steps` < num_steps chains the finetune scan over shorter
    device executions (runtime ~60 s watchdog workaround, exactly like the
    fit's run_segment_chain) — numerically the same steps, just split; the
    default single execution is unchanged.

    quant_cfg.row_stride > 1 subsamples the finetune TARGET to every
    s-th image row (encoder-side only: the codebooks/bitstream stay
    full-precision artifacts and any decode is full-resolution). The
    returned metrics are then measured on the subsampled grid — the
    caller's decoded-PSNR close-the-loop (compress.py) remains the
    full-image truth.
    """
    stride = int(getattr(quant_cfg, "row_stride", 1))
    if stride > 1:
        grid = jnp.asarray(grid)[::stride]
        img = jnp.asarray(img)[::stride]
    quant_fit = make_quant_fit_fn(
        mdef, mcfg, grid, quant_cfg, optim_cfg, masks,
        compute_dtype, pixel_chunks=pixel_chunks,
        offset_params=offset_params, matmul_precision=matmul_precision,
    )
    img = jnp.asarray(img)
    seg = int(segment_steps) if segment_steps else quant_cfg.num_steps
    if seg >= quant_cfg.num_steps:
        fn = jax.jit(quant_fit)
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

    quant_init, quant_steps, quant_final = quant_fit.stages
    jinit = jax.jit(quant_init)
    jstep = jax.jit(quant_steps, static_argnums=3)  # one compile per length
    jfinal = jax.jit(quant_final)
    t0 = time.perf_counter()
    carry = jinit(params, img)
    chunks = []
    start = 0
    while start < quant_cfg.num_steps:
        length = min(seg, quant_cfg.num_steps - start)
        carry, m = jstep(carry, img, jnp.int32(start), length)
        chunks.append(m)
        start += length
    metrics = {
        k: jnp.concatenate([c[k] for c in chunks]) for k in chunks[0]
    }
    params_q, codebooks, metrics = jfinal(carry, img, metrics)
    jax.block_until_ready(params_q)
    return QuantResult(
        params=params_q,
        codebooks=codebooks,
        metrics=metrics,
        wall_seconds=time.perf_counter() - t0,
    )
