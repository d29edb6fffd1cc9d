"""Full compress pipeline under SPMD — fit → quant finetune → entropy
code → decode → render, on a device mesh.

The reference's pipeline is strictly single-device (SURVEY.md §2.8); its
"scale-out" is one OS process per config. Here the WHOLE pipeline runs
under a `jax.sharding.Mesh` in two layouts:

  * `sharded_compress`  — ONE image, pixel axis sharded over the mesh's
    "pixel" axis (sequence-parallel analogue): the sparse fit AND the
    quantization finetune are jitted with the target row-sharded, grads/
    metrics all-reduced over ICI by GSPMD. Entropy coding is host-side
    byte work on the replicated final params (device→host once), then the
    bitstream is decoded and re-rendered as a check.
  * `batched_compress`  — MANY images vmapped over the "image" axis
    (multirun-replacement): fit and quant finetune compile once for the
    whole batch; each member then gets its own host-side bitstream.

Both return decoded-from-bitstream PSNR, so the multi-chip path proves
the same end-to-end loop the single-chip orchestrator reports
(reference pipeline order: compress.py:172-263).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from implicit_image_tpu.coding import (
    compress_state_dict,
    decode_and_render,
    linear_state_dict,
)
from implicit_image_tpu.models import ModelDef
from implicit_image_tpu.parallel.batched import batched_fit
from implicit_image_tpu.parallel.sharded import sharded_fit
from implicit_image_tpu.quant import QuantConfig
from implicit_image_tpu.training.fit import OptimConfig, TrainConfig
from implicit_image_tpu.training.quant_phase import make_quant_fit_fn

__all__ = ["PipelineResult", "sharded_compress", "batched_compress"]


class PipelineResult(NamedTuple):
    psnr: float  # fit PSNR (last eval)
    quant_psnr: float
    decoded_psnr: float  # rendered from the written bitstream
    compressed_bytes: int
    params: object  # final (quantized) params
    stream_dir: str


def _fit_psnr(metrics) -> float:
    p = np.asarray(metrics["psnr"]).reshape(-1)
    p = p[np.isfinite(p)]
    return float(p[-1]) if p.size else float("nan")


def _encode_decode(
    params_q, codebooks, mdef, mcfg, h, w, img_np, stream_dir, stream_name, half,
    coding_kwargs=None, delta_info=None, delta_ref=None,
):
    # forward backend kwargs (e.g. a non-default zstd `level`) exactly as
    # the single-run orchestrator does (compress.py entropy-coding stage)
    kw = dict(coding_kwargs or {})
    delta = None
    if delta_info is not None:
        if codebooks is None:
            raise ValueError("delta coding requires a quantized member")
        delta = dict(delta_info)
        delta["layers"] = [
            i for i, cb in enumerate(codebooks) if cb is not None
        ]
    state = linear_state_dict(params_q, codebooks, half=half)
    if delta is not None and delta_ref is not None:
        # lossless XOR residual for the unquantized tensors
        # (coding.apply_xor_residual; compress.py does the same)
        from implicit_image_tpu.coding import apply_xor_residual

        state, xor_names = apply_xor_residual(state, delta_ref)
        delta["xor"] = xor_names
    nbytes = compress_state_dict(
        state, stream_dir, stream_name, delta=delta, **kw
    )
    dec_img, _ = decode_and_render(
        stream_dir, stream_name, mdef, mcfg, h, w, benchmark=False, **kw
    )
    mse = float(np.mean((np.asarray(dec_img, np.float64) - img_np) ** 2))
    return nbytes, float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def sharded_compress(
    key,
    mesh: Mesh,
    mdef: ModelDef,
    mcfg,
    grid,
    img,
    train_cfg: TrainConfig,
    optim_cfg: OptimConfig,
    masking_cfg=None,
    quant_cfg: Optional[QuantConfig] = None,
    stream_name: str = "zstd",
    stream_dir: str = "outputs/sharded_stream",
    half="auto",
    coding_kwargs: Optional[dict] = None,
) -> PipelineResult:
    """One image end-to-end with its pixel axis sharded over the mesh."""
    h, w = grid.shape[:2]
    img = jnp.asarray(img)
    res = sharded_fit(
        key, mesh, mdef, mcfg, grid, img, train_cfg, optim_cfg, masking_cfg
    )
    params_q, codebooks, qpsnr = res.params, None, float("nan")
    if quant_cfg is not None and quant_cfg.name != "none":
        masks = res.mask_state.masks if res.mask_state is not None else None
        qfn = jax.jit(
            make_quant_fit_fn(mdef, mcfg, grid, quant_cfg, optim_cfg, masks,
                              matmul_precision=getattr(
                                  train_cfg, "matmul_precision", None)),
            in_shardings=(
                NamedSharding(mesh, P()),  # params replicated
                NamedSharding(mesh, P("pixel")),  # target row-sharded
            ),
        )
        params_q, codebooks, qmetrics = qfn(res.params, img)
        qpsnr = float(np.asarray(qmetrics["quant_psnr"]))

    img_np = np.asarray(img, np.float64)
    nbytes, dec_psnr = _encode_decode(
        params_q, codebooks, mdef, mcfg, h, w, img_np, stream_dir, stream_name,
        half, coding_kwargs,
    )
    return PipelineResult(
        psnr=_fit_psnr(res.metrics),
        quant_psnr=qpsnr,
        decoded_psnr=dec_psnr,
        compressed_bytes=nbytes,
        params=params_q,
        stream_dir=str(stream_dir),
    )


def batched_compress(
    key,
    mdef: ModelDef,
    mcfg,
    grid,
    imgs,
    train_cfg: TrainConfig,
    optim_cfg: OptimConfig,
    masking_cfg=None,
    quant_cfg: Optional[QuantConfig] = None,
    mesh: Optional[Mesh] = None,
    stream_name: str = "zstd",
    stream_root: str = "outputs/batched_streams",
    half="auto",
    coding_kwargs: Optional[dict] = None,
    init_params=None,
    member_subdir: str = "",
    member_names: Optional[Sequence[str]] = None,
    delta_info: Optional[dict] = None,
) -> Sequence[PipelineResult]:
    """A batch of images end-to-end; fits + quant compile once (vmap over
    the "image" mesh axis), bitstreams written per image host-side.

    `init_params` warm-starts every lane from one shared meta-init
    (training/metainit.py). `member_names` labels per-image stream dirs
    (default img{i}); `member_subdir` nests the stream inside each member
    dir (the fleet CLI passes "model_quantized" so members look exactly
    like compress.py run dirs to the decode CLI and the run store).
    `delta_info` ({"artifact": path, "sha256": hex} — quant.delta) makes
    every lane cluster + code RESIDUAL codebooks against the shared
    `init_params` artifact (measured BASELINE.md "Delta quantization");
    requires init_params and a kmeans quant_cfg."""
    from pathlib import Path

    imgs = jnp.asarray(imgs)
    b = imgs.shape[0]
    h, w = grid.shape[:2]
    if member_names is not None and len(member_names) != b:
        raise ValueError(
            f"member_names has {len(member_names)} entries for {b} images"
        )
    if delta_info is not None and (
        init_params is None
        or quant_cfg is None
        or quant_cfg.name != "KMeans"
    ):
        raise ValueError(
            "delta_info requires init_params (the shared artifact) and "
            "quant=kmeans"
        )
    delta_ref = None
    if delta_info is not None:
        from implicit_image_tpu.coding import state_ref_map

        delta_ref = state_ref_map(init_params)
    res = batched_fit(
        key, mdef, mcfg, grid, imgs, train_cfg, optim_cfg, masking_cfg, mesh,
        init_params=init_params,
    )

    params_q, codebooks_b, qpsnr = res.params, None, None
    if quant_cfg is not None and quant_cfg.name != "none":
        masks = res.mask_state.masks if res.mask_state is not None else None

        # masks are per-image (leading B) from the batched sparse fit, but
        # make_quant_fit_fn closes over them — rebuild the closure under
        # the vmap trace so each member sees its own mask slice (the
        # shared delta offsets ride the closure unbatched)
        # quant.row_stride: every lane finetunes against the row-
        # subsampled target (encoder-side only; the coded container and
        # decoded PSNR stay full-resolution — QuantConfig.row_stride)
        stride = int(getattr(quant_cfg, "row_stride", 1))
        q_grid = grid[::stride] if stride > 1 else grid
        q_imgs = imgs[:, ::stride] if stride > 1 else imgs

        def qfit(params, img, masks_i):
            fn = make_quant_fit_fn(
                mdef, mcfg, q_grid, quant_cfg, optim_cfg, masks_i,
                offset_params=(
                    init_params if delta_info is not None else None
                ),
                matmul_precision=getattr(
                    train_cfg, "matmul_precision", None),
            )
            return fn(params, img)

        qfn = jax.vmap(qfit, in_axes=(0, 0, 0 if masks is not None else None))
        if mesh is not None:
            shard = NamedSharding(mesh, P("image"))
            qfn = jax.jit(
                qfn,
                in_shardings=(shard, shard, shard if masks is not None else None),
                out_shardings=shard,
            )
        else:
            qfn = jax.jit(qfn)
        params_q, codebooks_b, qmetrics = qfn(res.params, q_imgs, masks)
        qpsnr = np.asarray(qmetrics["quant_psnr"])

    # per-image host-side coding on the gathered results
    fit_psnr = np.asarray(res.metrics["psnr"])
    out = []
    for i in range(b):
        p_i = jax.tree_util.tree_map(lambda x: x[i], params_q)
        books_i = (
            jax.tree_util.tree_map(lambda x: x[i], codebooks_b)
            if codebooks_b is not None
            else None
        )
        name = member_names[i] if member_names is not None else f"img{i}"
        stream_dir = Path(stream_root) / name
        if member_subdir:
            stream_dir = stream_dir / member_subdir
        img_np = np.asarray(imgs[i], np.float64)
        nbytes, dec_psnr = _encode_decode(
            p_i, books_i, mdef, mcfg, h, w, img_np, stream_dir, stream_name,
            half, coding_kwargs, delta_info=delta_info,
            delta_ref=delta_ref,
        )
        pf = fit_psnr[i][np.isfinite(fit_psnr[i])]
        out.append(
            PipelineResult(
                psnr=float(pf[-1]) if pf.size else float("nan"),
                quant_psnr=float(qpsnr[i]) if qpsnr is not None else float("nan"),
                decoded_psnr=dec_psnr,
                compressed_bytes=nbytes,
                params=p_i,
                stream_dir=str(stream_dir),
            )
        )
    return out
