"""One-compile density ladder — the reference's finals R-D sweep as a
single program.

The reference's density ladder is one OS process per density (reference
slurm_scripts/finals.sh:50-80, makefiles/finals.mk:3-11): N launches,
N compiles, N serial fits. On TPU the ONLY thing that differs across
ladder members is the mask-state INITIALIZATION (the init density feeds
the static ERK/random solver); the compiled train-step program is
density-free — sparsity/core.py's update_connections consumes only the
traced masks and the decayed prune rate. So the whole ladder collapses
to: build B mask states host-side (one per density), stack them into a
leading member axis, and run ONE vmapped segment chain against the
shared image. B fits, one compile, zero cross-member traffic; with a
mesh the member axis lays out over the "image" devices so a 10-point
ladder spans the slice in a single launch.

GMP (decay_schedule="magnitude-prune") ladders sweep final_density
instead: the Zhu-Gupta schedule reads MaskState.final_sparsity — a
traced scalar in the carry (sparsity/decay.py) — so members with
different final densities still share ONE compiled program; every
member starts from the preset's (dense) init and prunes toward its own
target.

CLI (same overrides as compress.py; the density list IS the ladder —
masking.density for RigL-style presets, masking.final_density for GMP):

    python -m implicit_image_tpu.parallel.ladder img=synthetic \
        masking=RigL masking.density=0.05,0.1,0.2,0.4 train.multiplier=5
    python -m implicit_image_tpu.parallel.ladder img=synthetic \
        masking=Pruning masking.final_density=0.1,0.25,0.5

Each member writes a normal run dir (config.json + summary.json +
model_quantized/ bitstream) under outputs/<img>/ladder_<exp>/d<density>,
so visualize/rate_distortion.py consumes ladder output unchanged.
"""
from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from implicit_image_tpu.models import ModelDef
from implicit_image_tpu.parallel.pipeline import PipelineResult, _encode_decode
from implicit_image_tpu.quant import QuantConfig
from implicit_image_tpu.training.fit import (
    FitResult,
    OptimConfig,
    TrainConfig,
    make_fit_segments,
    run_segment_chain,
)
from implicit_image_tpu.training.quant_phase import make_quant_fit_fn

__all__ = ["ladder_fit", "ladder_compress"]

log = logging.getLogger("implicit_image_tpu")


def _check_ladder_cfg(masking_cfg) -> None:
    if masking_cfg is None or masking_cfg.dense:
        raise ValueError("ladder_fit needs a sparse masking config")


def ladder_fit(
    key,
    mdef: ModelDef,
    mcfg,
    grid,
    img,
    train_cfg: TrainConfig,
    optim_cfg: OptimConfig,
    masking_cfg,
    densities: Sequence[float],
    mesh: Optional[Mesh] = None,
    init_params=None,
) -> FitResult:
    """Fit ONE image at B init densities concurrently; returns a FitResult
    whose leaves carry a leading member axis aligned with `densities`.

    Per-member init (params/opt/mask at that density) runs host-side; the
    segment chain is vmapped over the stacked carries with the image
    broadcast, compiled once for the whole ladder.
    """
    _check_ladder_cfg(masking_cfg)
    img = jnp.asarray(img)
    b = len(densities)
    if b == 0:
        raise ValueError("densities is empty")
    keys = jax.random.split(key, b)

    # per-density init: the density is static inside each init_fn (the
    # ERK/random solvers run at trace time), so build one init per member.
    # GMP sweeps final_density (members share the preset's dense-ish init;
    # the per-member target rides MaskState.final_sparsity as a traced
    # scalar), RigL-style presets sweep the init density.
    gmp = masking_cfg.decay_schedule == "magnitude-prune"
    axis = "final_density" if gmp else "density"
    carries = []
    for i, d in enumerate(densities):
        cfg_d = dataclasses.replace(masking_cfg, **{axis: float(d)})
        init_fn, _ = make_fit_segments(
            mdef, mcfg, grid, train_cfg, optim_cfg, cfg_d, init_params
        )
        carries.append(init_fn(keys[i], img))
    carry0 = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *carries)

    # ONE segment program shared by every member (density-free: the only
    # member-varying inputs live in the stacked carry), vmapped over the
    # carry with the image broadcast
    _, segment_fn = make_fit_segments(
        mdef, mcfg, grid, train_cfg, optim_cfg, masking_cfg
    )
    n = train_cfg.num_steps
    seg = max(1, train_cfg.segment_steps // b)  # shared per-execution wall budget
    shard = NamedSharding(mesh, P("image")) if mesh is not None else None

    from implicit_image_tpu.training.fit import plan_precision_schedule

    early_prec, switch_step, plan_main, plan_early = (
        plan_precision_schedule(train_cfg, n, seg)
    )

    def _jsegs_for(seg_fn, lengths):
        out = {}
        for length in lengths:
            vf = jax.vmap(
                lambda c, im, s, _l=length, _f=seg_fn: _f(c, im, s, _l),
                in_axes=(0, None, None),
            )
            out[length] = (
                jax.jit(vf)
                if shard is None
                else jax.jit(
                    vf, in_shardings=(shard, None, None), out_shardings=shard
                )
            )
        return out

    jsegs = _jsegs_for(segment_fn, plan_main)
    jsegs_early = None
    if early_prec:
        _, segment_fn_e = make_fit_segments(
            mdef, mcfg, grid,
            dataclasses.replace(train_cfg, matmul_precision=early_prec),
            optim_cfg, masking_cfg,
        )
        jsegs_early = _jsegs_for(segment_fn_e, plan_early)
    if shard is not None:
        carry0 = jax.device_put(carry0, shard)

    carry, metrics, wall, flops = run_segment_chain(
        None, jsegs, (), (img,), n, seg, concat_axis=1, carry_override=carry0,
        jsegs_early=jsegs_early, switch_step=switch_step,
    )
    params, opt_state, mask_state = carry[0], carry[1], carry[2]
    return FitResult(
        params=params,
        mask_state=mask_state,
        opt_state=opt_state,
        metrics=metrics,
        wall_seconds=wall,
        flops=flops,
    )


def ladder_compress(
    key,
    mdef: ModelDef,
    mcfg,
    grid,
    img,
    train_cfg: TrainConfig,
    optim_cfg: OptimConfig,
    masking_cfg,
    densities: Sequence[float],
    quant_cfg: Optional[QuantConfig] = None,
    mesh: Optional[Mesh] = None,
    stream_name: str = "zstd",
    stream_root: str = "outputs/ladder",
    half="auto",
    coding_kwargs: Optional[dict] = None,
    init_params=None,
    delta_info: Optional[dict] = None,
) -> Sequence[PipelineResult]:
    """Full R-D ladder end-to-end: one vmapped fit + one vmapped quant
    finetune across all densities, then per-member host-side entropy
    coding + decode (reference pipeline order compress.py:172-263).

    `delta_info` (quant.delta): every member clusters + codes residual
    codebooks against the shared `init_params` artifact — the manifest
    records its path + sha256 per member (BASELINE.md "Delta
    quantization")."""
    img = jnp.asarray(img)
    h, w = grid.shape[:2]
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
    res = ladder_fit(
        key, mdef, mcfg, grid, img, train_cfg, optim_cfg, masking_cfg,
        densities, mesh, init_params=init_params,
    )

    params_q, codebooks_b, qpsnr = res.params, None, None
    if quant_cfg is not None and quant_cfg.name != "none":
        masks = res.mask_state.masks
        # quant.row_stride: finetune every member's codebooks against the
        # row-subsampled target (encoder-side only; decoded PSNR below is
        # always the full image — QuantConfig.row_stride)
        stride = int(getattr(quant_cfg, "row_stride", 1))
        q_grid = grid[::stride] if stride > 1 else grid
        q_img = img[::stride] if stride > 1 else img

        def qfit(params, masks_i):
            fn = make_quant_fit_fn(
                mdef, mcfg, q_grid, quant_cfg, optim_cfg, masks_i,
                offset_params=(
                    init_params if delta_info is not None else None
                ),
                matmul_precision=getattr(
                    train_cfg, "matmul_precision", None),
            )
            return fn(params, q_img)

        qfn = jax.vmap(qfit, in_axes=(0, 0))
        if mesh is not None:
            shard = NamedSharding(mesh, P("image"))
            qfn = jax.jit(qfn, in_shardings=(shard, shard), out_shardings=shard)
        else:
            qfn = jax.jit(qfn)
        t0 = time.perf_counter()
        params_q, codebooks_b, qmetrics = qfn(res.params, masks)
        qpsnr = np.asarray(qmetrics["quant_psnr"])
        log.info("ladder quant finetune: %.2f s for %d members",
                 time.perf_counter() - t0, len(densities))

    fit_psnr = np.asarray(res.metrics["psnr"])
    img_np = np.asarray(img, np.float64)
    out = []
    for i, d in enumerate(densities):
        p_i = jax.tree_util.tree_map(lambda x: x[i], params_q)
        books_i = (
            jax.tree_util.tree_map(lambda x: x[i], codebooks_b)
            if codebooks_b is not None
            else None
        )
        # run_dir/model_quantized mirrors compress.py's layout so the
        # decompress CLI and the visualize run store read ladder members
        # like any other run
        run_dir = Path(stream_root) / f"d{d}"
        nbytes, dec_psnr = _encode_decode(
            p_i, books_i, mdef, mcfg, h, w, img_np,
            run_dir / "model_quantized", stream_name, half, coding_kwargs,
            delta_info=delta_info, delta_ref=delta_ref,
        )
        pf = fit_psnr[i][np.isfinite(fit_psnr[i])]
        out.append(
            PipelineResult(
                psnr=float(pf[-1]) if pf.size else float("nan"),
                quant_psnr=float(qpsnr[i]) if qpsnr is not None else float("nan"),
                decoded_psnr=dec_psnr,
                compressed_bytes=nbytes,
                params=p_i,
                stream_dir=str(run_dir),
            )
        )
    return out


def build_ladder_args(cfg) -> dict:
    """cfg -> the ladder_compress argument set (shared by the ladder CLI
    and the batched ask-tell sweeper, sweep.py)."""
    from implicit_image_tpu.compress import (
        _MASKING_FIELDS,
        _auto_segment_steps,
        _load_image,
    )
    from implicit_image_tpu.data import get_grid
    from implicit_image_tpu.models import build_model_from_config
    from implicit_image_tpu.sparsity import MaskingConfig

    img = _load_image(cfg.img)
    h, w = img.shape[:2]
    grid = get_grid(h, w)
    mdef, mcfg = build_model_from_config(cfg)

    mult = int(cfg.train.get("multiplier", 1))
    fields = {k: v for k, v in cfg.masking.items() if k in _MASKING_FIELDS}
    fields["end_when"] = int(fields.get("end_when", 1500) * mult)
    fields["interval"] = int(fields.get("interval", 20) * mult)
    masking = MaskingConfig(**fields)
    train_cfg = TrainConfig(
        num_steps=int(cfg.train.num_steps) * mult,
        log_steps=int(cfg.train.log_steps),
        multiplier=mult,
        segment_steps=_auto_segment_steps(cfg),
        # train.matmul_precision rides every ladder/fleet/sequence/target
        # member (round-4 discovery: the silent 1-bf16-pass default costs
        # ~6.3 dB converged; the CLI default is tensorfloat32 since r5)
        matmul_precision=cfg.train.get("matmul_precision") or None,
        matmul_precision_early=(
            cfg.train.get("matmul_precision_early") or None
        ),
        matmul_precision_switch=float(
            cfg.train.get("matmul_precision_switch", 0.75)
        ),
    )
    optim_kwargs = {}
    for k, v in cfg.optim.items():
        if k != "name" and isinstance(v, str):
            try:
                v = float(v)
            except ValueError:
                pass
        optim_kwargs[k] = v
    optim_cfg = OptimConfig(**optim_kwargs)
    quant_raw = cfg.get("quant")
    quant_cfg = None
    delta_requested = False
    if quant_raw and quant_raw.get("name", "none") != "none":
        delta_requested = bool(quant_raw.get("delta", False))
        if delta_requested and str(quant_raw.get("name")) != "KMeans":
            raise ValueError("quant.delta requires quant=kmeans")
        if delta_requested and not cfg.train.get("init_path"):
            raise ValueError(
                "quant.delta codes residuals against the meta-init "
                "artifact; set train.init_path"
            )
        quant_cfg = QuantConfig(
            name=quant_raw.name,
            bits=int(quant_raw.get("bits", 8)),
            num_steps=int(quant_raw.get("num_steps", 100)),
            log_steps=int(quant_raw.get("log_steps", 10)),
            ecvq_lambda=float(quant_raw.get("ecvq_lambda", 0.0)),
            qscheme=str(quant_raw.get("qscheme", "per_channel")),
            lr=(float(quant_raw["lr"])
                if quant_raw.get("lr") is not None else None),
            row_stride=int(quant_raw.get("row_stride", 1)),
            skip_layers=(
                tuple(int(i) for i in quant_raw["skip_layers"])
                if quant_raw.get("skip_layers") is not None
                else None
            ),
            # explicit per-layer widths ride the ladder unchanged;
            # bit_alloc=auto is per-member work and stays a compress.py
            # feature (the ladder shares ONE quant program across members)
            bits_per_layer=(
                tuple(
                    int(b) if b is not None else None
                    for b in quant_raw["bits_per_layer"]
                )
                if quant_raw.get("bits_per_layer") is not None
                else None
            ),
        )
    ec = cfg.get("entropy_coding") or {}
    stream_name = ec.get("stream_name", "zstd")
    if stream_name == "none":
        stream_name = "zstd"
    init_params = None
    if cfg.train.get("init_path"):
        # meta-learned warm start (training/metainit.py): every ladder
        # member starts from the shared artifact
        from implicit_image_tpu.training.metainit import load_meta_init

        init_params = load_meta_init(
            cfg.train["init_path"], expect_model=mdef.name, expect_mcfg=mcfg
        )
    delta_info = None
    if delta_requested:
        # residual codebooks against the shared artifact (quant.delta,
        # BASELINE.md "Delta quantization"); every member's manifest
        # records the artifact path + sha256
        import hashlib as _hashlib
        from pathlib import Path as _Path

        art = _Path(str(cfg.train["init_path"]))
        delta_info = {
            "artifact": str(art),
            "sha256": _hashlib.sha256(art.read_bytes()).hexdigest(),
        }
    return dict(
        img=img, grid=grid, mdef=mdef, mcfg=mcfg, masking=masking,
        train_cfg=train_cfg, optim_cfg=optim_cfg, quant_cfg=quant_cfg,
        stream_name=stream_name, init_params=init_params,
        delta_info=delta_info,
        half=ec.get("half", "auto"),
        # progressive/base_finetune are compress.py container-policy keys,
        # not encode_stream kwargs; the ladder/fleet members write flat
        # containers (scalable members would need per-member finetune state)
        coding_kwargs={k: v for k, v in ec.items()
                       if k not in ("stream_name", "half", "progressive",
                                    "base_finetune", "xor")},
    )


def parse_ladder_cli(argv):
    """(composed cfg, densities, gmp) from compress.py-style overrides.

    The ladder axis is masking.density for RigL-style presets and
    masking.final_density for GMP (decay magnitude-prune); a single value
    on the OTHER axis passes through as a plain config override, a comma
    list on it is an error."""
    from implicit_image_tpu.config import compose

    density_list = final_list = None
    kept = []
    for a in argv:
        if a.startswith("masking.density="):
            density_list = [float(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("masking.final_density="):
            final_list = [float(x) for x in a.split("=", 1)[1].split(",")]
        else:
            kept.append(a)
    cfg = compose(kept)
    if not cfg.get("masking") or cfg.masking.get("dense", False):
        kept = [a for a in kept if not a.startswith("masking=")]
        cfg = compose(kept + ["masking=RigL"])
    gmp = cfg.masking.get("decay_schedule") == "magnitude-prune"
    axis_list, other_list, other_key = (
        (final_list, density_list, "masking.density") if gmp
        else (density_list, final_list, "masking.final_density")
    )
    if other_list is not None:
        if len(other_list) != 1:
            raise ValueError(
                f"{other_key} is not the ladder axis for "
                f"masking={cfg.masking.get('name')}; give a single value"
            )
        cfg = compose(kept + [f"{other_key}={other_list[0]}"])
    densities = axis_list or (
        [0.1, 0.25, 0.5] if gmp else [0.05, 0.1, 0.2, 0.4, 0.75]
    )
    return cfg, densities, gmp


def cli(argv=None) -> None:
    """Compose the compress.py config, read the density comma-list as the
    ladder axis, and write one standard run dir per member."""
    import json
    import sys

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg, densities, gmp = parse_ladder_cli(argv)

    args = build_ladder_args(cfg)
    img, grid = args["img"], args["grid"]
    mdef, mcfg = args["mdef"], args["mcfg"]
    masking, train_cfg = args["masking"], args["train_cfg"]
    optim_cfg, quant_cfg = args["optim_cfg"], args["quant_cfg"]
    stream_name = args["stream_name"]

    # root carries the masking method: three ladders of one exp_name
    # (RigL/SNFS/Pruning study sweeps) must not overwrite one another's
    # member run dirs (r4 study post-mortem)
    mname = (cfg.get("masking") or {}).get("name") or "dense"
    root = Path(cfg.get("output_dir", "outputs")) / cfg.img.name / (
        f"ladder_{mname}_" + cfg.get("exp_name", "run")
    )
    t0 = time.perf_counter()
    results = ladder_compress(
        jax.random.PRNGKey(int(cfg.seed)),
        mdef, mcfg, grid, img, train_cfg, optim_cfg, masking, densities,
        quant_cfg=quant_cfg, stream_name=stream_name, stream_root=str(root),
        half=args["half"], coding_kwargs=args["coding_kwargs"],
        init_params=args["init_params"], delta_info=args["delta_info"],
    )
    wall = time.perf_counter() - t0
    for d, r in zip(densities, results):
        run_dir = Path(r.stream_dir)
        member_cfg = json.loads(json.dumps(cfg, default=str))
        member_cfg["masking"]["final_density" if gmp else "density"] = d
        (run_dir / "config.json").write_text(json.dumps(member_cfg, indent=2))
        (run_dir / "summary.json").write_text(json.dumps({
            "PSNR": r.psnr,
            "Quant PSNR": r.quant_psnr,
            "Decoded PSNR": r.decoded_psnr,
            "Compressed Bytes": r.compressed_bytes,
        }, indent=2))
        print(
            f"d={d}: fit={r.psnr:.2f} dB quant={r.quant_psnr:.2f} dB "
            f"decoded={r.decoded_psnr:.2f} dB bytes={r.compressed_bytes}"
        )
    print(f"LADDER {len(densities)} members in {wall:.1f}s (one compile)")


if __name__ == "__main__":
    cli()
