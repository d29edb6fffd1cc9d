"""Sequence (video) encode CLI — INR inter-frame compression.

    python -m implicit_image_tpu.sequence sequence.video=<name> \
        [sequence.frames=8] [sequence.motion=0.01] \
        [sequence.steps0=1200] [sequence.steps=300] [overrides...]
    python -m implicit_image_tpu.sequence sequence.files=f0.png,f1.png,...

Beyond reference (the reference is strictly single-image — SURVEY.md §1):
a temporally-coherent sequence is coded as

  * an I-frame: frame 0 through the standard single-image protocol
    (fit -> kmeans codebook finetune -> entropy code), optionally warm
    from `train.init_path`;
  * P-frames: every later frame warm-starts its fit from the PREVIOUS
    frame's DECODED params (encoder and decoder stay in sync by
    construction), re-derives its sparsity mask from those params'
    nonzeros (`resume` init, reference init_scheme.py:215-232), and
    delta-codes its quantized layers against them — the residual
    codebook spends its 2^bits-1 levels on the small inter-frame weight
    motion (the same mechanism measured to dominate absolute coding for
    the meta artifact: BASELINE.md "Delta quantization"). The container
    manifest records `prev` + the previous payload's sha256
    (coding/__init__.py), so a frame decodes standalone by walking the
    verified chain, and `decode_sequence` walks it forward in O(T).
  * adaptive I-frame fallback (`sequence.max_drop`, default 3 dB): a
    P-frame decoding more than max_drop below the last I-frame is
    discarded and the frame re-encodes as an I-frame — the scene-cut /
    high-motion guard (P-fits track small motion only; measured at 4x
    the tuning motion, BASELINE.md "Sequence coding").

TPU shape: the P-frame fit and quant phases are each ONE compiled
program reused across all frames — the warm params, delta offsets and
resume masks enter as traced arguments (make_quant_fit_fn
`.with_offsets`), so frame t>=2 pays zero compile.

Every frame gets a standard run dir (config.json + summary.json +
model_quantized/) readable by the decode CLI and the visualize run store.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import logging
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from implicit_image_tpu.config import compose
from implicit_image_tpu.utils import catch_error_decorator

log = logging.getLogger(__name__)

__all__ = ["encode_sequence", "decode_sequence", "cli"]


def _load_frames(cfg) -> Tuple[np.ndarray, str]:
    """(frames (T,H,W,3) float32 in [0,1], sequence name) from cfg.

    `sequence.files=a,b,c` loads image files (same loader as compress.py);
    `sequence.video=<name>` generates the deterministic synthetic stand-in
    sequence (data.synthetic_video on the name-salted seed) at
    img.height x img.width.
    """
    from implicit_image_tpu.compress import _load_image
    from implicit_image_tpu.config import DotDict
    from implicit_image_tpu.data import stable_seed, synthetic_video

    seq = cfg.get("sequence") or {}
    files = seq.get("files")
    if files:
        entries = (
            [str(e) for e in files]
            if isinstance(files, (list, tuple))
            else str(files).split(",")
        )
        frames = []
        for e in entries:
            img_cfg = DotDict(dict(cfg.img))
            img_cfg["path"] = e
            img_cfg["name"] = Path(e).stem
            frames.append(_load_image(img_cfg))
        name = Path(entries[0]).stem
        return np.stack(frames).astype(np.float32), name
    name = str(seq.get("video", "seq"))
    h = int(cfg.img.get("height", 256))
    w = int(cfg.img.get("width", 256))
    t = int(seq.get("frames", 8))
    motion = float(seq.get("motion", 0.01))
    return (
        synthetic_video(h, w, t, seed=stable_seed(name), motion=motion),
        name,
    )


def _frame_offsets(prev_params, n_layers: int):
    """Per-layer offset tuple (weights of the previous decoded frame)."""
    return tuple(
        prev_params[i].get("w") if isinstance(prev_params[i], dict) else None
        for i in range(n_layers)
    )


def _payload_sha(frame_dir: Path) -> str:
    return hashlib.sha256(
        (frame_dir / "compressed_weights.data").read_bytes()
    ).hexdigest()


def encode_sequence(argv) -> List[dict]:
    """Encode a sequence; returns per-frame result dicts.

    argv: compress.py-style dotted overrides (see module docstring).
    """
    from implicit_image_tpu.coding import (
        apply_xor_residual,
        compress_state_dict,
        decompress_state_dict,
        linear_state_dict,
        params_from_state_dict,
    )
    from implicit_image_tpu.parallel.ladder import build_ladder_args
    from implicit_image_tpu.sparsity import create_mask_state
    from implicit_image_tpu.training.fit import (
        _dummy_mask_state,
        make_fit_segments,
    )
    from implicit_image_tpu.training.quant_phase import (
        make_quant_fit_fn,
    )
    from implicit_image_tpu.optim import opt_init

    cfg = compose(list(argv))
    frames, seq_name = _load_frames(cfg)
    t_total, h, w = frames.shape[:3]
    # geometry comes from the frames themselves (files may differ from the
    # composed img group defaults)
    cfg["img"]["height"], cfg["img"]["width"] = int(h), int(w)
    args = build_ladder_args(cfg)
    mdef, mcfg, grid = args["mdef"], args["mcfg"], args["grid"]
    if grid.shape[:2] != (h, w):
        from implicit_image_tpu.data import get_grid

        grid = get_grid(h, w)
    train_cfg, optim_cfg = args["train_cfg"], args["optim_cfg"]
    masking = args["masking"]
    if cfg.get("masking", {}).get("dense", False):
        masking = None
    quant_cfg = args["quant_cfg"]
    if quant_cfg is None or quant_cfg.name != "KMeans":
        raise ValueError(
            "sequence encoding requires quant=kmeans (P-frames delta-code "
            "residual codebooks; uniform QAT has no residual form)"
        )
    stream = args["stream_name"]
    half = args["half"]
    coding_kwargs = args["coding_kwargs"]

    seq = cfg.get("sequence") or {}
    steps0 = int(seq.get("steps0", train_cfg.num_steps))
    steps_p = int(seq.get("steps", max(train_cfg.num_steps // 4, 1)))
    # gop=N > 0 inserts an I-frame every N frames (bounds P-chain drift and
    # gives random-access points at the I-frame rate); gop=0 (default) =
    # one I-frame, P all the way
    gop = int(seq.get("gop", 0))
    # stop_at_psnr: motion-adaptive P-frame budget — the P-fit checks its
    # raw fit PSNR at every segment boundary and stops once it reaches the
    # target (steps_p stays the hard cap). Near-static frames finish in
    # one segment; high-motion frames use the full budget. The target is
    # the FIT PSNR (the kmeans finetune then shifts quality the usual way).
    stop_db = seq.get("stop_at_psnr")
    stop_db = float(stop_db) if stop_db is not None else None
    # sequence.lr: P-fit learning rate (I-frames keep optim.lr). The warm
    # P-fit only tracks the small inter-frame content motion; at the full
    # fit lr (3e-4) the fresh-Adam transient moves weights FARTHER from
    # the previous frame's params than the content requires, inflating
    # the residual codebook support, while too-low lr cannot track the
    # motion and quality decays along the chain (measured A/B at 512²,
    # BASELINE.md "Sequence coding": lr 3e-4 P-frames 56.5 dB @ 82.6 KB,
    # 1e-4 57.1 dB @ 80.1 KB — dominant, the default — 3e-5 55.5 dB with
    # per-frame drift). Override per content; I-frames are unaffected.
    p_lr = float(seq.get("lr", 1e-4))
    p_optim_cfg = dataclasses.replace(optim_cfg, lr=p_lr)
    # sequence.max_drop: adaptive I-frame fallback (the scene-cut /
    # high-motion guard every production video codec carries). A P-frame
    # whose DECODED PSNR lands more than max_drop dB below the last
    # I-frame's is discarded and the frame re-encodes as an I-frame —
    # the P default (short budget, low lr) tracks small inter-frame
    # motion well but cannot track large motion (measured: at 4x the
    # tuning motion P-frames lose ~5.8 dB vs per-frame coding while the
    # streams get LARGER — BASELINE.md "Sequence coding"). The wasted P
    # attempt costs ~1 s; fallback I-frames run through the shared
    # compiled I-programs (~2.7 s/frame measured at the flagship point,
    # no recompile). `sequence.max_drop=none` disables.
    max_drop = seq.get("max_drop", 3.0)
    if isinstance(max_drop, str) and max_drop.lower() in ("none", "null", ""):
        max_drop = None
    max_drop = float(max_drop) if max_drop is not None else None

    root = Path(cfg.get("output_dir", "outputs")) / f"seq_{seq_name}"
    root.mkdir(parents=True, exist_ok=True)

    sparse = masking is not None and not masking.dense
    results: List[dict] = []
    prev_dir: Optional[Path] = None
    prev_params = None  # decoded params pytree of the previous frame
    nonlocal_state: Dict[str, object] = {}  # full decoded state dict
    # shared, 1 compile; tf32 passes to match the decoder default — a
    # 1-pass bf16 render caps PSNR readings near ~53 dB and would both
    # misreport frames and mis-trigger the max_drop scene-cut guard
    def _render(p):
        with jax.default_matmul_precision("tensorfloat32"):
            return mdef.apply(p, grid, mcfg)

    render = jax.jit(_render)

    # quant.delta + train.init_path: I-frames code residuals against the
    # shared meta artifact (the same flagship scheme, BASELINE.md "Delta
    # quantization") — P-frames keep coding against the previous frame
    iframe_delta = args.get("delta_info")

    import functools

    # ---- compiled programs shared by ALL I-frames ----
    # Frame 0, gop frames and max_drop fallbacks reuse ONE compiled
    # fit-segment chain and ONE quant program (the same jquant the
    # P-frames use — offsets/masks are traced arguments). Calling
    # fit()/quant_finetune() per I-frame instead builds fresh jits and
    # re-pays ~20-40 s of XLA compile per escalation (the persistent
    # compile cache is unusable on this runtime — NOTES.md).
    i_init_fn, i_segment_fn = make_fit_segments(
        mdef, mcfg, grid, dataclasses.replace(train_cfg, num_steps=steps0),
        optim_cfg, masking, init_params=args["init_params"],
    )
    ji_init = jax.jit(i_init_fn)
    seg_i = max(1, train_cfg.segment_steps)
    i_lengths = {min(seg_i, steps0)}
    if steps0 > seg_i and steps0 % seg_i:
        i_lengths.add(steps0 % seg_i)
    ji_segs = {
        length: jax.jit(functools.partial(i_segment_fn, length=length))
        for length in i_lengths
    }
    qfn = make_quant_fit_fn(
        mdef, mcfg, grid, quant_cfg, optim_cfg,
        matmul_precision=getattr(train_cfg, "matmul_precision", None))
    jquant = jax.jit(qfn.with_offsets)

    def encode_iframe(t: int, t_start: Optional[float] = None) -> None:
        """The standard single-image protocol (absolute coding, or
        meta-artifact delta when quant.delta is set) through the shared
        compiled programs — only the FIRST I-frame pays the compile.
        `t_start`: wall origin for the frame row (a max_drop fallback
        passes the P attempt's start so the discarded work is counted)."""
        nonlocal prev_dir, prev_params
        t0 = time.perf_counter() if t_start is None else t_start
        img_t = jnp.asarray(frames[t])
        carry = ji_init(jax.random.PRNGKey(int(cfg.seed) + 7919 * t), img_t)
        start = 0
        while start < steps0:
            length = min(seg_i, steps0 - start)
            carry, _ = ji_segs[length](carry, img_t, jnp.int32(start))
            start += length
        params_i = carry[0]
        n_l = len(params_i)
        mks_i = (
            tuple(carry[2].masks) if sparse
            else tuple(None for _ in range(n_l))
        )
        offs_i = (
            _frame_offsets(args["init_params"], n_l)
            if iframe_delta is not None
            else tuple(None for _ in range(n_l))
        )
        params_q, codebooks, _ = jquant(params_i, img_t, offs_i, mks_i)
        frame_dir = root / f"frame_{t:04d}"
        state0 = linear_state_dict(params_q, codebooks, half=half)
        delta = None
        if iframe_delta is not None:
            from implicit_image_tpu.coding import state_ref_map

            delta = dict(iframe_delta)
            delta["layers"] = [
                i for i, cb in enumerate(codebooks) if cb is not None
            ]
            state0, delta["xor"] = apply_xor_residual(
                state0, state_ref_map(args["init_params"])
            )
        nbytes = compress_state_dict(
            state0, frame_dir / "model_quantized", stream, delta=delta,
            **coding_kwargs,
        )
        dec_state = decompress_state_dict(
            frame_dir / "model_quantized", stream
        )
        nonlocal_state["prev_state"] = dec_state
        prev_params = params_from_state_dict(dec_state)
        results.append(_finish_frame(
            cfg, frame_dir, render, frames[t], prev_params, nbytes,
            stream, wall=time.perf_counter() - t0, kind="I", steps=steps0,
        ))
        nonlocal_state["i_psnr"] = results[-1]["decoded_psnr"]
        prev_dir = frame_dir

    encode_iframe(0)
    if t_total == 1:
        return results

    # ---- P-frames: one compiled fit + one compiled quant, reused ----
    # warm init from arbitrary params (traced arg): fresh optimizer, mask
    # resumed from the decoded nonzeros, topology FROZEN during the short
    # P-fit (end_when=-1 -> the reference cadence never fires; the labels
    # re-code the mask anyway)
    p_masking = (
        dataclasses.replace(masking, sparse_init="resume", end_when=-1)
        if sparse else None
    )
    init_fn, segment_fn = make_fit_segments(
        mdef, mcfg, grid, dataclasses.replace(train_cfg, num_steps=steps_p),
        p_optim_cfg, p_masking,
    )
    del init_fn  # P-frames build their carry from the previous frame

    def pframe_init(key, params):
        key, mask_key, loop_key = jax.random.split(key, 3)
        opt_state = opt_init(params, p_optim_cfg)
        if sparse:
            mask_state = create_mask_state(mask_key, params, p_masking)
            from implicit_image_tpu.sparsity import apply_masks

            params = apply_masks(params, mask_state.masks)
        else:
            mask_state = _dummy_mask_state(params)
        if p_optim_cfg.preconditioner == "ekfac":
            # carry structure must match make_fit_segments' init_fn
            # (training/fit.py) or the compiled P segment rejects it
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

    jinit = jax.jit(pframe_init)
    seg = max(1, train_cfg.segment_steps)
    if stop_db is not None:
        # finer boundaries so the early stop has granularity (an explicit
        # train.segment_steps still wins if smaller)
        seg = min(seg, max(steps_p // 4, 25))
    lengths = {min(seg, steps_p)}
    if steps_p > seg and steps_p % seg:
        lengths.add(steps_p % seg)
    jsegs = {
        length: jax.jit(functools.partial(segment_fn, length=length))
        for length in lengths
    }
    jeval = None
    if stop_db is not None:
        def _fit_psnr_fn(p, im):
            pred = mdef.apply(p, grid, mcfg).reshape(-1, 3)
            err = jnp.mean((pred - im.reshape(-1, 3)) ** 2)
            return 10.0 * jnp.log10(1.0 / err)

        jeval = jax.jit(_fit_psnr_fn)

    n_layers = len(prev_params)
    key = jax.random.PRNGKey(int(cfg.seed) + 1)
    for t in range(1, t_total):
        if gop > 0 and t % gop == 0:
            encode_iframe(t)
            continue
        t0 = time.perf_counter()
        key, fkey = jax.random.split(key)
        img_t = jnp.asarray(frames[t])
        carry = jinit(fkey, prev_params)
        start = 0
        while start < steps_p:
            length = min(seg, steps_p - start)
            carry, _ = jsegs[length](carry, img_t, jnp.int32(start))
            start += length
            if (
                jeval is not None
                and start < steps_p
                and float(jeval(carry[0], img_t)) >= stop_db
            ):
                break
        steps_used = start
        params_t, mask_state_t = carry[0], carry[2]
        mks = tuple(mask_state_t.masks) if sparse else tuple(
            None for _ in range(n_layers)
        )
        offs = _frame_offsets(prev_params, n_layers)
        params_q, codebooks, _ = jquant(params_t, img_t, offs, mks)

        frame_dir = root / f"frame_{t:04d}"
        state_t = linear_state_dict(params_q, codebooks, half=half)
        prev_state_full = nonlocal_state["prev_state"]
        # lossless XOR residual for the unquantized tensors vs the
        # previous DECODED frame (coding.apply_xor_residual) — the same
        # reference map the decoder reconstructs
        state_t, xor_names = apply_xor_residual(state_t, prev_state_full)
        delta_info = {
            "prev": f"../../{prev_dir.name}/model_quantized",
            "sha256": _payload_sha(prev_dir / "model_quantized"),
            "stream": stream,
            "layers": [i for i, cb in enumerate(codebooks) if cb is not None],
            "xor": xor_names,
        }
        nbytes = compress_state_dict(
            state_t, frame_dir / "model_quantized", stream,
            delta=delta_info, **coding_kwargs,
        )
        dec_state = decompress_state_dict(
            frame_dir / "model_quantized", stream,
            prev_state=prev_state_full,
        )
        dec_params = params_from_state_dict(dec_state)
        dec_img, psnr_t = _render_psnr(render, dec_params, frames[t])
        i_psnr = nonlocal_state.get("i_psnr")
        if (
            max_drop is not None
            and i_psnr is not None
            and psnr_t < float(i_psnr) - max_drop
        ):
            # quality floor breached: the short warm P-fit cannot track
            # this much motion — discard the attempt (encode_iframe
            # overwrites the same frame_dir) and escalate to an I-frame
            log.info(
                "frame %d: P decoded %.2f dB > %.1f dB below the last "
                "I-frame (%.2f) — falling back to an I-frame",
                t, psnr_t, max_drop, float(i_psnr),
            )
            encode_iframe(t, t_start=t0)
            continue
        nonlocal_state["prev_state"] = dec_state
        prev_params = dec_params
        results.append(_finish_frame(
            cfg, frame_dir, render, frames[t], prev_params,
            nbytes, stream, wall=time.perf_counter() - t0, kind="P",
            steps=steps_used, rendered=(dec_img, psnr_t),
        ))
        prev_dir = frame_dir

    total_bytes = sum(r["bytes"] for r in results)
    summary = {
        "frames": t_total,
        "total_bytes": total_bytes,
        "bytes_per_frame": round(total_bytes / t_total, 1),
        "mean_decoded_psnr": round(
            float(np.mean([r["decoded_psnr"] for r in results])), 2
        ),
        "gop": gop,
        "steps0": steps0,
        "steps": steps_p,
        "rows": results,
    }
    (root / "seq_summary.json").write_text(json.dumps(summary, indent=2))
    log.info(
        "SEQUENCE %s: %d frames, %d bytes total (%.1f/frame), "
        "mean decoded %.2f dB",
        seq_name, t_total, total_bytes, total_bytes / t_total,
        summary["mean_decoded_psnr"],
    )
    return results


def _render_psnr(render, dec_params, img):
    """(decoded frame, PSNR dB) of decoded params against the source."""
    dec = np.asarray(render(dec_params))
    mse = float(np.mean((dec - np.asarray(img, np.float32)) ** 2))
    return dec, float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def _finish_frame(cfg, frame_dir, render, img, dec_params,
                  nbytes, stream, wall, kind, steps,
                  rendered=None) -> dict:
    """Render the decoded frame, write config/summary, return the row.

    `rendered=(dec, psnr)` skips the render when the caller already
    evaluated the decoded params (the P-frame quality-floor check)."""
    dec, psnr = (
        rendered if rendered is not None
        else _render_psnr(render, dec_params, img)
    )
    frame_dir.mkdir(parents=True, exist_ok=True)
    frame_cfg = json.loads(json.dumps(dict(cfg), default=str))
    frame_cfg.setdefault("entropy_coding", {})
    if not isinstance(frame_cfg["entropy_coding"], dict):
        frame_cfg["entropy_coding"] = {}
    frame_cfg["entropy_coding"]["stream_name"] = stream
    (frame_dir / "config.json").write_text(
        json.dumps(frame_cfg, indent=2, default=str)
    )
    row = {
        "frame": frame_dir.name,
        "kind": kind,
        "steps": steps,
        "decoded_psnr": round(psnr, 2),
        "bytes": int(nbytes),
        "wall_s": round(wall, 3),
    }
    (frame_dir / "summary.json").write_text(json.dumps({
        "Decoded PSNR": row["decoded_psnr"],
        "Compressed Bytes": row["bytes"],
        "Frame Kind": kind,
    }, indent=2))
    print(json.dumps(row), flush=True)
    return row


def decode_sequence(root, stream: Optional[str] = None,
                    frame: Optional[int] = None):
    """Decode a sequence from a seq_* dir OR a packed single-file `.iiv`
    container (coding/container_file.py pack_sequence).

    frame=None: decode every frame in O(T) (each frame's offsets are the
    frame just decoded; the per-link sha256 checks still run). Returns
    (frames (T,H,W,3) float32, frame dir names).

    frame=t: GOP seek (VERDICT r3 item 6) — walk only from the nearest
    I-frame at or before t (I-frames are standalone; kinds come from the
    frame manifests' delta.prev links), so the cost is O(distance to the
    last I-frame), not O(t). Returns ((H,W,3) float32, frame name).
    """
    from implicit_image_tpu.coding import (
        decompress_state_dict,
        params_from_state_dict,
    )
    from implicit_image_tpu.models import build_model_from_config

    root = Path(root)
    if root.is_file():
        # packed .iiv — unpack beside a temp dir and decode from there.
        # A frame seek reads the GOP index first and extracts ONLY the
        # nearest I-frame and the P-chain to t (the rest of the archive's
        # payload is never read).
        import tempfile

        from implicit_image_tpu.coding.container_file import (
            read_sequence_index,
            unpack_sequence,
        )

        needed = None
        if frame is not None:
            frames_idx = read_sequence_index(root)["frames"]
            t = int(frame)
            if not 0 <= t < len(frames_idx):
                raise IndexError(
                    f"frame {t} out of range (sequence has "
                    f"{len(frames_idx)})"
                )
            start = t
            while start > 0 and frames_idx[start]["kind"] != "I":
                start -= 1
            needed = [f["name"] for f in frames_idx[start: t + 1]]
            # the extracted dir holds only the chain; re-index the seek
            # to its position inside it
            frame = t - start
        with tempfile.TemporaryDirectory() as tmp:
            seq_dir = unpack_sequence(
                root, Path(tmp) / root.stem, frames=needed
            )
            return decode_sequence(seq_dir, stream, frame)
    frame_dirs = sorted(
        d for d in root.iterdir()
        if d.is_dir() and d.name.startswith("frame_")
    )
    if not frame_dirs:
        raise FileNotFoundError(f"no frame_* dirs under {root}")
    cfg = json.loads((frame_dirs[0] / "config.json").read_text())
    if stream is None:
        stream = cfg.get("entropy_coding", {}).get("stream_name", "zstd")
    mdef, mcfg = build_model_from_config(cfg)
    h, w = int(cfg["img"]["height"]), int(cfg["img"]["width"])
    # value-keyed compiled-render cache (coding._get_render): repeated
    # decode/seek calls — a player scrubbing a clip — must not pay a
    # fresh ~15-20 s tunnel recompile per call
    from implicit_image_tpu.coding import _get_render

    render = _get_render(mdef, mcfg, h, w)

    if frame is not None:
        t = int(frame)
        if not 0 <= t < len(frame_dirs):
            raise IndexError(
                f"frame {t} out of range (sequence has {len(frame_dirs)})"
            )

        def _is_iframe(d: Path) -> bool:
            meta = json.loads(
                (d / "model_quantized" / "meta_data.json").read_text()
            )
            return "prev" not in meta.get("__meta__", {}).get("delta", {})

        start = t
        while start > 0 and not _is_iframe(frame_dirs[start]):
            start -= 1
        prev_state = None
        for d in frame_dirs[start: t + 1]:
            prev_state = decompress_state_dict(
                d / "model_quantized", stream, prev_state=prev_state
            )
        img = np.asarray(render(params_from_state_dict(prev_state)))
        return img, frame_dirs[t].name

    out = []
    prev_state: Optional[Dict[str, np.ndarray]] = None
    for d in frame_dirs:
        state = decompress_state_dict(
            d / "model_quantized", stream, prev_state=prev_state
        )
        out.append(np.asarray(render(params_from_state_dict(state))))
        prev_state = state
    return np.stack(out), [d.name for d in frame_dirs]


@catch_error_decorator
def cli(argv=None) -> None:
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "decode":
        from implicit_image_tpu.data import save_img

        seek = None
        for a in argv[2:]:
            if a.startswith("frame="):
                seek = int(a.split("=", 1)[1])
        out_root = Path(argv[1])
        out_root = out_root.parent if out_root.is_file() else out_root
        t0 = time.perf_counter()
        if seek is not None:
            img, name = decode_sequence(argv[1], frame=seek)
            wall = time.perf_counter() - t0
            save_img(out_root / f"{name}.png", img)
            print(
                f"decoded frame {seek} ({name}, {img.shape[0]}x"
                f"{img.shape[1]}) via GOP seek in {wall:.2f}s"
            )
            return
        frames, names = decode_sequence(argv[1])
        wall = time.perf_counter() - t0
        for f, n in zip(frames, names):
            save_img(out_root / f"{n}.png", f)
        t, h, w = frames.shape[:3]
        print(
            f"decoded {t} frames ({h}x{w}) -> {out_root}/frame_*.png in "
            f"{wall:.2f}s ({t / wall:.1f} frames/s incl. host entropy "
            f"decode + chain walk)"
        )
        return
    if argv and argv[0] == "pack":
        from implicit_image_tpu.coding.container_file import pack_sequence

        out = pack_sequence(argv[1], argv[2] if len(argv) > 2 else None)
        print(f"packed {argv[1]} -> {out} ({out.stat().st_size} bytes)")
        return
    encode_sequence(argv)


if __name__ == "__main__":
    cli()
