"""Rate–distortion curves: ours vs JPEG / JPEG2000 / WebP.

Capability parity with reference visualize/rate_distortion.py:
  * `traditional_rate_distortion` (:104-149) — re-encode the ground truth
    at a 20-point quality ladder per codec with OpenCV, recording
    (kilobytes, PSNR) per point
  * `ours_rate_distortion` (:45-101) — collect ("Quant PSNR",
    "Compressed Bytes") across a density ladder of runs (local run store
    instead of the W&B API)
  * `plot_rate_distortion` (:152-210) — overlay plot, PSNR vs KB

CLI:  python -m implicit_image_tpu.visualize.rate_distortion \
          img=flower outputs_root=outputs
"""
from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from implicit_image_tpu.visualize.runs import collect_runs

log = logging.getLogger("implicit_image_tpu")

QUALITY_LADDER = np.linspace(1, 100, 20).astype(int)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def _ms_ssim_np(a: np.ndarray, b: np.ndarray) -> float:
    """MS-SSIM via ops/ssim.py (CPU jit), as many scales as the image fits."""
    import jax.numpy as jnp

    from implicit_image_tpu.ops.ssim import ms_ssim

    lv = min(5, int(np.log2(max(min(a.shape[:2]) // 11, 1))) + 1)
    return float(ms_ssim(jnp.asarray(a), jnp.asarray(b), levels=lv))


def traditional_rate_distortion(
    img: np.ndarray, ext: str = "jpg", metric: str = "psnr"
) -> List[Tuple[float, float]]:
    """(kilobytes, distortion) ladder for a standard codec, computed from
    the GT in-memory exactly like the reference (cv2.imencode, :104-149).

    ext: 'jpg' | 'jp2' | 'webp'; metric: 'psnr' | 'ms_ssim' (the latter is
    beyond reference — the reference plots PSNR only).
    """
    import cv2

    img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)[:, :, ::-1]  # RGB->BGR
    score = _psnr if metric == "psnr" else _ms_ssim_np
    points = []
    for q in QUALITY_LADDER:
        if ext == "jpg":
            flag = [cv2.IMWRITE_JPEG_QUALITY, int(q)]
        elif ext == "webp":
            flag = [cv2.IMWRITE_WEBP_QUALITY, int(q)]
        elif ext == "jp2":
            # OpenCV jp2 compression scales 0-1000
            flag = [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, int(q * 10)]
        else:
            raise KeyError(ext)
        ok, buf = cv2.imencode(f".{ext}", img8, flag)
        if not ok:
            continue
        dec = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        points.append(
            (len(buf) / 1024.0, score(dec / 255.0, img8 / 255.0))
        )
    return points


def ours_rate_distortion(
    outputs_root="outputs", img_name: Optional[str] = None,
    metric: str = "psnr",
) -> List[Tuple[float, float]]:
    """(kilobytes, distortion) from local runs carrying the rate+distortion
    summary keys (reference reads 'Quant PSNR' + 'Compressed Bytes' from
    W&B, :45-101). We plot 'Decoded PSNR' — the distortion a decoder of
    the written bitstream actually recovers — falling back to the
    pre-container quant PSNR only for runs predating the decode check.
    metric='ms_ssim' reads 'Decoded MS-SSIM' (runs predating it are
    skipped on that axis)."""
    runs = collect_runs(outputs_root, require=["Compressed Bytes"])
    points = []
    for run in runs:
        if img_name and img_name not in run["dir"]:
            continue
        if metric == "ms_ssim":
            val = run.get("Decoded MS-SSIM")
        else:
            val = run.get("Decoded PSNR",
                          run.get("Quant PSNR", run.get("PSNR")))
        if val is None:
            continue
        points.append((run["Compressed Bytes"] / 1024.0, float(val)))
    return sorted(points)


def plot_rate_distortion(
    img: np.ndarray,
    outputs_root="outputs",
    img_name: Optional[str] = None,
    out_path: str = "outputs/plots/rate_distortion.pdf",
    metric: str = "psnr",
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for ext, label in [("jpg", "JPEG"), ("jp2", "JPEG2000"), ("webp", "WebP")]:
        try:
            pts = traditional_rate_distortion(img, ext, metric=metric)
        except Exception as e:  # codec not built into this cv2
            log.warning("codec %s unavailable: %s", ext, e)
            continue
        if pts:
            kb, val = zip(*sorted(pts))
            ax.plot(kb, val, marker=".", label=label)
    ours = ours_rate_distortion(outputs_root, img_name, metric=metric)
    if ours:
        kb, val = zip(*ours)
        ax.plot(kb, val, marker="o", linewidth=2, label="Ours (INR)")
    ax.set_xlabel("Kilobytes")
    ax.set_ylabel("MS-SSIM" if metric == "ms_ssim" else "PSNR (dB)")
    ax.set_title(f"Rate-Distortion{' — ' + img_name if img_name else ''}")
    ax.legend()
    ax.grid(alpha=0.3)
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    img_name = args.get("img", "synthetic")
    root = args.get("outputs_root", "outputs")
    metric = args.get("metric", "psnr")  # psnr | ms_ssim
    from implicit_image_tpu.data import stable_seed, synthetic_image

    img = synthetic_image(512, 512, seed=stable_seed(img_name))
    suffix = "_msssim" if metric == "ms_ssim" else ""
    out = plot_rate_distortion(
        img, root, img_name,
        args.get("out",
                 f"outputs/plots/{img_name}_rate_distortion{suffix}.pdf"),
        metric=metric,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
