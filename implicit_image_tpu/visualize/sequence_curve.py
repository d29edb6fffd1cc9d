"""Per-frame quality/rate plot for a sequence run (sequence.py).

    python -m implicit_image_tpu.visualize.sequence_curve outputs/seq_<name>

Beyond reference (no sequence mode exists there): reads seq_summary.json
written by encode_sequence and plots decoded PSNR and bytes per frame,
marking I-frames — the at-a-glance view of P-chain drift and the
inter-frame rate saving. Output: <seq_dir>/sequence_curve.pdf (or --out).
"""
from __future__ import annotations

import json
import logging
import sys
from pathlib import Path

log = logging.getLogger("implicit_image_tpu")


def plot_sequence(seq_dir, out_path=None):
    """Render the per-frame curve; returns the output path."""
    seq_dir = Path(seq_dir)
    summary_file = seq_dir / "seq_summary.json"
    if not summary_file.is_file():
        raise FileNotFoundError(
            f"{summary_file} not found — encode the sequence first "
            "(python -m implicit_image_tpu.sequence ...)"
        )
    summary = json.loads(summary_file.read_text())
    rows = summary["rows"]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t = list(range(len(rows)))
    psnr = [r["decoded_psnr"] for r in rows]
    kb = [r["bytes"] / 1024.0 for r in rows]
    iframes = [i for i, r in enumerate(rows) if r["kind"] == "I"]

    fig, ax1 = plt.subplots(figsize=(7, 4))
    ax1.plot(t, psnr, "o-", color="tab:blue", label="decoded PSNR")
    ax1.set_xlabel("frame")
    ax1.set_ylabel("decoded PSNR (dB)", color="tab:blue")
    ax1.tick_params(axis="y", labelcolor="tab:blue")
    ax2 = ax1.twinx()
    ax2.bar(t, kb, color="tab:orange", alpha=0.35, label="bytes")
    ax2.set_ylabel("KB / frame", color="tab:orange")
    ax2.tick_params(axis="y", labelcolor="tab:orange")
    for i in iframes:
        ax1.axvline(i, color="gray", linestyle=":", alpha=0.6)
    ax1.set_title(
        f"{seq_dir.name}: {summary['frames']} frames, "
        f"{summary['bytes_per_frame'] / 1024.0:.1f} KB/frame, "
        f"mean {summary['mean_decoded_psnr']:.2f} dB "
        f"(dotted = I-frames)"
    )
    fig.tight_layout()
    out_path = Path(out_path) if out_path else seq_dir / "sequence_curve.pdf"
    fig.savefig(out_path)
    plt.close(fig)
    log.info("wrote %s", out_path)
    return out_path


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    out = None
    args = [a for a in sys.argv[1:]]
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i : i + 2]
    plot_sequence(args[0], out)


if __name__ == "__main__":
    main()
