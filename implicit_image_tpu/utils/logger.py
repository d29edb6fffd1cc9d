"""Run-local metrics sink — the replacement for the reference's W&B.

The reference logs {loss, PSNR, PSNR_8bit, Prune Rate, Density, Quant PSNR,
Compressed Bytes} to W&B (compress.py:33-49,146-170,212-216,260-263) and
its analysis scripts read them back from the W&B API. In a zero-egress
environment the same metrics go to `<run_dir>/metrics.jsonl` (one JSON
object per logged step) plus a human log line; visualize/ reads these
files instead of the W&B API.
"""
from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Optional

log = logging.getLogger("implicit_image_tpu")


class MetricsLogger:
    """Sinks: python logging line + metrics.jsonl (+ optional W&B when the
    package is importable and `wandb_project` is set — the reference's
    third sink, compress.py:89-101)."""

    def __init__(
        self,
        run_dir: Optional[str] = None,
        use: bool = True,
        wandb_project: Optional[str] = None,
        wandb_name: Optional[str] = None,
    ):
        self.use = use
        self.run_dir = Path(run_dir) if run_dir else None
        self._fh = None
        self._wandb = None
        if use and self.run_dir is not None:
            self.run_dir.mkdir(parents=True, exist_ok=True)
            self._fh = open(self.run_dir / "metrics.jsonl", "a")
        if use and wandb_project:
            try:
                import wandb

                kwargs = {"project": wandb_project, "name": wandb_name}
                if self.run_dir is not None:
                    kwargs["dir"] = str(self.run_dir)
                self._wandb = wandb.init(**kwargs)
            except Exception as e:  # package absent / offline / no API key
                log.warning("wandb sink disabled: %s", e)

    def log(self, step: int, metrics: dict, prefix: str = "Train"):
        if not self.use:
            return
        clean = {
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in metrics.items()
        }
        line = " | ".join(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}"
                          for k, v in clean.items())
        log.info("%s step %d | %s", prefix, step, line)
        if self._fh is not None:
            self._fh.write(json.dumps({"step": step, "prefix": prefix, **clean}) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(clean, step=step)

    def histogram(self, step: int, tensors: dict, bins: int = 64,
                  prefix: str = "watch"):
        """wandb.watch-equivalent sink (reference compress.py:101): log
        per-tensor histograms of weights / gradient-momentum to
        histograms.jsonl (+ native wandb.Histogram when that sink is on).
        """
        if not self.use:
            return
        import numpy as np

        out = {}
        wb = {}
        for name, arr in tensors.items():
            arr = np.asarray(arr).ravel()
            counts, edges = np.histogram(arr, bins=bins)
            out[name] = {
                "counts": counts.tolist(),
                "min": float(edges[0]),
                "max": float(edges[-1]),
            }
            if self._wandb is not None:
                import wandb

                wb[name] = wandb.Histogram(np_histogram=(counts, edges))
        if self.run_dir is not None:
            with open(self.run_dir / "histograms.jsonl", "a") as fh:
                fh.write(
                    json.dumps({"step": step, "prefix": prefix, "histograms": out})
                    + "\n"
                )
        if self._wandb is not None:
            self._wandb.log(wb, step=step)

    def summary(self, metrics: dict):
        if not self.use:
            return
        clean = {
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in metrics.items()
        }
        if self._wandb is not None:
            # the reference logs the rate/final metrics to W&B too
            # (compress.py:212-216,260-263)
            self._wandb.summary.update(clean)
        if self.run_dir is None:
            return
        path = self.run_dir / "summary.json"
        existing = {}
        if path.exists():
            existing = json.loads(path.read_text())
        existing.update(
            {k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()}
        )
        path.write_text(json.dumps(existing, indent=2))

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None
