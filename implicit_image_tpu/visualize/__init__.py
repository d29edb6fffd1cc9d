"""Analysis & visualization — rate–distortion and ablation plots.

Capability parity with reference `implicit_image/visualize/` (which pulls
run metrics from the W&B API): here runs are read from the local
`outputs/` tree written by compress.py (each run dir has summary.json +
metrics.jsonl — utils/logger.py), and the JPEG/JPEG2000/WebP comparator
curves are computed from the ground-truth image exactly like the
reference (rate_distortion.py:104-149 re-encodes at a quality ladder via
OpenCV).
"""
from implicit_image_tpu.visualize.runs import collect_runs, load_run

__all__ = [
    "collect_runs",
    "load_run",
    "traditional_rate_distortion",
    "ours_rate_distortion",
    "plot_rate_distortion",
]

_RD_NAMES = (
    "traditional_rate_distortion",
    "ours_rate_distortion",
    "plot_rate_distortion",
)


def __getattr__(name):
    # lazy: `python -m implicit_image_tpu.visualize.rate_distortion`
    # imports this package first; an eager import here would double-load
    # the module being run (runpy warning)
    if name in _RD_NAMES:
        from implicit_image_tpu.visualize import rate_distortion

        return getattr(rate_distortion, name)
    raise AttributeError(name)
