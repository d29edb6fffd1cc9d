"""Profiling & static-cost analysis — the TPU-native observability layer.

The reference's tracing amounts to a perf_counter context manager
(utils/timer.py:9-13), nvidia-smi polling in SLURM jobs
(slurm_scripts/finals.sh:35-42), and MicroNet FLOPs accounting at mask init
(masking/core.py:229,248) — see SURVEY.md §5. The TPU equivalents here:

  * `trace(dir)`        — jax.profiler trace context; view with TensorBoard
                          or xprof (captures XLA ops, fusion, HBM/ICI usage)
  * `annotate(name)`    — jax.profiler.TraceAnnotation wrapper so framework
                          phases (fit / quant / encode) show as named spans
  * `cost_analysis(fn, *args)` — static XLA cost model of a jitted callable:
                          FLOPs, bytes accessed, peak memory per invocation.
                          Complements the sparsity-aware MicroNet-style
                          counting in sparsity/counting.py (which prices the
                          MODEL at actual weight sparsity; this prices the
                          compiled PROGRAM).
  * `wall(label)`       — perf_counter span logging to the module logger
                          (the reference's `catchtime`, utils/timer.py).
"""
from __future__ import annotations

import contextlib
import logging
from typing import Any, Dict, Optional

import jax

from implicit_image_tpu.utils.timer import catchtime

log = logging.getLogger("implicit_image_tpu")

__all__ = ["trace", "annotate", "cost_analysis", "wall"]


def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler device trace into `log_dir` (thin alias so
    framework code has one import point for observability)."""
    return jax.profiler.trace(log_dir, create_perfetto_link=create_perfetto_link)


def annotate(name: str):
    """Named span visible in profiler timelines (and nestable)."""
    return jax.profiler.TraceAnnotation(name)


def cost_analysis(fn, *args, **kwargs) -> Optional[Dict[str, Any]]:
    """Static XLA cost model for one invocation of `fn(*args, **kwargs)`.

    Returns {"flops", "bytes accessed", ...} per the backend's cost
    analysis, or None when the backend provides none (e.g. interpreters).
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    try:
        cost = lowered.compile().cost_analysis()
    except Exception:
        cost = lowered.cost_analysis()
    if isinstance(cost, (list, tuple)):  # some backends return [dict]
        cost = cost[0] if cost else None
    return dict(cost) if cost else None


@contextlib.contextmanager
def wall(label: str):
    """Labeled catchtime span that reports to the module logger."""
    with catchtime() as elapsed:
        try:
            yield
        finally:
            log.info("%s: %.3f s", label, elapsed())
