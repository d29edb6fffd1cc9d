"""Prune-rate decay schedules as pure functions of the step index.

Capability parity with reference `masking/funcs/decay.py`:
  * CosineDecay (decay.py:25-70)   — wraps CosineAnnealingLR there; here the
    closed form eta_min + (r0-eta_min)*(1+cos(pi*t/T_max))/2, clamped at T_max.
  * LinearDecay (decay.py:73-109)  — r0 * (1 - t/T_max), clamped.
  * MagnitudePruneDecay (decay.py:112-158) — Zhu & Gupta 2018 cubic
    cumulative-sparsity schedule; prune rate = max(cum(t) - current_sparsity, 0)
    ("cumulative" mode, consumed with the ACTUAL current sparsity at update
    time, reference core.py:694-700).

Deviation (documented): the reference's internal step counter increments on
both optimizer steps and mask updates (core.py:702,771), drifting slightly
ahead of the train step; we index schedules by the train step directly.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp

__all__ = [
    "cosine_decay",
    "linear_decay",
    "magnitude_prune_decay",
    "cumulative_sparsity",
    "build_decay",
    "registry",
]

# prune_rate_fn signature: (step, current_sparsity, final_sparsity) -> rate.
# final_sparsity is an optional TRACED override consumed only by the
# magnitude-prune schedule: it lets one compiled program serve ladder
# members with different final densities (parallel/ladder.py).
PruneRateFn = Callable


def cosine_decay(prune_rate: float, T_max: int, eta_min: float = 0.0) -> PruneRateFn:
    def fn(step, current_sparsity=None, final_sparsity=None):
        t = jnp.clip(jnp.asarray(step, jnp.float32), 0.0, float(T_max))
        return eta_min + (prune_rate - eta_min) * (1.0 + jnp.cos(jnp.pi * t / T_max)) / 2.0

    return fn


def linear_decay(prune_rate: float, T_max: int) -> PruneRateFn:
    def fn(step, current_sparsity=None, final_sparsity=None):
        t = jnp.clip(jnp.asarray(step, jnp.float32), 0.0, float(T_max))
        return prune_rate * (1.0 - t / T_max)

    return fn


def cumulative_sparsity(
    step,
    initial_sparsity: float,
    final_sparsity: float,
    T_start: int,
    T_max: int,
):
    """Zhu-Gupta cubic cumulative sparsity s(t) (reference decay.py:134-145)."""
    t = jnp.asarray(step, jnp.float32)
    frac = jnp.clip((t - T_start) / float(T_max - T_start), 0.0, 1.0)
    mul = (1.0 - frac) ** 3
    s = final_sparsity + (initial_sparsity - final_sparsity) * mul
    return jnp.where(t < T_start, initial_sparsity, s)


def magnitude_prune_decay(
    final_sparsity: float,
    T_max: int,
    T_start: int,
    interval: int,
    initial_sparsity: float = 0.0,
) -> PruneRateFn:
    """Prune rate = max(cumulative_sparsity(t) - current_sparsity, 0).

    The returned fn's `final_sparsity` kwarg, when given, REPLACES the
    baked float with a traced scalar (MaskState.final_sparsity) — the
    schedule then depends on the carry, not the program, so one compiled
    fit serves a whole final-density ladder."""
    baked = final_sparsity

    def fn(step, current_sparsity=None, final_sparsity=None):
        fs = final_sparsity if final_sparsity is not None else baked
        cum = cumulative_sparsity(step, initial_sparsity, fs, T_start, T_max)
        if current_sparsity is None:
            current_sparsity = cumulative_sparsity(
                jnp.asarray(step) - interval,
                initial_sparsity,
                fs,
                T_start,
                T_max,
            )
        return jnp.maximum(cum - current_sparsity, 0.0)

    return fn


def build_decay(masking_cfg) -> PruneRateFn:
    """Build from a masking config group (mirrors setup_mask, train_helper.py:100-113)."""
    schedule = masking_cfg.decay_schedule
    if schedule == "magnitude-prune":
        return magnitude_prune_decay(
            final_sparsity=1.0 - masking_cfg.final_density,
            T_max=masking_cfg.end_when,
            T_start=masking_cfg.start_when,
            interval=masking_cfg.interval,
        )
    if schedule == "cosine":
        return cosine_decay(masking_cfg.prune_rate, T_max=masking_cfg.end_when)
    if schedule == "linear":
        return linear_decay(masking_cfg.prune_rate, T_max=masking_cfg.end_when)
    raise KeyError(f"Unknown decay schedule {schedule!r}")


registry = {
    "cosine": cosine_decay,
    "linear": linear_decay,
    "magnitude-prune": magnitude_prune_decay,
}
