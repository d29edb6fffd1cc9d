"""Learning-rate schedules as pure functions of the step index.

The reference uses torch StepLR(step_size=2000, gamma=0.5) during fitting
and StepLR(1000, 0.5) during quantize finetuning (train_helper.py:81-84),
stepped once per optimizer step. The closed form lr(t) = lr0 * gamma^(t//s)
is exactly equivalent and jit-friendly.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["step_lr", "cosine_lr"]


def step_lr(base_lr: float, step_size: int = 2000, gamma: float = 0.5):
    """Returns lr(step) = base_lr * gamma ** (step // step_size)."""

    def schedule(step):
        k = jnp.asarray(step, jnp.int32) // step_size
        return base_lr * gamma ** k.astype(jnp.float32)

    return schedule


def cosine_lr(
    base_lr: float,
    num_steps: int,
    warmup: int = 0,
    final_frac: float = 0.0,
):
    """Linear warmup + cosine decay to ``final_frac * base_lr`` at
    ``num_steps``. Opt-in (``optim.lr_schedule=cosine``) — the reference
    only ships StepLR (train_helper.py:81-84), which stays the default for
    strict parity. Cosine front-loads the high-lr phase, which pays at
    short budgets (time-to-quality flagship, BASELINE.md)."""

    warmup = max(int(warmup), 0)
    span = max(int(num_steps) - warmup, 1)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = s / jnp.float32(max(warmup, 1))
        t = jnp.clip((s - warmup) / jnp.float32(span), 0.0, 1.0)
        cos = final_frac + (1.0 - final_frac) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        return base_lr * jnp.where(s < warmup, warm, cos)

    return schedule
