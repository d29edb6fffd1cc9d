"""Learning-rate schedules as pure functions of the step index.

The reference uses torch StepLR(step_size=2000, gamma=0.5) during fitting
and StepLR(1000, 0.5) during quantize finetuning (train_helper.py:81-84),
stepped once per optimizer step. The closed form lr(t) = lr0 * gamma^(t//s)
is exactly equivalent and jit-friendly.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["step_lr"]


def step_lr(base_lr: float, step_size: int = 2000, gamma: float = 0.5):
    """Returns lr(step) = base_lr * gamma ** (step // step_size)."""

    def schedule(step):
        k = jnp.asarray(step, jnp.int32) // step_size
        return base_lr * gamma ** k.astype(jnp.float32)

    return schedule
