"""Profiling/observability utilities (utils/profiling.py)."""
import logging

import numpy as np

import jax
import jax.numpy as jnp

from implicit_image_tpu.utils import annotate, cost_analysis, wall


def test_cost_analysis_reports_flops():
    def f(a, b):
        return jnp.dot(a, b)

    a = jnp.ones((64, 32), jnp.float32)
    b = jnp.ones((32, 16), jnp.float32)
    cost = cost_analysis(f, a, b)
    assert cost is not None and "flops" in cost
    # 2*M*K*N fused-multiply-add accounting
    assert cost["flops"] >= 64 * 32 * 16


def test_wall_logs_span(caplog):
    with caplog.at_level(logging.INFO, logger="implicit_image_tpu"):
        with wall("unit-span"):
            pass
    assert any("unit-span" in r.message for r in caplog.records)


def test_annotate_is_usable_under_jit():
    with annotate("span"):
        out = jax.jit(lambda x: x * 2)(jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(out), 2.0)
