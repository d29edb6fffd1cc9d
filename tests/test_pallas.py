"""Fused sine-MLP Pallas kernel tests (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from implicit_image_tpu.data import get_grid
from implicit_image_tpu.models import build_model
from implicit_image_tpu.ops.fast_math import fast_cos, fast_sin
from implicit_image_tpu.ops.sine_mlp import siren_apply_flat_pallas


def test_fast_sin_cos_accuracy():
    x = jnp.linspace(-40.0, 40.0, 10001)
    np.testing.assert_allclose(
        np.asarray(fast_sin(x)), np.sin(np.asarray(x)), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(fast_cos(x)), np.cos(np.asarray(x)), atol=2e-5
    )


@pytest.mark.slow
@pytest.mark.parametrize("depth,hidden,hw", [(5, 64, (20, 30)), (4, 150, (16, 16))])
def test_fused_forward_matches_xla(depth, hidden, hw):
    mdef, mcfg = build_model("siren", depth=depth, hidden_size=hidden)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    coords = get_grid(*hw).reshape(-1, 2)
    with pltpu.force_tpu_interpret_mode():
        out_p = siren_apply_flat_pallas(params, coords, mcfg)
    out_x = mdef.apply_flat(params, coords, mcfg, compute_dtype=jnp.bfloat16)
    # both paths are bf16; differences are bf16 rounding placement
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), atol=8e-3
    )


@pytest.mark.slow
def test_fused_gradients_match_xla():
    mdef, mcfg = build_model("siren", depth=4, hidden_size=32)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    coords = get_grid(12, 12).reshape(-1, 2)
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (144, 3))

    def loss_p(p):
        return jnp.mean((siren_apply_flat_pallas(p, coords, mcfg) - tgt) ** 2)

    def loss_x(p):
        return jnp.mean(
            (mdef.apply_flat(p, coords, mcfg, jnp.bfloat16) - tgt) ** 2
        )

    def loss_f32(p):
        return jnp.mean((mdef.apply_flat(p, coords, mcfg, None) - tgt) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p)(params)
    gx = jax.grad(loss_x)(params)
    gf = jax.grad(loss_f32)(params)
    # the fused kernel's gradient error (vs exact f32) must be comparable to
    # the XLA-bf16 path's own error — both are bf16 computations that differ
    # only in where rounding happens
    for a, b, f in zip(gp, gx, gf):
        for k in a:
            scale = float(jnp.max(jnp.abs(f[k]))) + 1e-12
            err_pallas = float(jnp.max(jnp.abs(a[k] - f[k]))) / scale
            err_xla = float(jnp.max(jnp.abs(b[k] - f[k]))) / scale
            assert err_pallas < max(2.5 * err_xla, 0.02), (
                k, err_pallas, err_xla
            )


@pytest.mark.slow
def test_fused_fit_converges():
    """End-to-end: the fused kernel trains to a sane PSNR on CPU interpret."""
    from implicit_image_tpu.data import synthetic_image
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, make_fit_fn

    img = jnp.asarray(synthetic_image(16, 16, seed=0))
    grid = get_grid(16, 16)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)
    fit_fn = make_fit_fn(
        mdef, mcfg, grid,
        TrainConfig(num_steps=60, log_steps=30, use_pallas=True),
        OptimConfig(lr=1e-3),
    )
    with pltpu.force_tpu_interpret_mode():
        _, _, _, metrics = fit_fn(jax.random.PRNGKey(0), img)
        psnr = np.asarray(metrics["psnr"])
    psnr = psnr[~np.isnan(psnr)]
    assert psnr[-1] > 15.0, psnr


def test_fused_coordinate_gradient_matches_xla():
    """grad wrt COORDS must match the XLA path (used for SDF normals /
    coordinate jitter); the kernel computes dx = gz @ w0^T per tile."""
    mdef, mcfg = build_model("siren", depth=4, hidden_size=32)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    coords = get_grid(12, 12).reshape(-1, 2)

    def loss_p(c):
        return jnp.sum(siren_apply_flat_pallas(params, c, mcfg) ** 2)

    def loss_x(c):
        return jnp.sum(mdef.apply_flat(params, c, mcfg, compute_dtype=jnp.bfloat16) ** 2)

    def loss_f32(c):
        return jnp.sum(mdef.apply_flat(params, c, mcfg, None) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p)(coords)
    gx = jax.grad(loss_x)(coords)
    gf = jax.grad(loss_f32)(coords)
    assert float(jnp.abs(gp).max()) > 0.0  # not silently zero
    # ω₀·cos amplifies bf16 rounding in coordinate grads; require the fused
    # kernel's error vs exact f32 to be comparable to XLA-bf16's own error
    scale = float(jnp.abs(gf).max()) + 1e-12
    err_p = float(jnp.abs(gp - gf).max()) / scale
    err_x = float(jnp.abs(gx - gf).max()) / scale
    assert err_p < max(2.5 * err_x, 0.02), (err_p, err_x)
