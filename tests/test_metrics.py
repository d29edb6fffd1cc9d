import numpy as np

import jax.numpy as jnp

from implicit_image_tpu.ops.metrics import mse, psnr, psnr_8bit


def test_psnr_known_value():
    target = jnp.zeros((4, 4, 3))
    pred = jnp.full((4, 4, 3), 0.1)
    # mse = 0.01 -> PSNR = 20
    np.testing.assert_allclose(float(psnr(pred, target)), 20.0, atol=1e-3)


def test_psnr_8bit_truncation():
    """The 8-bit metric truncates toward zero (torch .int()), not rounds."""
    target = jnp.full((2, 2, 3), 200.6 / 255.0)
    pred = jnp.full((2, 2, 3), 200.4 / 255.0)
    # trunc: target->200, pred->200 => mse_8bit = 0 => inf PSNR
    val = float(psnr_8bit(pred, target))
    assert np.isinf(val)

    target2 = jnp.full((2, 2, 3), 201.1 / 255.0)
    # trunc: 201 vs 200 -> mse = 1 -> psnr = 10*log10(255^2)
    val2 = float(psnr_8bit(pred, target2))
    np.testing.assert_allclose(val2, 10 * np.log10(255.0**2), atol=1e-4)


def test_mse():
    a = jnp.asarray([1.0, 2.0])
    b = jnp.asarray([0.0, 0.0])
    np.testing.assert_allclose(float(mse(a, b)), 2.5, atol=1e-7)
