"""Perceptual training objective (train.loss=ms-ssim).

The reference trains MSE only (train_helper.py criterion); the mixed
(1-w)*MSE + w*(1-MS-SSIM) objective (Zhao et al. arXiv:1511.08861) is a
beyond-reference axis; eval metrics stay PSNR-based for protocol parity.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from implicit_image_tpu.data import get_grid, synthetic_image
from implicit_image_tpu.models import build_model
from implicit_image_tpu.ops.ssim import ms_ssim
from implicit_image_tpu.training.fit import (
    OptimConfig,
    TrainConfig,
    fit,
    make_train_step,
)


def _problem():
    mdef, mcfg = build_model(
        "siren", depth=3, hidden_size=16, input_size=2, output_size=3
    )
    img = jnp.asarray(synthetic_image(24, 24, seed=1, complexity=3))
    return mdef, mcfg, get_grid(24, 24), img


def test_ms_ssim_loss_trains_and_differs_from_mse():
    mdef, mcfg, grid, img = _problem()
    key = jax.random.PRNGKey(0)
    oc = OptimConfig()

    res_mix = fit(key, mdef, mcfg, grid, img,
                  TrainConfig(num_steps=60, log_steps=60, loss="ms-ssim"), oc)
    res_mse = fit(key, mdef, mcfg, grid, img,
                  TrainConfig(num_steps=60, log_steps=60), oc)

    # the mixed loss decreases and the objective is genuinely different
    loss_mix = np.asarray(res_mix.metrics["loss"])
    assert loss_mix[-1] < loss_mix[0]
    w0_mix = np.asarray(res_mix.params[0]["w"])
    w0_mse = np.asarray(res_mse.params[0]["w"])
    assert not np.allclose(w0_mix, w0_mse)

    # and it optimizes what it claims: MS-SSIM of the mixed-run render is
    # at least the init's by a wide margin
    pred = mdef.apply(res_mix.params, grid, mcfg, None)
    init_params = mdef.init(jax.random.PRNGKey(1), mcfg)
    pred0 = mdef.apply(init_params, grid, mcfg, None)
    assert float(ms_ssim(pred, img, levels=2)) > float(
        ms_ssim(pred0, img, levels=2)
    )


def test_ms_ssim_rejects_pixel_chunks():
    mdef, mcfg, grid, img = _problem()
    coords = grid.reshape(-1, 2)
    tc = TrainConfig(num_steps=4, log_steps=4, loss="ms-ssim", pixel_chunks=2)
    with pytest.raises(ValueError, match="pixel_chunks"):
        make_train_step(mdef, mcfg, coords, img.reshape(-1, 3), tc,
                        OptimConfig(), grid_hw=(24, 24))


def test_unknown_loss_rejected():
    mdef, mcfg, grid, img = _problem()
    coords = grid.reshape(-1, 2)
    tc = TrainConfig(num_steps=4, log_steps=4, loss="l1")
    with pytest.raises(ValueError, match="train.loss"):
        make_train_step(mdef, mcfg, coords, img.reshape(-1, 3), tc,
                        OptimConfig(), grid_hw=(24, 24))


def test_cli_ms_ssim(tmp_path):
    from implicit_image_tpu.compress import main as compress_main
    from implicit_image_tpu.config import compose

    psnr, _ = compress_main(compose([
        "img=synthetic", "img.height=24", "img.width=24",
        "mlp.depth=3", "mlp.hidden_size=16",
        "train.num_steps=30", "train.log_steps=30",
        "train.loss=ms-ssim", "train.pixel_chunks=1",
        "masking=none", "quant=none", "entropy_coding=plain",
        f"output_dir={tmp_path}/run",
    ]))
    assert np.isfinite(psnr)
