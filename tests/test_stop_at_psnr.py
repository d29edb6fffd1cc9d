"""Encode-to-quality early stop (fit(stop_psnr=...) / train.stop_at_psnr).

The reference's fit budget is fixed (its Python loop at compress.py:137
always runs num_steps); here the segmented driver evaluates PSNR at every
segment boundary and halts once the target is reached, with the completed
segments bit-identical to an untruncated fit.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from implicit_image_tpu.data import get_grid, synthetic_image
from implicit_image_tpu.models import build_model
from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit


def _problem():
    mdef, mcfg = build_model(
        "siren", depth=3, hidden_size=16, input_size=2, output_size=3
    )
    img = jnp.asarray(synthetic_image(24, 24, seed=1, complexity=3))
    return mdef, mcfg, get_grid(24, 24), img


def test_stop_triggers_and_prefix_is_bit_identical():
    mdef, mcfg, grid, img = _problem()
    tc = TrainConfig(num_steps=40, log_steps=10, segment_steps=10)
    oc = OptimConfig()
    key = jax.random.PRNGKey(0)

    # threshold low enough that the first boundary already satisfies it
    res = fit(key, mdef, mcfg, grid, img, tc, oc, stop_psnr=1.0)
    assert res.stopped_at == 10
    assert res.stop_psnr_db >= 1.0
    assert len(np.asarray(res.metrics["loss"])) == 10

    # the truncated run's params == the full run's state at that boundary
    full = fit(key, mdef, mcfg, grid, img,
               TrainConfig(num_steps=10, log_steps=10, segment_steps=10), oc)
    for la, lb in zip(res.params, full.params):
        for k in la:
            np.testing.assert_array_equal(np.asarray(la[k]), np.asarray(lb[k]))


def test_no_stop_below_threshold_runs_full_budget():
    mdef, mcfg, grid, img = _problem()
    tc = TrainConfig(num_steps=20, log_steps=10, segment_steps=10)
    res = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img, tc,
              OptimConfig(), stop_psnr=200.0)
    assert res.stopped_at is None and res.stop_psnr_db is None
    assert len(np.asarray(res.metrics["loss"])) == 20


def test_cli_stop_at_psnr(tmp_path):
    from implicit_image_tpu.compress import main as compress_main
    from implicit_image_tpu.config import compose

    overrides = [
        "img=synthetic", "img.height=24", "img.width=24",
        "mlp.depth=3", "mlp.hidden_size=16",
        "train.num_steps=40", "train.log_steps=10",
        "train.segment_steps=10", "train.stop_at_psnr=1.0",
        "masking=none", "quant=none", "entropy_coding=plain",
        f"output_dir={tmp_path}/run",
    ]
    psnr, _ = compress_main(compose(overrides))
    assert np.isfinite(psnr) and psnr >= 1.0

    with pytest.raises(ValueError, match="stop_at_psnr"):
        compress_main(compose(overrides + [
            f"train.resume={tmp_path}/nonexistent.npz"
        ]))
