"""db3 DWT/IDWT op + wavelet-SIREN model tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_image_tpu.data import get_grid, synthetic_image
from implicit_image_tpu.models import build_model
from implicit_image_tpu.models.wavelet_siren import ycbcr_to_rgb
from implicit_image_tpu.ops.wavelet import dwt2, dwt_coeff_len, idwt2


@pytest.mark.parametrize("n", [16, 64, 100])
def test_dwt_idwt_perfect_reconstruction(n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    ll, lh, hl, hh = dwt2(x)
    assert ll.shape == (dwt_coeff_len(n), dwt_coeff_len(n))
    rec = idwt2(ll, lh, hl, hh, (n, n))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=5e-6)


def test_dwt_lowpass_of_constant():
    # LL of a constant image is constant * 2 (db3 lowpass gain sqrt(2) per
    # axis), detail bands ~ 0 away from the zero-padded border.
    x = jnp.ones((64, 64))
    ll, lh, hl, hh = dwt2(x)
    np.testing.assert_allclose(np.asarray(ll)[5:-5, 5:-5], 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hh)[5:-5, 5:-5], 0.0, atol=1e-5)


def test_ycbcr_to_rgb_identity_points():
    # Y=0.5, Cb=Cr=0.5 (zero chroma) -> gray 0.5
    g = ycbcr_to_rgb(jnp.asarray([[[0.5, 0.5, 0.5]]]))
    np.testing.assert_allclose(np.asarray(g), 0.5, atol=1e-6)
    # white
    w = ycbcr_to_rgb(jnp.asarray([[[1.0, 0.5, 0.5]]]))
    np.testing.assert_allclose(np.asarray(w), 1.0, atol=1e-6)


def test_wavelet_siren_forward_shapes():
    mdef, mcfg = build_model(
        "wavelet_siren", depth=4, hidden_size=16, height=32, width=48
    )
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    assert len(params) == 8  # 4 LF + 4 HF layers
    grid = get_grid(32, 48)
    out = mdef.apply(params, grid, mcfg)
    assert out.shape == (32, 48, 3)
    flat = mdef.apply_flat(params, grid.reshape(-1, 2), mcfg)
    np.testing.assert_allclose(
        np.asarray(flat).reshape(32, 48, 3), np.asarray(out), atol=1e-6
    )


def test_wavelet_siren_fits_an_image():
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit

    img = synthetic_image(32, 32, seed=0)
    grid = get_grid(32, 32)
    mdef, mcfg = build_model(
        "wavelet_siren", depth=4, hidden_size=24, height=32, width=32
    )
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=400, log_steps=200), OptimConfig(lr=1e-3),
    )
    psnr = np.asarray(res.metrics["psnr"])
    psnr = psnr[~np.isnan(psnr)]
    assert psnr[-1] > 22.0, psnr


def test_wavelet_siren_rejects_multi_level():
    with pytest.raises(AssertionError):
        build_model("wavelet_siren", wavelet_levels=2)


def test_db3_filters_match_pywavelets_convention():
    """dec_hi must equal pywt.Wavelet('db3').dec_hi exactly (sign included);
    the dwt<->idwt round trip cannot catch a global sign flip because the
    two flips cancel."""
    from implicit_image_tpu.ops.wavelet import _filters

    dec_lo, dec_hi, rec_lo, rec_hi = _filters()
    pywt_dec_hi = [
        -0.3326705529509569,
        0.8068915093133388,
        -0.4598775021193313,
        -0.13501102001039084,
        0.08544127388224149,
        0.035226291882100656,
    ]
    np.testing.assert_allclose(dec_hi, pywt_dec_hi, atol=1e-15)
    # pywt rec_hi is dec_hi reversed
    np.testing.assert_allclose(rec_hi, pywt_dec_hi[::-1], atol=1e-15)
