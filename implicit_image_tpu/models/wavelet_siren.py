"""Wavelet-SIREN — two SIRENs predicting a db3 wavelet decomposition.

Capability parity with reference `implicit_image/models/wavelet_siren.py`
(WaveletSiren :12-106):
  * LF SIREN predicts YCbCr at the DWT-LL resolution        (:76-81)
  * HF SIREN predicts the Y detail bands (LH, HL, HH)       (:83-85)
  * inverse db3 DWT (zero mode) reconstructs full-res Y     (:90)
  * Cb/Cr bilinearly upsampled (align_corners=False)        (:94-100)
  * YCbCr -> RGB with kornia's convention                   (:104)
  * both sub-SIRENs share (depth, hidden, omega_0); hidden scaled by
    sqrt(small_dense_density)                               (:30,41-59)

TPU-native design: the coordinate grids are deterministic functions of the
static (height, width) config, so the whole forward is one fused XLA
program (the reference probes DWT shapes lazily with a random tensor at
first forward, :70-74 — here shapes are closed-form: (N+5)//2).

Deliberate divergences from reference quirks:
  * the reference builds the HF grid square (HF_h x HF_h) even for
    non-square images (:83 uses HF_h_ll[0] twice) — we use (hf_h, hf_w);
  * the reference only actually works for wavelet_levels=1 (its IDWT call
    stacks all levels' bands into one level's tensor, :85-90); we implement
    exactly the J=1 capability and validate the config.

The params pytree is the concatenation (LF layers..., HF layers...), so
masking / quantization / entropy coding treat it like any other layer
stack.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from implicit_image_tpu.models.siren import SirenConfig, init_siren, siren_apply_flat
from implicit_image_tpu.ops.wavelet import dwt_coeff_len, idwt2

__all__ = [
    "WaveletSirenConfig",
    "init_wavelet_siren",
    "wavelet_siren_apply",
    "wavelet_siren_apply_flat",
    "ycbcr_to_rgb",
]


def ycbcr_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """YCbCr (0.5-offset chroma, [0,1]) -> RGB, kornia's convention
    (reference :104 uses kornia.color.ycbcr.ycbcr_to_rgb)."""
    y = img[..., 0]
    cb = img[..., 1] - 0.5
    cr = img[..., 2] - 0.5
    r = y + 1.403 * cr
    g = y - 0.714 * cr - 0.344 * cb
    b = y + 1.773 * cb
    return jnp.stack([r, g, b], axis=-1)


@dataclass(frozen=True)
class WaveletSirenConfig:
    """Static config (defaults mirror conf/mlp/wavelet_siren.yaml)."""

    input_size: int = 2
    output_size: int = 3
    depth: int = 8
    hidden_size: int = 128
    wavelet_levels: int = 1
    first_omega_0: float = 50.0
    hidden_omega_0: float = 30.0
    outermost_linear: bool = True
    small_dense_density: float = 1.0
    # target image size — static so the grids/DWT shapes compile in
    height: int = 512
    width: int = 512

    def __post_init__(self):
        assert self.wavelet_levels == 1, (
            "wavelet_levels > 1 is unsupported (the reference's IDWT call "
            "only ever reconstructs one level, wavelet_siren.py:85-90)"
        )

    @property
    def lf_config(self) -> SirenConfig:
        return SirenConfig(
            input_size=self.input_size,
            output_size=self.output_size,
            depth=self.depth,
            hidden_size=self.hidden_size,
            first_omega_0=self.first_omega_0,
            hidden_omega_0=self.hidden_omega_0,
            outermost_linear=self.outermost_linear,
            small_dense_density=self.small_dense_density,
        )

    @property
    def hf_config(self) -> SirenConfig:
        return SirenConfig(
            input_size=self.input_size,
            output_size=self.output_size * self.wavelet_levels,
            depth=self.depth,
            hidden_size=self.hidden_size,
            first_omega_0=self.first_omega_0,
            hidden_omega_0=self.hidden_omega_0,
            outermost_linear=self.outermost_linear,
            small_dense_density=self.small_dense_density,
        )

    @property
    def n_lf_layers(self) -> int:
        return self.depth

    @property
    def lf_shape(self) -> Tuple[int, int]:
        return dwt_coeff_len(self.height), dwt_coeff_len(self.width)

    @property
    def hf_shape(self) -> Tuple[int, int]:
        return dwt_coeff_len(self.height), dwt_coeff_len(self.width)


def init_wavelet_siren(key: jax.Array, cfg: WaveletSirenConfig, dtype=jnp.float32):
    lf_key, hf_key = jax.random.split(key)
    lf = init_siren(lf_key, cfg.lf_config, dtype)
    hf = init_siren(hf_key, cfg.hf_config, dtype)
    return tuple(lf) + tuple(hf)


def _grid_flat(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """The training grid convention (data.get_grid), flattened — the LF/HF
    sub-SIRENs regenerate their own grids at DWT resolutions, like the
    reference does via get_grid (wavelet_siren.py:76-79)."""
    from implicit_image_tpu.data import get_grid

    return get_grid(h, w, dtype=dtype).reshape(h * w, 2)


def wavelet_siren_apply(
    params, grid: jnp.ndarray, cfg: WaveletSirenConfig, compute_dtype=None
) -> jnp.ndarray:
    """Forward -> (H, W, 3) RGB. The input grid is only consulted for its
    shape (the reference likewise regenerates its own LF/HF grids,
    wavelet_siren.py:76-83)."""
    h, w = grid.shape[:2]
    assert (h, w) == (cfg.height, cfg.width), (
        f"grid {h}x{w} != configured {cfg.height}x{cfg.width}"
    )
    lf_params = params[: cfg.n_lf_layers]
    hf_params = params[cfg.n_lf_layers :]

    lf_h, lf_w = cfg.lf_shape
    hf_h, hf_w = cfg.hf_shape

    lf_img = siren_apply_flat(
        lf_params, _grid_flat(lf_h, lf_w), cfg.lf_config, compute_dtype
    ).reshape(lf_h, lf_w, cfg.output_size)
    hf_img = siren_apply_flat(
        hf_params, _grid_flat(hf_h, hf_w), cfg.hf_config, compute_dtype
    ).reshape(hf_h, hf_w, 3)

    # Y channel: inverse DWT of (LL from LF siren, bands from HF siren)
    y = idwt2(
        lf_img[:, :, 0],
        hf_img[:, :, 0],
        hf_img[:, :, 1],
        hf_img[:, :, 2],
        (h, w),
    )

    # Cb, Cr: bilinear upsample (align_corners=False semantics)
    cbcr = jax.image.resize(
        lf_img[:, :, 1:], (h, w, 2), method="bilinear"
    )

    ycbcr = jnp.concatenate([y[:, :, None], cbcr], axis=-1)
    return ycbcr_to_rgb(ycbcr)


def wavelet_siren_apply_flat(
    params, coords: jnp.ndarray, cfg: WaveletSirenConfig, compute_dtype=None
) -> jnp.ndarray:
    """(N, 2) -> (N, 3); N must equal height*width (full-grid batch)."""
    n = coords.shape[0]
    assert n == cfg.height * cfg.width, (
        f"wavelet_siren is a full-grid model: N={n} != H*W="
        f"{cfg.height * cfg.width}"
    )
    out = wavelet_siren_apply(
        params, coords.reshape(cfg.height, cfg.width, -1), cfg, compute_dtype
    )
    return out.reshape(n, -1)
