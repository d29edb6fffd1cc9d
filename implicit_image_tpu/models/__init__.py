"""Model registry — name -> (config, init, apply) pure-function triples.

Mirrors the reference's `implicit_image/models/__init__.py:5` registry
{"siren", "fourier", "wavelet_siren"} but functional: a ModelDef bundles the
static config dataclass with init/apply functions instead of an nn.Module.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Tuple

__all__ = ["ModelDef", "registry", "build_model", "build_model_from_config"]


@dataclass(frozen=True)
class ModelDef:
    name: str
    config_cls: type
    init: Callable  # (key, cfg) -> params pytree
    apply: Callable  # (params, grid(H,W,2), cfg) -> (H,W,3)
    apply_flat: Callable  # (params, coords(N,2), cfg) -> (N,3)
    # True when `apply` exploits a separable (tensor-product) grid and is
    # strictly cheaper than apply_flat on the same pixels (CoordX): the
    # fit loss then evaluates through `apply` on the full grid instead of
    # the flattened coordinate list (training/fit.py make_loss_fn).
    separable: bool = False


def _siren_def() -> ModelDef:
    from implicit_image_tpu.models.siren import (
        SirenConfig,
        init_siren,
        siren_apply,
        siren_apply_flat,
    )

    return ModelDef("siren", SirenConfig, init_siren, siren_apply, siren_apply_flat)


def _fourier_def() -> ModelDef:
    from implicit_image_tpu.models.fourier import (
        FourierConfig,
        init_fourier,
        fourier_apply,
        fourier_apply_flat,
    )

    return ModelDef(
        "fourier", FourierConfig, init_fourier, fourier_apply, fourier_apply_flat
    )


def _wavelet_siren_def() -> ModelDef:
    from implicit_image_tpu.models.wavelet_siren import (
        WaveletSirenConfig,
        init_wavelet_siren,
        wavelet_siren_apply,
        wavelet_siren_apply_flat,
    )

    return ModelDef(
        "wavelet_siren",
        WaveletSirenConfig,
        init_wavelet_siren,
        wavelet_siren_apply,
        wavelet_siren_apply_flat,
    )


def _coordx_def() -> ModelDef:
    from implicit_image_tpu.models.coordx import (
        CoordXConfig,
        coordx_apply,
        coordx_apply_flat,
        init_coordx,
    )

    return ModelDef(
        "coordx",
        CoordXConfig,
        init_coordx,
        coordx_apply,
        coordx_apply_flat,
        separable=True,
    )


def _hashgrid_def() -> ModelDef:
    from implicit_image_tpu.models.hashgrid import (
        HashGridConfig,
        hashgrid_apply,
        hashgrid_apply_flat,
        init_hashgrid,
    )

    return ModelDef(
        "hashgrid",
        HashGridConfig,
        init_hashgrid,
        hashgrid_apply,
        hashgrid_apply_flat,
        # apply evaluates tensor-product grids as per-level dense grids +
        # separable interpolation matmuls (no per-pixel gather; hashed
        # levels' backward is a static transpose-gather) — strictly
        # cheaper than apply_flat on the same pixels, like CoordX
        separable=True,
    )


registry = {
    "siren": _siren_def,
    "fourier": _fourier_def,
    "wavelet_siren": _wavelet_siren_def,
    "coordx": _coordx_def,
    "hashgrid": _hashgrid_def,
}


def build_model(model_name: str, **cfg_kwargs) -> Tuple[ModelDef, Any]:
    """Look up a model and build its config from (possibly overfull) kwargs.

    Extra keys (e.g. the 'name' field from a config group file) are dropped,
    mirroring the reference's permissive `**cfg` model construction
    (compress.py:74-77).
    """
    name = model_name
    if name not in registry:
        raise KeyError(f"Model {name!r} not in registry {sorted(registry)}")
    mdef = registry[name]()
    fields = {f.name for f in dataclasses.fields(mdef.config_cls)}
    cfg = mdef.config_cls(**{k: v for k, v in cfg_kwargs.items() if k in fields})
    return mdef, cfg


def build_model_from_config(cfg) -> Tuple[ModelDef, Any]:
    """(mdef, mcfg) from a composed run config — THE single mapping from
    cfg.mlp + cfg.masking to an architecture, shared by the encoder
    (compress.py) and the decoder (decompress.py) so the two can never
    disagree about what the bitstream's params mean.

    Applies Small-Dense width compensation (reference compress.py:74-77)
    and the Feathermap wrap (reference compress.py:80-81).
    """
    mlp = dict(cfg["mlp"])
    name = mlp.pop("name")
    masking = cfg.get("masking") or {}
    small = 1.0
    if masking.get("name") == "Small_Dense":
        small = float(masking.get("density", 1.0))
    mdef, mcfg = build_model(name, small_dense_density=small, **mlp)
    if masking.get("name") == "Feathermap":
        # local import: feathermap imports models at module level
        from implicit_image_tpu.feathermap import build_feather_model

        mdef = build_feather_model(
            mdef, mcfg, compress=float(masking.get("density", 1.0))
        )
    return mdef, mcfg
