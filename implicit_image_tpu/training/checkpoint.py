"""Checkpoint / resume — full training-state snapshots.

The reference only saves final weights (compress.py:243-247) and has a
mask state_dict it never uses for mid-run resume (SURVEY.md §5). Here a
checkpoint captures the COMPLETE functional state — (params, opt_state,
mask masks + scalars, PRNG key, step) — as a flat .npz, so a fit can stop
and continue bit-exactly (the carry of the scan IS the training state).

npz (not orbax) keeps checkpoints dependency-free and hand-inspectable;
the arrays are tiny (an INR is the compressed artifact itself).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

import jax.numpy as jnp

from implicit_image_tpu.optim.adam import AdamState
from implicit_image_tpu.sparsity import MaskState

__all__ = ["save_checkpoint", "load_checkpoint"]


def _flat_layers(prefix: str, layers, out: Dict[str, np.ndarray]):
    for i, layer in enumerate(layers):
        if layer is None:
            continue
        if isinstance(layer, dict):
            for k, v in layer.items():
                out[f"{prefix}.{i}.{k}"] = np.asarray(v)
        else:
            out[f"{prefix}.{i}"] = np.asarray(layer)


def _unflat_layers(prefix: str, data, n: int, none_ok: bool = False):
    layers = []
    for i in range(n):
        keys = [k for k in data if k.startswith(f"{prefix}.{i}.")]
        if keys:
            layers.append(
                {k.rsplit(".", 1)[1]: jnp.asarray(data[k]) for k in keys}
            )
        elif f"{prefix}.{i}" in data:
            layers.append(jnp.asarray(data[f"{prefix}.{i}"]))
        else:
            layers.append(None if none_ok else {})
    return tuple(layers)


def save_checkpoint(
    path,
    params,
    opt_state: Optional[AdamState] = None,
    mask_state: Optional[MaskState] = None,
    key=None,
    step: int = 0,
    ekfac_state=None,
) -> None:
    out: Dict[str, np.ndarray] = {"meta.step": np.asarray(step),
                                  "meta.n_layers": np.asarray(len(params))}
    _flat_layers("params", params, out)
    if key is not None:
        out["meta.key"] = np.asarray(key)
    if opt_state is not None:
        _flat_layers("mu", opt_state.mu, out)
        _flat_layers("nu", opt_state.nu, out)
        out["meta.count"] = np.asarray(opt_state.count)
    if ekfac_state is not None and len(ekfac_state) and len(ekfac_state[0]):
        # EKFAC preconditioner state (optim/ekfac.py EkfacState): per
        # weighted layer KFE eigvecs + second moments; fewer entries than
        # n_layers when some layers are bias-only, so record its own count
        out["meta.ekfac_layers"] = np.asarray(len(ekfac_state.ua))
        _flat_layers("ekfac_ua", ekfac_state.ua, out)
        _flat_layers("ekfac_ug", ekfac_state.ug, out)
        _flat_layers("ekfac_m2", ekfac_state.m2, out)
    if mask_state is not None:
        _flat_layers("mask", mask_state.masks, out)
        out["mask.baseline_nonzero"] = np.asarray(mask_state.baseline_nonzero)
        out["mask.total_params"] = np.asarray(mask_state.total_params)
        out["mask.adjusted_growth"] = np.asarray(mask_state.adjusted_growth)
        out["mask.adj_sum"] = np.asarray(mask_state.adj_sum)
        out["mask.adj_count"] = np.asarray(mask_state.adj_count)
        out["mask.final_sparsity"] = np.asarray(mask_state.final_sparsity)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # atomic replace: a crash mid-write must not destroy the previous good
    # checkpoint (kill-and-resume is the feature's whole point)
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(suffix=".npz", dir=str(path.parent))
    os.close(fd)
    try:
        np.savez(tmp, **out)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path) -> Dict[str, Any]:
    data = dict(np.load(path, allow_pickle=False))
    n = int(data["meta.n_layers"])
    out: Dict[str, Any] = {
        "step": int(data["meta.step"]),
        "params": _unflat_layers("params", data, n),
        "key": jnp.asarray(data["meta.key"]) if "meta.key" in data else None,
    }
    if "meta.count" in data:
        out["opt_state"] = AdamState(
            mu=_unflat_layers("mu", data, n),
            nu=_unflat_layers("nu", data, n),
            count=jnp.asarray(data["meta.count"]),
        )
    if "meta.ekfac_layers" in data:
        from implicit_image_tpu.optim.ekfac import EkfacState

        ne = int(data["meta.ekfac_layers"])
        out["ekfac_state"] = EkfacState(
            ua=_unflat_layers("ekfac_ua", data, ne),
            ug=_unflat_layers("ekfac_ug", data, ne),
            m2=_unflat_layers("ekfac_m2", data, ne),
        )
    if "mask.total_params" in data:
        out["mask_state"] = MaskState(
            masks=_unflat_layers("mask", data, n, none_ok=True),
            baseline_nonzero=jnp.asarray(data["mask.baseline_nonzero"]),
            total_params=jnp.asarray(data["mask.total_params"]),
            adjusted_growth=jnp.asarray(data["mask.adjusted_growth"]),
            adj_sum=jnp.asarray(data["mask.adj_sum"]),
            adj_count=jnp.asarray(data["mask.adj_count"]),
            # pre-field checkpoints: NaN sentinel; the resume path re-seeds
            # it from the masking config (training/fit.py), which is the
            # source of truth — the value is pure config, not learned state
            final_sparsity=jnp.asarray(
                data.get("mask.final_sparsity", np.float32(np.nan))
            ),
        )
    return out
