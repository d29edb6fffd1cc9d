"""Feathermap — structured multi-hashing compression (Zhu et al.).

Capability parity with reference `pipeline/feathermap/feathernet.py`
(FeatherNet :134-385, LoadLayer :17-117, utils.get_block_rows :7-42):
every weight AND bias of the base model is replaced by a slice of the
rank-m product V = V1 @ V2 scaled by a per-tensor trainable scalar:

  * n = ceil(sqrt(total weight+bias elements)), m = ceil(compress*n/2)
    (feathernet.py:168-171)
  * V1, V2 ~ U(±bound), bound = sqrt(12)/2 * m^(-1/4)   (:285-292)
  * per-tensor scaler init: the SIREN layer's init bound when the layer
    provides one (siren.py:54 sets it on the Linear, so the bias shares
    the weight's bound), else 1/sqrt(fan_in)            (:224-240)
  * frozen non-(w,b) leaves (e.g. Fourier's encoding B) pass through
    unhashed, exactly like the reference (B is a buffer, not a weight)

TPU-native design: instead of the reference's hook machinery (params
un-registered, V re-mapped into layers by forward-pre hooks, deploy-mode
lazy block-row products), the feathermapped model is a pure function:
`materialize` computes V in ONE (n×m)@(m×n) MXU matmul and slices every
tensor out of it — for typical INR sizes (n ≈ √200k ≈ 450) this is
microseconds, so the lazy LoadLayer path is pointless on TPU; a block-row
`materialize_tensor` is still provided for parity with deploy mode.

The wrapper composes with the fit loop through the ModelDef interface:
feather params are themselves a (V1, V2, scalers) layer-dict tuple, so the
functional Adam/Shampoo update them like any other model.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from implicit_image_tpu.models import ModelDef

__all__ = [
    "FeatherSpec",
    "build_feather_model",
    "feather_init",
    "materialize",
    "materialize_tensor",
]


@dataclass(frozen=True)
class FeatherSpec:
    """Static layout: how base-model tensors tile into flat V."""

    entries: Tuple[Tuple[int, str, Tuple[int, ...], int], ...]  # (layer, key, shape, offset)
    size_n: int
    size_m: int
    compress: float

    @property
    def total(self) -> int:
        last = self.entries[-1]
        return last[3] + int(math.prod(last[2]))


def _plan(base_params, compress: float) -> FeatherSpec:
    entries = []
    offset = 0
    for i, layer in enumerate(base_params):
        for key in ("w", "b"):
            if key in layer:
                shape = tuple(layer[key].shape)
                entries.append((i, key, shape, offset))
                offset += int(math.prod(shape))
    n = math.ceil(math.sqrt(offset))
    m = max(1, math.ceil(compress * n / 2))
    return FeatherSpec(entries=tuple(entries), size_n=n, size_m=m, compress=compress)


def _scaler_init(mcfg, layer: int, key: str, shape) -> float:
    """Reference scaler semantics (feathernet.py:224-240 + siren.py:54)."""
    if hasattr(mcfg, "weight_bound"):
        try:
            return float(mcfg.weight_bound(layer))
        except Exception:
            pass
    # torch fan_in of a Linear weight (out, in) is in_features; our layout is
    # (fan_in, fan_out) so fan_in = shape[0]. Biases use the weight's fan_in.
    fan_in = shape[0]
    return 1.0 / math.sqrt(fan_in)


def feather_init(key: jax.Array, base_params, mcfg, compress: float):
    """Build (feather_params, spec, frozen_extras).

    feather_params = ({"w": V1}, {"w": V2}, {"b": scalers}) — a layer-dict
    tuple the functional optimizers already understand. frozen_extras maps
    layer index -> dict of pass-through leaves (e.g. Fourier's B).
    """
    spec = _plan(base_params, compress)
    bound = math.sqrt(12.0) / 2.0 * spec.size_m ** (-0.25)
    k1, k2 = jax.random.split(key)
    v1 = jax.random.uniform(
        k1, (spec.size_n, spec.size_m), jnp.float32, minval=-bound, maxval=bound
    )
    v2 = jax.random.uniform(
        k2, (spec.size_m, spec.size_n), jnp.float32, minval=-bound, maxval=bound
    )
    # scaler per (layer, key) entry; biases inherit the weight's fan_in,
    # matching torch's _calculate_correct_fan on the owning Linear.
    scalers = []
    for layer, key_, shape, _ in spec.entries:
        wshape = next(
            s for l, k, s, _ in spec.entries if l == layer and k == "w"
        )
        scalers.append(_scaler_init(mcfg, layer, key_, wshape))
    fparams = (
        {"w": v1},
        {"w": v2},
        {"b": jnp.asarray(scalers, jnp.float32)},
    )
    frozen = {
        i: {k: v for k, v in layer.items() if k not in ("w", "b")}
        for i, layer in enumerate(base_params)
        if any(k not in ("w", "b") for k in layer)
    }
    return fparams, spec, frozen


def materialize(fparams, spec: FeatherSpec, frozen=None, n_layers: int = None):
    """feather params -> base-model params (pure; one MXU matmul)."""
    v1, v2, scalers = fparams[0]["w"], fparams[1]["w"], fparams[2]["b"]
    flat = (v1 @ v2).reshape(-1)
    n_layers = n_layers or (max(e[0] for e in spec.entries) + 1)
    layers: list = [dict() for _ in range(n_layers)]
    if frozen:
        for i, extras in frozen.items():
            layers[i].update(extras)
    for idx, (layer, key, shape, offset) in enumerate(spec.entries):
        size = int(math.prod(shape))
        layers[layer][key] = scalers[idx] * jax.lax.dynamic_slice_in_dim(
            flat, offset, size
        ).reshape(shape)
    return tuple(layers)


def materialize_tensor(fparams, spec: FeatherSpec, entry_index: int):
    """Deploy-mode equivalent: compute ONE tensor's slice via the block-row
    decomposition of V1@V2 (reference LoadLayer/get_block_rows,
    feathernet.py:17-117, utils.py:7-42) — only the V1 rows covering the
    slice participate in the matmul."""
    layer, key, shape, offset = spec.entries[entry_index]
    size = int(math.prod(shape))
    n = spec.size_n
    row0 = offset // n
    row1 = (offset + size - 1) // n + 1
    v1, v2, scalers = fparams[0]["w"], fparams[1]["w"], fparams[2]["b"]
    block = (v1[row0:row1] @ v2).reshape(-1)
    local = offset - row0 * n
    return scalers[entry_index] * jax.lax.dynamic_slice_in_dim(
        block, local, size
    ).reshape(shape)


def build_feather_model(
    mdef: ModelDef, mcfg, compress: float, template_key=None
) -> ModelDef:
    """Wrap a ModelDef so its params are feather-hashed.

    The wrapped init returns the (V1, V2, scalers) tuple; apply/apply_flat
    materialize the base params then delegate. Mirrors the orchestrator's
    `FeatherNet(model, compress=cfg.masking.density)` wrap (compress.py:80-81).
    """
    template_key = (
        template_key if template_key is not None else jax.random.PRNGKey(0)
    )
    base_template = mdef.init(template_key, mcfg)
    spec = _plan(base_template, compress)
    n_layers = len(base_template)
    frozen_template = {
        i: {k: v for k, v in layer.items() if k not in ("w", "b")}
        for i, layer in enumerate(base_template)
        if any(k not in ("w", "b") for k in layer)
    }

    def init(key, cfg):
        base = mdef.init(key, cfg)
        fparams, _, frozen = feather_init(key, base, cfg, compress)
        # carry frozen leaves inside the feather params (layer 2 extras)
        if frozen:
            extras = {f"frozen_{i}_{k}": v for i, d in frozen.items() for k, v in d.items()}
            return (fparams[0], fparams[1], {**fparams[2], **extras})
        return fparams

    def _split(params):
        frozen = {}
        scal_layer = {}
        for k, v in params[2].items():
            if k.startswith("frozen_"):
                _, i, key = k.split("_", 2)
                frozen.setdefault(int(i), {})[key] = v
            else:
                scal_layer[k] = v
        return (params[0], params[1], scal_layer), frozen

    def apply_flat(params, coords, cfg, compute_dtype=None):
        fparams, frozen = _split(params)
        base = materialize(fparams, spec, frozen, n_layers)
        return mdef.apply_flat(base, coords, cfg, compute_dtype)

    def apply(params, grid, cfg, compute_dtype=None):
        fparams, frozen = _split(params)
        base = materialize(fparams, spec, frozen, n_layers)
        return mdef.apply(base, grid, cfg, compute_dtype)

    return ModelDef(
        name=f"feather_{mdef.name}",
        config_cls=mdef.config_cls,
        init=init,
        apply=apply,
        apply_flat=apply_flat,
        # the wrapper delegates to the base apply after materializing, so a
        # separable base (CoordX) keeps its factorized grid fast path
        separable=mdef.separable,
    )
