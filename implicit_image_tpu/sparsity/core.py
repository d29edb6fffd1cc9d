"""Sparsity core — functional masking over a params pytree.

Capability parity with reference `masking/core.py` (the `Masking` class),
re-designed as pure jittable transforms so the entire sparse fit compiles
into ONE XLA program:

  * masks are dense 0/1 float32 arrays (static shapes encode the dynamic
    topology; the MXU multiplies through zeros at full speed)
  * `apply_masks`            ~ core.py:271-288 (weights *= mask)
  * `mask_momentum`          ~ core.py:630-651 (Adam exp_avg/exp_avg_sq *= mask)
  * `update_connections`     ~ core.py:713-801 (gather stats -> adjust prune
    rate -> prune -> redistribute -> grow -> apply -> smoothing adjustment),
    with `lax.while_loop` for the redistribution residual solver
    (core.py:299-360) and rank-based top-k for prune/grow
  * `MaskState` carries baseline_nonzero / adjusted_growth / running
    adjustment mean (core.py:221-226, 776-783) as traced scalars

Biases are never masked (core.py:240-244 removes them); only layer dicts
with a "w" entry participate. Layers may be excluded entirely (mask=None),
e.g. the first layer under `random` init or the Fourier encoding matrix.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from implicit_image_tpu.sparsity import grow as grow_mod
from implicit_image_tpu.sparsity import prune as prune_mod
from implicit_image_tpu.sparsity import redistribute as redist_mod
from implicit_image_tpu.sparsity.decay import build_decay
from implicit_image_tpu.sparsity.init_scheme import init_masks

__all__ = [
    "MaskingConfig",
    "MaskState",
    "create_mask_state",
    "load_lottery_masks",
    "apply_masks",
    "mask_grads",
    "mask_momentum",
    "update_connections",
    "total_density",
]


@dataclass(frozen=True)
class MaskingConfig:
    """Static masking config; field names mirror conf/masking/*.yaml."""

    name: str = "RigL"
    density: float = 0.5
    sparse_init: str = "erdos-renyi-kernel"
    dense_gradients: bool = True
    prune_mode: str = "magnitude"
    growth_mode: str = "absolute-gradient"
    redistribution_mode: str = "none"
    decay_schedule: str = "cosine"
    prune_rate: float = 0.1
    final_density: float = 0.5
    start_when: int = 5
    end_when: int = 1500
    interval: int = 20
    dense: bool = False
    print_FLOPs: bool = False
    # lottery-ticket / resume source: an .npz from a prior run — either
    # mask.npz (layers.{i}.mask, written by compress.py for sparse runs)
    # or model.npz weights (masks derived from nonzero entries). Consumed
    # when sparse_init is lottery-ticket[-dist] or resume (reference
    # init_scheme.py:161-232, reachable there via conf masking presets).
    mask_path: Optional[str] = None

    def __post_init__(self):
        assert self.prune_mode in prune_mod.registry_names, (
            f"Available prune modes: {prune_mod.registry_names}"
        )
        assert self.growth_mode in grow_mod.registry_names, (
            f"Available growth modes: {grow_mod.registry_names}"
        )
        assert self.redistribution_mode in redist_mod.registry_names, (
            f"Available redistribute modes: {redist_mod.registry_names}"
        )

    @property
    def global_prune(self) -> bool:
        return "global" in self.prune_mode


class MaskState(NamedTuple):
    """Traced mask state carried through the fit scan."""

    masks: Tuple[Optional[jnp.ndarray], ...]  # aligned with params layers
    baseline_nonzero: jnp.ndarray  # f32 scalar
    total_params: jnp.ndarray  # f32 scalar (masked layers only)
    adjusted_growth: jnp.ndarray  # f32 scalar
    adj_sum: jnp.ndarray  # running sum of adjustments
    adj_count: jnp.ndarray  # running count of adjustments
    # 1 - final_density as a TRACED scalar: pure config, carried here so
    # the Zhu-Gupta (GMP) schedule reads it from the carry — which lets a
    # final-density ladder share ONE compiled program (parallel/ladder.py)
    final_sparsity: jnp.ndarray = jnp.nan


def _masked_indices(params) -> List[int]:
    return [i for i, layer in enumerate(params) if "w" in layer]


def load_lottery_masks(path: str) -> List:
    """Host-side read of a prior run's mask/weight npz -> per-layer masks.

    Accepts mask.npz (`layers.{i}.mask`) or model.npz (`layers.{i}.w`);
    either way the mask is the nonzero pattern, so lottery-ticket and
    resume init share one loader (reference init_scheme.py:161-232: the
    lottery path reads ckpt["mask"], resume reads the weights). Returned
    in layer-index order for create_mask_state's masked-weight slots.
    """
    import numpy as np

    data = np.load(path)
    by_idx = {}
    for name in data.files:
        parts = name.split(".")
        if len(parts) != 3 or parts[0] != "layers":
            continue
        i, key = int(parts[1]), parts[2]
        if key in ("mask", "w", "weight"):
            by_idx[i] = data[name]
    if not by_idx:
        raise ValueError(f"{path} has no layers.*.mask or layers.*.w arrays")
    return [
        jnp.asarray(by_idx[i] != 0, jnp.float32) for i in sorted(by_idx)
    ]


def create_mask_state(
    key: jax.Array, params, cfg: MaskingConfig, lottery_masks=None
) -> MaskState:
    """Initialize masks for all weight ("w") tensors per cfg.sparse_init."""
    widx = _masked_indices(params)
    shapes = [params[i]["w"].shape for i in widx]
    weights = [params[i]["w"] for i in widx]
    mask_list = init_masks(
        key,
        shapes,
        cfg.density,
        scheme=cfg.sparse_init,
        weights=weights,
        lottery_masks=lottery_masks,
    )
    masks: List[Optional[jnp.ndarray]] = [None] * len(params)
    for i, m in zip(widx, mask_list):
        masks[i] = m
    live = [m for m in masks if m is not None]
    baseline = sum(jnp.sum(m) for m in live)
    total = sum(jnp.asarray(float(m.size)) for m in live)
    zero = jnp.zeros((), jnp.float32)
    return MaskState(
        masks=tuple(masks),
        baseline_nonzero=baseline,
        total_params=total,
        adjusted_growth=zero,
        adj_sum=zero,
        adj_count=zero,
        final_sparsity=jnp.asarray(1.0 - cfg.final_density, jnp.float32),
    )


def apply_masks(params, masks):
    """weights *= mask for every masked layer (core.py:271-288)."""
    out = []
    for layer, m in zip(params, masks):
        if m is None:
            out.append(layer)
        else:
            out.append({**layer, "w": layer["w"] * m})
    return tuple(out)


def mask_grads(grads, masks):
    """grad *= mask (core.py:281-288), used when dense_gradients=False."""
    return apply_masks(grads, masks)


def mask_momentum(opt_state, masks):
    """Mask the optimizer's momentum buffers (core.py:630-651): Adam's
    exp_avg/exp_avg_sq, or Shampoo's SGD-style momentum buffer."""
    if hasattr(opt_state, "mu"):  # AdamState
        mu = apply_masks(opt_state.mu, masks)
        nu = apply_masks(opt_state.nu, masks)
        return opt_state._replace(mu=mu, nu=nu)
    if hasattr(opt_state, "momentum_buf"):  # ShampooState
        return opt_state._replace(
            momentum_buf=apply_masks(opt_state.momentum_buf, masks)
        )
    raise TypeError(f"unknown optimizer state {type(opt_state).__name__}")


def total_density(state: MaskState) -> jnp.ndarray:
    live = [m for m in state.masks if m is not None]
    nonzero = sum(jnp.sum(m) for m in live)
    return nonzero / state.total_params


def _calc_redistributed(
    variance: jnp.ndarray,
    zeros: jnp.ndarray,
    removed: jnp.ndarray,
    total_removed: jnp.ndarray,
    adjusted_growth: jnp.ndarray,
) -> jnp.ndarray:
    """Residual-redistribution solver (core.py:299-360), vectorized over the
    (L,) layer axis with a lax.while_loop for the residual iterations."""
    n_layers = variance.shape[0]
    max_regrowth = zeros + removed
    cap = 0.99 * max_regrowth
    init_prop = jnp.round(variance * (total_removed + adjusted_growth))

    def cond(carry):
        _, _, _, residual, prev_residual, i = carry
        # stop on convergence OR no progress (all layers capped: the same
        # residual would recirculate forever — the reference's Python loop
        # has the same fixed point, reached when demand exceeds capacity)
        return (residual > 0) & (residual < prev_residual) & (i < 1000)

    def body(carry):
        regrowth, has, mean_res, residual, _, i = carry
        prop = jnp.where(has, regrowth, init_prop) + mean_res
        over = prop > cap
        new_regrowth = jnp.where(over, cap, prop)
        new_residual = jnp.sum(jnp.where(over, prop - cap, 0.0))
        return (
            new_regrowth,
            jnp.ones_like(has),
            new_residual / n_layers,
            new_residual,
            residual,
            i + 1,
        )

    carry0 = (
        jnp.zeros_like(variance),
        jnp.zeros((n_layers,), bool),
        jnp.zeros((), jnp.float32),
        jnp.full((), 9999.0, jnp.float32),
        jnp.full((), jnp.inf, jnp.float32),
        jnp.zeros((), jnp.int32),
    )
    regrowth, *_ = jax.lax.while_loop(cond, body, carry0)
    return regrowth


def _layer_prune(cfg: MaskingConfig, mask, weight, rate, nonzeros):
    if cfg.prune_mode == "magnitude":
        return prune_mod.magnitude_prune(mask, weight, rate, nonzeros)
    if cfg.prune_mode == "struct-magnitude-mean":
        return prune_mod.struct_magnitude_prune(mask, weight, rate, nonzeros, "mean")
    if cfg.prune_mode == "struct-magnitude-max":
        return prune_mod.struct_magnitude_prune(mask, weight, rate, nonzeros, "max")
    raise KeyError(cfg.prune_mode)


def _layer_grow(cfg: MaskingConfig, mask, weight, grad, momentum, num_growth, key):
    gm = cfg.growth_mode
    if gm == "absolute-gradient":
        return grow_mod.abs_grad_growth(mask, weight, grad, num_growth)
    if gm == "momentum":
        return grow_mod.momentum_growth(mask, weight, momentum, num_growth)
    if gm == "random":
        return grow_mod.random_growth(mask, weight, grad, num_growth, key)
    if gm == "none":
        return grow_mod.no_growth(mask, weight, grad, num_growth)
    if gm == "struct-absolute-gradient-mean":
        return grow_mod.struct_abs_grad_growth(
            mask, weight, grad, num_growth, criterion="mean"
        )
    if gm == "struct-absolute-gradient-min":
        return grow_mod.struct_abs_grad_growth(
            mask, weight, grad, num_growth, criterion="min"
        )
    raise KeyError(gm)


def _redistribution_stat(cfg: MaskingConfig, mask, weight, grad, momentum):
    rm = cfg.redistribution_mode
    if rm == "momentum":
        return redist_mod.momentum_redistribution(mask, weight, grad, momentum)
    if rm == "grad":
        return redist_mod.grad_redistribution(mask, weight, grad, momentum)
    return redist_mod.nonzero_redistribution(mask, weight, grad, momentum)


def update_connections(
    params,
    grads,
    momenta,
    state: MaskState,
    prune_rate: jnp.ndarray,
    key: jax.Array,
    cfg: MaskingConfig,
):
    """One mask topology update == reference truncate_weights (core.py:713-791).

    Args:
      params / grads: current (masked) params and their dense gradients.
      momenta: per-layer optimizer momentum statistic aligned with params
        (entries may be None when unused by the growth/redistribution modes).
      prune_rate: decayed prune rate for this step.
    Returns (new_params, new_state).
    """
    widx = [i for i, m in enumerate(state.masks) if m is not None]
    n_layers = len(widx)
    masks = list(state.masks)

    # --- gather_statistics (core.py:425-464) ---
    stats = []
    nonzeros = []
    zeros = []
    for i in widx:
        m = masks[i]
        w = params[i]["w"]
        g = grads[i]["w"]
        mom = momenta[i] if momenta[i] is not None else jnp.zeros_like(w)
        stats.append(_redistribution_stat(cfg, m, w, g, mom))
        nz = jnp.sum(m > 0).astype(jnp.float32)
        nonzeros.append(nz)
        zeros.append(float(m.size) - nz)
    variance = jnp.nan_to_num(jnp.stack(stats))
    nonzeros = jnp.stack(nonzeros)
    zeros = jnp.stack(zeros)
    total_variance = jnp.sum(variance)
    variance = variance / jnp.maximum(total_variance, 1e-30)
    total_nonzero = jnp.sum(nonzeros)

    # --- adjust_prune_rate (core.py:250-269) ---
    numels = jnp.asarray([float(masks[i].size) for i in widx])
    sparsity = zeros / numels
    expected_variance = 1.0 / n_layers
    expected_vs_actual = expected_variance / jnp.maximum(variance, 1e-30)
    layer_rates = jnp.where(
        (sparsity < 0.2) & (expected_vs_actual < 1.0),
        jnp.minimum(sparsity, prune_rate),
        prune_rate,
    )

    # --- prune (core.py:719-737) ---
    new_params = [dict(layer) for layer in params]
    if cfg.global_prune:
        pruned, total_removed = prune_mod.global_magnitude_prune(
            [masks[i] for i in widx],
            [params[i]["w"] for i in widx],
            prune_rate,
            state.baseline_nonzero,
        )
        for j, i in enumerate(widx):
            masks[i] = pruned[j]
        removed = nonzeros - jnp.stack([jnp.sum(masks[i]) for i in widx])
    else:
        removed_list = []
        for j, i in enumerate(widx):
            new_mask = _layer_prune(
                cfg, masks[i], params[i]["w"], layer_rates[j], nonzeros[j]
            )
            removed_list.append(nonzeros[j] - jnp.sum(new_mask))
            masks[i] = new_mask
        removed = jnp.stack(removed_list)
        total_removed = jnp.sum(removed)

    # --- grow (core.py:739-763) ---
    if cfg.growth_mode == "none":
        total_nonzero_new = total_nonzero - total_removed
    else:
        if cfg.redistribution_mode not in ("nonzero", "none"):
            regrowth = _calc_redistributed(
                variance, zeros, removed, total_removed, state.adjusted_growth
            )
        else:
            regrowth = removed
        nonzero_new = []
        for j, i in enumerate(widx):
            key, gkey = jax.random.split(key)
            mom = momenta[i] if momenta[i] is not None else jnp.zeros_like(params[i]["w"])
            new_mask, new_w = _layer_grow(
                cfg,
                masks[i],
                new_params[i]["w"],
                grads[i]["w"],
                mom,
                jnp.floor(regrowth[j]),
                gkey,
            )
            masks[i] = new_mask
            new_params[i]["w"] = new_w
            nonzero_new.append(jnp.sum(new_mask))
        total_nonzero_new = sum(nonzero_new)

    # --- apply + smoothing adjustment (core.py:765-783) ---
    new_params = apply_masks(tuple(new_params), masks)
    adjustment = state.baseline_nonzero - total_nonzero_new
    adj_sum = state.adj_sum + adjustment
    adj_count = state.adj_count + 1.0
    adjusted_growth = (
        0.25 * state.adjusted_growth + 0.75 * adjustment + adj_sum / adj_count
    )

    new_state = state._replace(
        masks=tuple(masks),
        adjusted_growth=adjusted_growth,
        adj_sum=adj_sum,
        adj_count=adj_count,
    )
    return new_params, new_state
