from implicit_image_tpu.optim.adam import AdamState, adam_init, adam_update, adam_momentum
from implicit_image_tpu.optim.schedules import cosine_lr, step_lr
from implicit_image_tpu.optim.shampoo import ShampooState, shampoo_init, shampoo_update

optimizer_registry = ["adam", "shampoo"]


def opt_init(params, optim_cfg):
    """Optimizer state for OptimConfig.name — the reference's optim_dict
    dispatch (train_helper.py:72-78)."""
    if optim_cfg.name == "adam":
        return adam_init(params)
    if optim_cfg.name == "shampoo":
        return shampoo_init(params, optim_cfg.epsilon)
    raise KeyError(optim_cfg.name)


def clip_by_global_norm(grads, max_norm):
    """Scale the gradient pytree so its global L2 norm is <= max_norm.

    Opt-in guard rail (OptimConfig.grad_clip > 0) for configs whose raw
    dynamics diverge — e.g. SIREN w=512 at the reference lr 3e-4, which
    collapses ~step 1600 without clipping (BASELINE.md tracked config 2).
    Off by default: the reference recipe (train_helper.py:132-185) never
    clips, and strict parity keeps it that way.
    """
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
    return jax.tree_util.tree_map(lambda g: g * scale, grads)


def opt_update(grads, opt_state, params, lr, optim_cfg):
    """One optimizer step for OptimConfig.name; returns (params, state)."""
    clip = getattr(optim_cfg, "grad_clip", 0.0) or 0.0
    if clip > 0:
        grads = clip_by_global_norm(grads, clip)
    if optim_cfg.name == "adam":
        return adam_update(grads, opt_state, params, lr)
    if optim_cfg.name == "shampoo":
        return shampoo_update(
            grads,
            opt_state,
            params,
            lr,
            momentum=optim_cfg.momentum,
            weight_decay=optim_cfg.weight_decay,
            graft_norm=getattr(optim_cfg, "graft_norm", True),
            update_freq=getattr(optim_cfg, "update_freq", 1),
        )
    raise KeyError(optim_cfg.name)


__all__ = [
    "AdamState",
    "adam_init",
    "adam_update",
    "adam_momentum",
    "step_lr",
    "cosine_lr",
    "ShampooState",
    "shampoo_init",
    "shampoo_update",
    "optimizer_registry",
    "opt_init",
    "opt_update",
    "clip_by_global_norm",
]
