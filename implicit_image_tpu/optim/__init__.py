from implicit_image_tpu.optim.adam import AdamState, adam_init, adam_update, adam_momentum
from implicit_image_tpu.optim.schedules import step_lr
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


def opt_update(grads, opt_state, params, lr, optim_cfg):
    """One optimizer step for OptimConfig.name; returns (params, state)."""
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
    "ShampooState",
    "shampoo_init",
    "shampoo_update",
    "optimizer_registry",
    "opt_init",
    "opt_update",
]
