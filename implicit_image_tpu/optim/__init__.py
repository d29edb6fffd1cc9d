from implicit_image_tpu.optim.adam import AdamState, adam_init, adam_update, adam_momentum
from implicit_image_tpu.optim.schedules import step_lr
from implicit_image_tpu.optim.shampoo import ShampooState, shampoo_init, shampoo_update

optimizer_registry = ["adam", "shampoo"]

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
]
