from implicit_image_tpu.sparsity.core import (
    MaskState,
    MaskingConfig,
    apply_masks,
    create_mask_state,
    load_lottery_masks,
    mask_grads,
    mask_momentum,
    total_density,
    update_connections,
)
from implicit_image_tpu.sparsity.decay import build_decay

__all__ = [
    "MaskState",
    "MaskingConfig",
    "apply_masks",
    "create_mask_state",
    "load_lottery_masks",
    "mask_grads",
    "mask_momentum",
    "total_density",
    "update_connections",
    "build_decay",
]
