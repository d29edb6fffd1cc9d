from implicit_image_tpu.training.fit import (
    FitResult,
    TrainConfig,
    OptimConfig,
    fit,
    make_fit_fn,
    make_train_step,
)

__all__ = [
    "FitResult",
    "TrainConfig",
    "OptimConfig",
    "fit",
    "make_fit_fn",
    "make_train_step",
]
