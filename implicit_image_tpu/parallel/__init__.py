from implicit_image_tpu.parallel.mesh import make_mesh
from implicit_image_tpu.parallel.batched import make_batched_fit_fn, batched_fit
from implicit_image_tpu.parallel.sharded import make_sharded_fit_fn, sharded_render
from implicit_image_tpu.parallel.pipeline import (
    PipelineResult,
    batched_compress,
    sharded_compress,
)
__all__ = [
    "make_mesh",
    "make_batched_fit_fn",
    "batched_fit",
    "make_sharded_fit_fn",
    "sharded_render",
    "PipelineResult",
    "batched_compress",
    "sharded_compress",
    "ladder_fit",
    "ladder_compress",
]


def __getattr__(name):
    # lazy: `python -m implicit_image_tpu.parallel.ladder` imports this
    # package first; an eager ladder import there would double-load the
    # module being run (runpy warning)
    if name in ("ladder_fit", "ladder_compress"):
        from implicit_image_tpu.parallel import ladder

        return getattr(ladder, name)
    raise AttributeError(name)
