from implicit_image_tpu.utils.timer import catchtime
from implicit_image_tpu.utils.catch_error import catch_error_decorator
from implicit_image_tpu.utils.logger import MetricsLogger
from implicit_image_tpu.utils.profiling import annotate, cost_analysis, trace, wall

__all__ = [
    "catchtime",
    "catch_error_decorator",
    "MetricsLogger",
    "annotate",
    "cost_analysis",
    "trace",
    "wall",
]
