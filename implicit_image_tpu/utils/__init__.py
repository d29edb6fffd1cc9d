from implicit_image_tpu.utils.timer import catchtime
from implicit_image_tpu.utils.catch_error import catch_error_decorator
from implicit_image_tpu.utils.logger import MetricsLogger

__all__ = ["catchtime", "catch_error_decorator", "MetricsLogger"]
