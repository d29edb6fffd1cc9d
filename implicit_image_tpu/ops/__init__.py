from implicit_image_tpu.ops.metrics import mse, psnr, psnr_8bit, eval_metrics

__all__ = ["mse", "psnr", "psnr_8bit", "eval_metrics"]
