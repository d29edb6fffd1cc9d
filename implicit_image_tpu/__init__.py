"""implicit_image_tpu — TPU-native implicit image compression framework.

A ground-up JAX / XLA / Pallas rebuild of the capabilities of
varun19299/implicit-image-compression (reference at /root/reference):
compress a single image by overfitting a coordinate MLP (SIREN / Fourier /
Wavelet-SIREN), shrink the weights via sparsity (RigL / SNFS / GMP /
Small-Dense / Feathermap), quantize with k-means codebooks, and entropy-code
the state dict (zstd / lzma / huffman / plain), reporting rate (bytes) vs
distortion (PSNR).

Design stance (TPU-first, not a port):
  * functional core — (params, mask, opt_state, key) is an explicit pytree;
    every pipeline stage is a pure transform
  * the whole fit is ONE compiled program: `lax.scan` over steps with mask
    topology updates under `lax.cond` (the reference runs a Python loop,
    reference compress.py:137)
  * scale-out via `jax.sharding.Mesh`: vmap/image-axis for concurrent fits
    (replacing the reference's Hydra-multirun / SLURM sweeps) and pixel-axis
    sharding + psum for large images
  * Pallas kernels for the hot ops (fused sine-MLP), host-side entropy coding
    for bit-exact payloads
"""

__version__ = "0.1.0"

__all__ = [
    "compress_image", "compress_images", "decompress_image",
    "CompressedImage",
]


def __getattr__(name):
    # lazy: importing the package must stay cheap (the CLIs import it
    # before argument parsing); the api pulls in jax + the orchestrator
    if name in __all__:
        from implicit_image_tpu import api

        return getattr(api, name)
    raise AttributeError(name)
