"""Device-mesh helpers.

The reference has NO distributed capability (SURVEY.md §2.8: single
process, single device; its only concurrency is Hydra multirun / SLURM
fan-out of independent jobs). The TPU-native replacement is a
`jax.sharding.Mesh` with two logical axes:

  * "image" — concurrent independent fits (the reference's job-level
    parallelism, now inside ONE compiled program via vmap)
  * "pixel" — sharding one image's coordinate/pixel axis across chips
    (the moral counterpart of sequence parallelism; gradients are
    all-reduced over ICI by XLA)

Axis sizes multiply to the device count; either axis may be 1.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(
    image: int = 1,
    pixel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("image", "pixel") mesh over the first image*pixel devices.

    Using a prefix of the available devices lets callers build small test
    meshes (e.g. a 2x1 mesh on an 8-device virtual CPU host).
    """
    devices = list(devices if devices is not None else jax.devices())
    need = image * pixel
    if need > len(devices):
        raise ValueError(
            f"mesh {image}x{pixel} needs {need} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:need]).reshape(image, pixel)
    return Mesh(arr, axis_names=("image", "pixel"))
