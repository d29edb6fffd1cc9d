"""Sparsity initialization schemes.

Capability parity with reference `masking/funcs/init_scheme.py`:
  * erdos-renyi / erdos-renyi-kernel — the ERK epsilon solver allocating
    per-layer density ∝ (Σdims / Πdims), with dense-layer overflow handling
    (init_scheme.py:40-144). The solver runs host-side on static shapes
    (pure shape math, executed once at setup).
  * random — per-layer Bernoulli(density), first masked layer kept dense
    (init_scheme.py:193-199 removes the first layer from masking).
  * resume — mask reconstructed from nonzero weights (init_scheme.py:215-232).
  * lottery-ticket[-dist] — load (optionally shuffle) a saved mask
    (init_scheme.py:161-185); stored as .npz here instead of torch .pth.
  * struct-* — channel-structured variants for 4D kernels (not applicable to
    the MLP model zoo; provided for 4D params).

Masks are dense 0/1 float32 arrays matching each weight's shape — the
TPU-native encoding of dynamic topology under static shapes.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["erdos_renyi_probs", "init_masks", "registry_names"]

registry_names = (
    "erdos-renyi",
    "erdos-renyi-kernel",
    "lottery-ticket",
    "lottery-ticket-dist",
    "random",
    "resume",
    "struct-erdos-renyi",
    "struct-erdos-renyi-kernel",
    "struct-random",
)


def erdos_renyi_probs(
    shapes: Sequence[Tuple[int, ...]], density: float, is_kernel: bool = True
) -> List[float]:
    """ERK epsilon solver -> per-layer keep probability.

    Faithful to init_scheme.py:40-144: iterate, marking any layer whose raw
    probability * epsilon would exceed 1 as dense, until epsilon is valid.
    """
    n = len(shapes)
    dense_layers: set = set()
    erk_power_scale = 1.0
    raw_probabilities: Dict[int, float] = {}
    while True:
        divisor = 0.0
        rhs = 0.0
        raw_probabilities = {}
        for i, shape in enumerate(shapes):
            n_param = int(np.prod(shape))
            n_zeros = int(n_param * (1.0 - density))
            n_ones = int(n_param * density)
            if i in dense_layers:
                rhs -= n_zeros
            else:
                rhs += n_ones
                if is_kernel:
                    raw_probabilities[i] = (
                        np.sum(shape) / np.prod(shape)
                    ) ** erk_power_scale
                else:
                    n_in, n_out = shape[:2]
                    raw_probabilities[i] = (n_in + n_out) / (n_in * n_out)
                divisor += raw_probabilities[i] * n_param
        epsilon = rhs / divisor
        max_prob = max(raw_probabilities.values())
        if max_prob * epsilon > 1.0:
            for i, p in raw_probabilities.items():
                if p == max_prob:
                    dense_layers.add(i)
        else:
            break

    probs = []
    for i in range(n):
        probs.append(1.0 if i in dense_layers else float(epsilon * raw_probabilities[i]))
    return probs


def _bernoulli_mask(key, shape, prob, dtype=jnp.float32):
    return (jax.random.uniform(key, shape) < prob).astype(dtype)


def init_masks(
    key: jax.Array,
    weight_shapes: Sequence[Tuple[int, ...]],
    density: float,
    scheme: str = "erdos-renyi-kernel",
    weights: Optional[Sequence[jnp.ndarray]] = None,
    lottery_masks: Optional[Sequence[np.ndarray]] = None,
) -> List[Optional[jnp.ndarray]]:
    """Build the initial per-layer 0/1 masks for the masked weight tensors.

    Returns a list aligned with `weight_shapes`; an entry of None means the
    layer is excluded from masking entirely (kept dense and untouched), the
    functional equivalent of the reference's `remove_weight`.
    """
    if scheme not in registry_names:
        raise KeyError(f"Sparse init {scheme!r} not found. Available {registry_names}")

    n = len(weight_shapes)
    keys = jax.random.split(key, n)

    if scheme in ("erdos-renyi", "erdos-renyi-kernel"):
        probs = erdos_renyi_probs(
            weight_shapes, density, is_kernel=(scheme == "erdos-renyi-kernel")
        )
        return [
            _bernoulli_mask(keys[i], weight_shapes[i], probs[i]) for i in range(n)
        ]

    if scheme == "random":
        # First masked layer is removed from masking (kept dense),
        # reference init_scheme.py:193-199.
        out: List[Optional[jnp.ndarray]] = [None]
        out += [
            _bernoulli_mask(keys[i], weight_shapes[i], density) for i in range(1, n)
        ]
        return out

    if scheme == "resume":
        src = lottery_masks if lottery_masks is not None else weights
        assert src is not None, "resume init needs weights (live or from npz)"
        return [(jnp.asarray(w) != 0.0).astype(jnp.float32) for w in src]

    if scheme in ("lottery-ticket", "lottery-ticket-dist"):
        assert lottery_masks is not None, "lottery init needs a saved mask"
        out = []
        for i, m in enumerate(lottery_masks):
            m = jnp.asarray(m, jnp.float32)
            if scheme == "lottery-ticket-dist":
                # preserve layer density, randomize positions
                flat = jax.random.permutation(keys[i], m.reshape(-1))
                m = flat.reshape(m.shape)
            out.append(m)
        return out

    if scheme in ("struct-erdos-renyi", "struct-erdos-renyi-kernel", "struct-random"):
        # Channel-structured masks for 4D kernels; dense (None) for 2D layers
        # (reference removes fully-connected layers, init_scheme.py:15-37).
        out = []
        four_d = [i for i, s in enumerate(weight_shapes) if len(s) == 4]
        if not four_d:
            raise ValueError(
                "struct-* sparsity init requires 4D conv kernels; "
                "the MLP model zoo has none"
            )
        if scheme == "struct-random":
            probs4 = {i: density for i in four_d}
        else:
            probs_list = erdos_renyi_probs(
                [weight_shapes[i] for i in four_d],
                density,
                is_kernel=scheme.endswith("kernel"),
            )
            probs4 = dict(zip(four_d, probs_list))
        for i, s in enumerate(weight_shapes):
            if i not in probs4:
                out.append(None)
                continue
            c_in, c_out, h, w = s
            a = _bernoulli_mask(keys[i], (c_in, c_out, 1, 1), probs4[i])
            out.append(jnp.broadcast_to(a, s).astype(jnp.float32))
        return out

    raise AssertionError("unreachable")
