"""Base-layer codebook finetune for the progressive container.

The format-4 base layer (coding/progressive.py) reconstructs each split
tensor from a 16-entry run-mean codebook — optimal in WEIGHT space, but
the preview a client decodes is an IMAGE: what matters is output
distortion. This module re-optimizes only those 16-entry codebooks
against the rendered image with the hi labels frozen (Adam on ~16 scalars
per tensor, one compiled scan) — the same insight that made the main
pipeline's codebook finetune worth +7–10 dB (quant/kmeans.py).

Full-stream fidelity is untouched by construction: the refinement layer
never reads base_centroids.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from implicit_image_tpu.ops.metrics import mse

__all__ = ["finetune_base_codebooks"]


def finetune_base_codebooks(
    mdef,
    mcfg,
    grid,
    img,
    base_entries,
    steps: int = 100,
    lr: float = 1e-3,
    delta_layers=(),
    delta_offsets=None,
) -> Dict[str, np.ndarray]:
    """base_entries (the format-4 base section, name->array) ->
    {"layers.{i}.base_centroids": finetuned array} in the stored dtype.

    Frozen: hi labels, every unsplit tensor (fp weights/biases/extras,
    uint16-label VQ, per-channel QAT codes). Trainable: the run-mean
    codebooks only.

    `delta_layers`/`delta_offsets` (progressive delta streams): the listed
    layers' base books are RESIDUAL books, so the render materializes
    w = (book[hi] + offset) * (hi != 0) — the exact base-decode semantics
    (coding/progressive.py pinned rank 0 = pruned) — with
    delta_offsets[i] the shared artifact's layer-i weight.
    """
    h, w, _ = grid.shape
    target = jnp.asarray(np.asarray(img, np.float32)).reshape(h * w, -1)

    template: Dict[int, dict] = {}
    hi_of: Dict[int, jnp.ndarray] = {}
    book_names = []  # aligned (layer index, entry name, stored dtype)
    raw = dict(base_entries)
    for name, arr in raw.items():
        _, idx, key = name.split(".", 2)
        i = int(idx)
        if key == "labels_hi":
            hi_of[i] = jnp.asarray(np.asarray(arr, np.int32))
            continue
        if key == "base_centroids":
            book_names.append((i, name, np.asarray(arr).dtype))
            continue
        layer = template.setdefault(i, {})
        if key == "labeled_weight":
            qn, cn = f"layers.{i}.qscale", f"layers.{i}.centroids"
            if qn in raw:  # per-channel QAT: codes * scales, frozen
                layer["w"] = jnp.asarray(
                    np.asarray(arr, np.float32)
                    * np.asarray(raw[qn], np.float32)[None, :]
                )
            else:  # unsplit VQ (uint16 labels), frozen
                layer["w"] = jnp.asarray(
                    np.asarray(raw[cn], np.float32)[np.asarray(arr)]
                )
        elif key in ("qscale", "centroids"):
            continue  # consumed above
        else:
            k = {"weight": "w", "bias": "b"}.get(key, key)
            layer[k] = jnp.asarray(np.asarray(arr, np.float32))

    if not book_names:
        return {}
    books0 = [
        jnp.asarray(np.asarray(raw[name], np.float32))
        for _, name, _ in book_names
    ]

    delta_layers = frozenset(int(i) for i in delta_layers)
    offs = {
        int(i): jnp.asarray(np.asarray(v, np.float32))
        for i, v in (delta_offsets or {}).items()
    }

    def build_params(books):
        layers = {i: dict(d) for i, d in template.items()}
        for (i, _, _), book in zip(book_names, books):
            w = book[hi_of[i]]
            if i in delta_layers:
                w = (w + offs[i]) * (hi_of[i] != 0)
            layers.setdefault(i, {})["w"] = w
        return tuple(layers[i] for i in sorted(layers))

    def loss_fn(books):
        pred = mdef.apply(build_params(books), grid, mcfg, None)
        return mse(pred.reshape(h * w, -1), target)

    b1, b2, eps = 0.9, 0.999, 1e-8

    @jax.jit
    def run(books):
        mu = [jnp.zeros_like(b) for b in books]
        nu = [jnp.zeros_like(b) for b in books]

        def step(carry, t):
            books, mu, nu = carry
            _, grads = jax.value_and_grad(loss_fn)(books)
            mu = [b1 * m + (1 - b1) * g for m, g in zip(mu, grads)]
            nu = [b2 * n + (1 - b2) * g * g for n, g in zip(nu, grads)]
            tt = t + 1
            books = [
                b - lr * (m / (1 - b1**tt)) / (
                    jnp.sqrt(n / (1 - b2**tt)) + eps
                )
                for b, m, n in zip(books, mu, nu)
            ]
            return (books, mu, nu), None

        (books, _, _), _ = jax.lax.scan(
            step, (books, mu, nu), jnp.arange(steps, dtype=jnp.float32)
        )
        return books

    tuned = jax.device_get(run(books0))
    return {
        name: np.asarray(book, dtype)
        for (_, name, dtype), book in zip(book_names, tuned)
    }
