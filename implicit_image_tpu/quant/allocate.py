"""Per-layer codebook bit allocation — `quant.bit_alloc=auto`.

Beyond-reference R-D lever. The reference quantizes EVERY layer at one
global width (conf/quant/kmeans.yaml `bits: 8`; 9-bit for two images in
slurm_scripts/finals.sh), but layer sensitivity to codebook error varies
by more than an order of magnitude (the ω₀-scaled early layers amplify
weight error into phase error; late layers are nearly linear in it). This
module measures each layer's rate/distortion trade-off and solves the
classic separable Lagrangian allocation (Shoham & Gersho 1988):

    b_i(λ) = argmin_b  ΔD_i(b) + λ · R_i(b)

* ΔD_i(b): MEASURED on device — image-MSE increase when layer i alone is
  snapped to a 2^b-entry k-means codebook (everything else full precision).
* R_i(b): modeled as the order-0 entropy of the measured label histogram
  (what the huffman/rans/zstd backends approach) plus the fp16 codebook
  bytes. Constant container terms (unquantized tensors, manifest) cancel
  between allocations, so the model only needs to rank correctly; final
  numbers always come from the real container.

Sweeping λ traces the convex hull of allocations; each unique allocation
is then re-scored with a JOINT snap-everything render (no additivity
assumption), and the cheapest allocation whose joint pre-finetune MSE is
no worse than the all-`bits` baseline wins. If none dominates, the
uniform baseline is returned unchanged — `auto` can never lose.

TPU shape: all snaps and renders are jitted device programs; compile
count is bounded by (#distinct weight shapes × #candidate widths) for the
snap plus ONE render, and every probe afterwards is a millisecond-scale
execution. The search costs ~50 tiny device calls at the reference
operating point (SIREN d8/w128: 6 shared-shape layers × 6 widths).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from implicit_image_tpu.quant import (
    QuantConfig,
    quantize_weight,
    quantized_layer_indices,
)

__all__ = ["AllocationReport", "allocate_bits"]


@dataclass(frozen=True)
class AllocationReport:
    """Outcome of the allocation search (all rates in model bytes)."""

    bits_per_layer: Tuple[Optional[int], ...]
    chosen_uniform: bool  # True when no allocation beat the baseline
    base_bits: int
    base_mse: float  # joint pre-finetune MSE, all layers at base_bits
    base_rate: float  # modeled label+codebook bytes at base_bits
    mse: float  # joint pre-finetune MSE of the chosen allocation
    rate: float  # modeled bytes of the chosen allocation
    per_layer: Dict[int, Dict[int, Tuple[float, float]]]
    # per_layer[i][b] = (ΔD_i(b) image-MSE increase, R_i(b) modeled bytes)


@partial(jax.jit, static_argnums=(1, 2))
def _snap_one(w, bits: int, iters: int):
    snapped, book = quantize_weight(w, bits, iters)
    return snapped, book.labels


def _label_rate_bytes(labels: np.ndarray, bits: int) -> float:
    """Order-0 entropy of the labels + fp16 codebook bytes."""
    counts = np.bincount(labels.reshape(-1), minlength=2**bits).astype(np.float64)
    n = counts.sum()
    p = counts[counts > 0] / n
    h0 = float(-(p * np.log2(p)).sum())  # bits/label
    return n * h0 / 8.0 + 2.0 * (2**bits)


def allocate_bits(
    mdef,
    mcfg,
    params,
    grid,
    img,
    qcfg: QuantConfig,
    candidates: Sequence[int] = (5, 6, 7, 8, 9, 10),
    n_lambdas: int = 64,
    slack_db: float = 0.0,
) -> AllocationReport:
    """Search per-layer codebook widths for `qcfg`'s quantized layers.

    Args:
      params: post-fit (mask-applied) params pytree.
      qcfg: the run's QuantConfig; `qcfg.bits` is the uniform baseline.
      candidates: codebook widths to probe per layer (clipped per layer to
        2^b ≤ weight count, the same degenerate-codebook guard as
        quantized_layer_indices).
      slack_db: allowed joint pre-finetune PSNR loss vs the uniform
        baseline (0 = strict dominance; the codebook finetune typically
        recovers a few hundredths of a dB either way).

    Returns an AllocationReport whose `bits_per_layer` plugs directly into
    QuantConfig(bits_per_layer=...).
    """
    img = jnp.asarray(img)
    target = img.reshape(-1, img.shape[-1])

    @jax.jit
    def render_mse(p):
        pred = mdef.apply(p, grid, mcfg).reshape(-1, img.shape[-1])
        d = pred.astype(jnp.float32) - target.astype(jnp.float32)
        return jnp.mean(d * d)

    qidx = quantized_layer_indices(params, qcfg)
    d0 = float(render_mse(params))

    # ---- per-layer probes: snap layer i alone at width b -----------------
    per_layer: Dict[int, Dict[int, Tuple[float, float]]] = {}
    snapped_cache: Dict[Tuple[int, int], jnp.ndarray] = {}
    for i in qidx:
        w = params[i]["w"]
        cand = [b for b in candidates if 2**b <= w.size]
        if qcfg.bits not in cand:
            cand.append(qcfg.bits)
        per_layer[i] = {}
        for b in sorted(set(cand)):
            snapped, labels = _snap_one(w, b, qcfg.lloyd_iters)
            snapped_cache[(i, b)] = snapped
            probe = tuple(
                {**layer, "w": snapped} if j == i else layer
                for j, layer in enumerate(params)
            )
            dd = max(float(render_mse(probe)) - d0, 0.0)
            rate = _label_rate_bytes(np.asarray(labels), b)
            per_layer[i][b] = (dd, rate)

    def _joint(alloc: Dict[int, int]) -> Tuple[float, float]:
        """Measured joint MSE + modeled bytes with every layer snapped."""
        probe = tuple(
            {**layer, "w": snapped_cache[(j, alloc[j])]} if j in alloc else layer
            for j, layer in enumerate(params)
        )
        return float(render_mse(probe)), sum(per_layer[j][b][1] for j, b in alloc.items())

    base_alloc = {i: qcfg.bits for i in qidx}
    base_mse, base_rate = _joint(base_alloc)

    # ---- λ sweep over the separable Lagrangian ---------------------------
    seen, allocs = set(), []
    for lam in np.logspace(-12, 0, n_lambdas):
        alloc = {
            i: min(per_layer[i], key=lambda b: per_layer[i][b][0] + lam * per_layer[i][b][1])
            for i in qidx
        }
        key = tuple(sorted(alloc.items()))
        if key not in seen:
            seen.add(key)
            allocs.append(alloc)

    # ---- joint re-score; cheapest allocation that holds quality ----------
    mse_budget = base_mse * 10.0 ** (slack_db / 10.0)
    best, best_mse, best_rate = None, base_mse, base_rate
    for alloc in allocs:
        m, r = _joint(alloc)
        if m <= mse_budget and r < best_rate:
            best, best_mse, best_rate = alloc, m, r

    if best is None:
        chosen, chosen_uniform = base_alloc, True
        best_mse, best_rate = base_mse, base_rate
    else:
        chosen, chosen_uniform = best, False

    n_layers = len(params)
    bpl = tuple(chosen.get(i) for i in range(n_layers))
    return AllocationReport(
        bits_per_layer=bpl,
        chosen_uniform=chosen_uniform,
        base_bits=qcfg.bits,
        base_mse=base_mse,
        base_rate=base_rate,
        mse=best_mse,
        rate=best_rate,
        per_layer=per_layer,
    )
