"""K-means codebook quantization (Deep Compression, Han et al. 2016).

Capability parity with reference `implicit_image/pipeline/quant/kmeans.py`
(KmeansQuant :11-181) and `kmeans_helper.py`, re-designed for XLA:

  * the reference re-clusters each layer's weights via forward-pre hooks and
    torch_scatter; here `quantize_weight` is a pure jittable function using
    one-hot matmuls / segment-sum semantics, so the whole quant-aware
    finetune phase compiles into the same single XLA program as the fit.
  * "exclude zeros from clustering" (kmeans.py:120) is expressed with
    validity weights instead of boolean indexing (static shapes).
  * cluster count = 2^bits - 1 on the nonzero weights, then a zero centroid
    is prepended and centroids are sorted by |c| (kmeans.py:126-146).
  * Lloyd's iterations: `iter_limit=5`, linspace init over [min_nz, max_nz]
    (kmeans_helper.py:59-98; kmeans.py:123-129).
  * gradient semantics: the reference's forward hook snaps the *parameter
    itself* to the centroids, then Adam steps from the snapped value
    (weight.data replacement, kmeans.py:65-71). `quant_step` in
    training/quant_phase.py reproduces exactly that: grads are taken at the
    snapped params and the optimizer update starts from the snapped params.
    The backward-hook centroid SGD nudge (kmeans.py:163-181) is NOT
    replicated: the reference itself marks it dead ("TODO: Is this even
    needed? Centroids are re-computed in the forward pass").

Deviations (documented):
  * `torch.unique` de-duplication of centroids (kmeans.py:139-140) is a
    dynamic-shape op; collisions of float centroids are measure-zero, and a
    duplicate centroid only wastes one codebook slot, so it is skipped.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["LayerCodebook", "kmeans_fit", "quantize_weight", "ecvq_refine"]


class LayerCodebook(NamedTuple):
    centroids: jnp.ndarray  # (k,) float32, centroids[0] == 0.0
    labels: jnp.ndarray  # weight-shaped int32


def kmeans_fit(
    values: jnp.ndarray,
    valid: jnp.ndarray,
    centers: jnp.ndarray,
    iters: int = 5,
) -> jnp.ndarray:
    """Weighted 1-D Lloyd's algorithm, jittable.

    Args:
      values: (n,) points.
      valid: (n,) 0/1 weights — invalid points do not pull centroids
        (the functional form of the reference's nonzero indexing).
      centers: (k,) initial centroids.
      iters: Lloyd iterations (reference iter_limit=5).

    Empty clusters keep their previous center. A fixed iteration count
    replaces the reference's center-shift tolerance check (tol=1e-4) —
    a data-independent trip count XLA can fully unroll.
    """
    k = centers.shape[0]

    def body(centers, _):
        # (n, k) squared distances; n-major so XLA tiles the big axis.
        d = (values[:, None] - centers[None, :]) ** 2
        assign = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=values.dtype) * valid[:, None]
        counts = one_hot.sum(axis=0)
        sums = one_hot.T @ values
        new_centers = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), centers)
        return new_centers, None

    centers, _ = jax.lax.scan(body, centers, None, length=iters)
    return centers


def quantize_weight(
    weight: jnp.ndarray,
    bits: int,
    iters: int = 5,
    offset: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, LayerCodebook]:
    """Cluster a weight tensor's nonzeros into 2^bits - 1 centroids (+0).

    Returns (snapped_weight, LayerCodebook). Mirrors KmeansQuant.find_centroids
    (kmeans.py:110-150): linspace init over the nonzero range, Lloyd fit,
    prepend 0 centroid, sort by |c|, assign ALL weights (zeros land on the
    0 centroid), snap weight = centroids[labels].

    `offset` (delta mode, beyond reference — quant.delta): cluster the
    RESIDUAL weight - offset instead, where `offset` is shared
    encoder/decoder state (the meta-learned warm-start artifact,
    training/metainit.py). The decode rule becomes
    `w = (offset + centroids[labels]) * (labels != 0)`: label 0 still
    means "pruned" exactly, so valid (nonzero) weights are assigned only
    to labels >= 1 — with residuals peaked at 0 there is always a centroid
    near 0, so the exclusion costs ~nothing and keeps the container's
    sparsity semantics identical to the absolute path. Weights in one
    cluster then share a residual, not a value — a strictly richer
    quantizer (per-weight base + shared increment) at the same label rate.
    """
    n_clusters = 2**bits - 1
    flat = weight.reshape(-1)
    valid = (flat != 0.0).astype(flat.dtype)
    if offset is not None:
        points = jnp.where(valid > 0, flat - offset.reshape(-1), 0.0)
    else:
        points = flat
    big = jnp.asarray(jnp.inf, flat.dtype)
    lo = jnp.min(jnp.where(valid > 0, points, big))
    hi = jnp.max(jnp.where(valid > 0, points, -big))
    guess = jnp.linspace(0.0, 1.0, n_clusters, dtype=flat.dtype) * (hi - lo) + lo

    centers = kmeans_fit(points, valid, guess, iters=iters)
    centroids = jnp.concatenate([jnp.zeros((1,), flat.dtype), centers])
    order = jnp.argsort(jnp.abs(centroids))
    centroids = centroids[order]

    d = (points[:, None] - centroids[None, :]) ** 2
    if offset is not None:
        # label 0 is reserved for pruned weights (decode reconstructs the
        # mask from labels != 0): valid weights may not take it, invalid
        # (zero) weights must
        col0 = jnp.where(valid > 0, jnp.inf, -jnp.inf)
        d = d.at[:, 0].set(col0)
    labels = jnp.argmin(d, axis=1).astype(jnp.int32)
    snapped = centroids[labels]
    if offset is not None:
        snapped = (snapped + offset.reshape(-1)) * (labels != 0)
    snapped = snapped.reshape(weight.shape)
    return snapped, LayerCodebook(centroids=centroids, labels=labels.reshape(weight.shape))


def ecvq_refine(
    weight: jnp.ndarray,
    book: LayerCodebook,
    lam: float,
    iters: int = 10,
    offset: jnp.ndarray = None,
) -> LayerCodebook:
    """Entropy-constrained assignment (ECVQ, Chou-Lookabaugh-Gray 1989):
    re-assign each nonzero weight to argmin_j [ (w - c_j)^2 + λ·σ²·R_j ]
    where R_j = -log2 p_j is the label's code length under the current
    assignment frequencies. Skews mass onto popular centroids, lowering
    the label entropy the bitstream coder pays, at a small weight-MSE
    cost the codebook finetune then largely recovers.

    No reference counterpart (the reference codes plain k-means labels);
    this is a beyond-parity rate lever, opt-in via quant.ecvq_lambda.

    λ is dimensionless: the rate term is scaled by σ² = the layer's mean
    initial quantization error over nonzeros, so λ≈1 trades ~one average
    quant error per bit saved. Pruned (zero) weights stay at label 0; a
    nonzero weight MAY move to the zero centroid (extra pruning is a
    legitimate R-D move, and label 0 is typically the cheapest).

    `offset` (delta mode — see quantize_weight): the refinement runs on
    the residual weight - offset, and label 0 stays reserved for pruned
    weights (valid weights never move onto it: the delta decode rule
    reconstructs the mask from labels != 0).
    """
    flat = weight.reshape(-1)
    labels0 = book.labels.reshape(-1)
    valid = (flat != 0.0).astype(flat.dtype)
    if offset is not None:
        flat = jnp.where(valid > 0, flat - offset.reshape(-1), 0.0)
    n = flat.shape[0]
    n_valid = jnp.maximum(jnp.sum(valid), 1.0)
    k = book.centroids.shape[0]

    err0 = jnp.sum(valid * (flat - book.centroids[labels0]) ** 2)
    scale = lam * err0 / n_valid  # λ·σ² — per-layer dimensionless λ

    def body(carry, _):
        labels, centroids = carry
        # the coder codes EVERY label (zeros included), so the rate model
        # counts all of them — label 0 carries the pruned mass and is the
        # cheapest symbol at any real sparsity
        counts_all = jnp.zeros((k,), flat.dtype).at[labels].add(1.0)
        p = counts_all / n
        # empty clusters get an effectively infinite code length and are
        # never re-entered (the codebook shrinks to its used support)
        rate = -jnp.log2(jnp.maximum(p, 1e-12))
        d2 = (flat[:, None] - centroids[None, :]) ** 2
        if offset is not None:
            # delta decode derives the prune mask from labels != 0, so a
            # valid weight may never take label 0 (no "extra pruning" move
            # in delta mode — its residual-0 centroid neighbour is ~free)
            d2 = d2.at[:, 0].set(jnp.where(valid > 0, jnp.inf, -jnp.inf))
        new = jnp.argmin(d2 + scale * rate[None, :], axis=1).astype(jnp.int32)
        labels = jnp.where(valid > 0, new, 0)
        # centroid update on the skewed assignment (Lloyd step of the
        # entropy-constrained cost); index 0 stays exactly 0 for pruning
        one_hot = jax.nn.one_hot(labels, k, dtype=flat.dtype) * valid[:, None]
        counts_nz = one_hot.sum(axis=0)
        sums = one_hot.T @ flat
        centroids = jnp.where(
            counts_nz > 0, sums / jnp.maximum(counts_nz, 1.0), centroids
        )
        centroids = centroids.at[0].set(0.0)
        return (labels, centroids), None

    (labels, centroids), _ = jax.lax.scan(
        body, (labels0, book.centroids), None, length=iters
    )
    return LayerCodebook(centroids=centroids, labels=labels.reshape(weight.shape))
