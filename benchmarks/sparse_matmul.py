#!/usr/bin/env python
"""Sparse wall-clock: can a sparse kernel beat the dense-0/1-mask matmul?

SURVEY §7.8 scoped a "masked-matmul for high sparsity" kernel; VERDICT r2
item 4 demands the measurement either way. Three candidates at the
reference decode/fit shape (M=H·W=262144 rows, K=N=128):

  dense-mask   y = x @ (w·mask)            — what the framework ships
  gather-mac   y = Σ_i x[:, idx[:, i]]·val[:, i]  (scan over the padded
               per-column nonzero count; VPU gathers, no MXU)
  block-skip   MXU-tile block sparsity — feasibility is measured as the
               fraction of (8, 128) / (128, 128) weight blocks that are
               entirely zero in REAL RigL masks (a block can only be
               skipped if ALL its weights are zero)

Context for the expected result: an unstructured RigL mask at density d
leaves a (b1, b2) block all-zero with probability (1-d)^(b1·b2) — at
d=0.05 and the smallest fp32 MXU tile (8, 128), that is (0.95)^1024 ≈
5e-23. The block-occupancy section makes this concrete on real masks;
the timing section quantifies how far the gather kernel is from the
dense path. Results recorded in BASELINE.md (sparse wall-clock section).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def time_scan(fn, args, reps=20):
    """Steady-state per-iteration wall via one compiled scan (per-dispatch
    timing is unreliable on the tunneled runtime — BASELINE.md)."""

    @jax.jit
    def many(*a):
        def body(c, _):
            out = fn(*a)
            return c + out.ravel()[0] * 1e-30, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=reps)
        return acc

    np.asarray(many(*args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(many(*args))
    return (time.perf_counter() - t0) / reps


def make_gather_mac(idx, val, chunk=8192):
    """Best-effort TPU sparse kernel: per-column nonzeros padded to kmax,
    indices STATIC (baked into the program), rows processed in chunks so
    the (chunk, N·kmax) gathered intermediate stays in-budget; the
    multiply-accumulate runs on the VPU (no MXU use at all)."""
    n, kmax = idx.shape
    flat_idx = jnp.asarray(np.asarray(idx).reshape(-1))  # (N*kmax,) static
    valb = jnp.asarray(val)  # (N, kmax)

    def gather_mac(x):
        m = x.shape[0]
        xc = x.reshape(m // chunk, chunk, x.shape[1])

        def body(_, xi):
            g = jnp.take(xi, flat_idx, axis=1).reshape(chunk, n, kmax)
            return None, jnp.sum(g * valb[None], axis=-1)

        _, out = jax.lax.scan(body, None, xc)
        return out.reshape(m, n)

    return gather_mac


def real_rigl_mask(key, shape, density):
    """A mask with RigL-like structure: magnitude-pruned from a trained-ish
    weight distribution (heavier-tailed than uniform random support)."""
    w = jax.random.normal(key, shape) * (1.0 + jax.random.uniform(key, shape))
    k = int(round(density * w.size))
    thresh = jnp.sort(jnp.abs(w).ravel())[-k]
    return (jnp.abs(w) >= thresh).astype(jnp.float32)


def block_occupancy(mask: np.ndarray, b1: int, b2: int) -> float:
    """Fraction of (b1, b2) blocks containing at least one nonzero."""
    k, n = mask.shape
    p1, p2 = -k % b1, -n % b2
    m = np.pad(mask, ((0, p1), (0, p2)))
    blocks = m.reshape(m.shape[0] // b1, b1, m.shape[1] // b2, b2)
    occupied = blocks.any(axis=(1, 3))
    return float(occupied.mean())


def pack_columns(w_masked: np.ndarray):
    """Pad each column's nonzeros to the max per-column count ->
    (idx, val) of shape (N, kmax); padded entries point at row 0 with
    val 0 (contributes nothing)."""
    k, n = w_masked.shape
    counts = (w_masked != 0).sum(axis=0)
    kmax = int(counts.max())
    idx = np.zeros((n, kmax), np.int32)
    val = np.zeros((n, kmax), np.float32)
    for j in range(n):
        rows = np.nonzero(w_masked[:, j])[0]
        idx[j, : rows.size] = rows
        val[j, : rows.size] = w_masked[rows, j]
    return jnp.asarray(idx), jnp.asarray(val), kmax


def main(m=262144, k=128, n=128):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n)) * 0.1

    report = {"shape": [m, k, n], "occupancy": {}, "timing": {}}

    print(f"{'density':>8s} {'occ(8,128)':>11s} {'occ(128,128)':>13s} "
          f"{'dense ms':>9s} {'gather ms':>10s} {'ratio':>7s} {'kmax':>5s}")
    for d in (0.05, 0.1, 0.2, 0.4):
        mask = real_rigl_mask(jax.random.PRNGKey(2), (k, n), d)
        wm = np.asarray(w * mask)
        occ_s = block_occupancy(np.asarray(mask), 8, 128)
        occ_l = block_occupancy(np.asarray(mask), 128, 128)

        dense_ms = time_scan(
            lambda x, w, mask: x @ (w * mask), (x, w, mask)
        ) * 1e3
        print(f"  d={d}: dense {dense_ms:.3f} ms", file=sys.stderr, flush=True)

        idx, val, kmax = pack_columns(wm)
        gather_mac = make_gather_mac(idx, val)
        gather_ms = time_scan(gather_mac, (x,), reps=3) * 1e3
        print(f"  d={d}: gather {gather_ms:.3f} ms", file=sys.stderr, flush=True)

        # correctness of the sparse kernel vs a HOST float64 product (the
        # on-device dense dot runs through bf16 MXU passes, ~1e-2 error
        # at this K — that is the baseline's precision, not the kernel's)
        ref = np.asarray(x[:8192], np.float64) @ wm.astype(np.float64)
        got = np.asarray(gather_mac(x[:8192]))
        err = float(np.abs(ref - got).max())
        assert err < 1e-3, err

        report["occupancy"][str(d)] = {"8x128": occ_s, "128x128": occ_l}
        report["timing"][str(d)] = {
            "dense_mask_ms": round(dense_ms, 4),
            "gather_mac_ms": round(gather_ms, 4),
            "ratio": round(gather_ms / dense_ms, 2),
            "kmax": kmax,
        }
        print(f"{d:8.2f} {occ_s:11.4f} {occ_l:13.4f} {dense_ms:9.3f} "
              f"{gather_ms:10.3f} {gather_ms / dense_ms:7.2f} {kmax:5d}")

    print(json.dumps(report))
    return report


if __name__ == "__main__":
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    main(int(kv.get("m", 262144)), int(kv.get("k", 128)), int(kv.get("n", 128)))
