"""Image I/O and coordinate-grid generation.

Host-side (numpy / OpenCV) image ingestion + device-side grid generation.
Capability parity with the reference's `implicit_image/data.py`:
  * `load_img`    — reference data.py:44-75 (8/16-bit read, BGR->RGB,
                    normalize to [0,1], resize-crop / centre-crop to H x W)
  * `get_grid`    — reference data.py:78-88 (unit-square coordinate grid,
                    H x W x 2, row-coordinate first / 'ij' indexing)
  * `pixel_batches` — the (dead-code) SliceDataset minibatcher of
                    reference data.py:9-41, implemented correctly here.

TPU-native notes: the grid is generated on device with `jnp.linspace` +
broadcasting (no host transfer); images are loaded once on host and shipped
to HBM by the caller. A deterministic synthetic-image generator is provided
for tests/benchmarks since the rgb16bit benchmark set cannot be downloaded
in a zero-egress environment.
"""
from __future__ import annotations

import os
from typing import Iterator, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "load_img",
    "get_grid",
    "get_grid_window",
    "pixel_batches",
    "synthetic_image",
    "synthetic_ood",
    "stable_seed",
    "save_img",
    "resolve_benchmark_path",
]


def resolve_benchmark_path(path: str) -> str | None:
    """Resolve a configured image path against the benchmark drop-in dirs.

    Search order: the configured path itself (the reference's
    `img/rgb16bit/...` layout, conf/img/flower.yaml:4), then the same
    relative path under `data/` (this repo's documented drop-in point,
    data/MANIFEST.json), then the bare filename under `data/` and
    `data/rgb16bit/`. Returns the first existing path, else None.
    """
    if not path:
        return None
    base = os.path.basename(path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rels = (path, os.path.join("data", path), os.path.join("data", base),
            os.path.join("data", "rgb16bit", base))
    # CWD-relative first (user paths / repo-root invocation), then
    # repo-anchored so tools keep resolving from any working directory
    for cand in rels + tuple(os.path.join(repo, r) for r in rels[1:]):
        if os.path.exists(cand):
            return cand
    return None


def _read_image(path: str) -> np.ndarray:
    """Read an image file to an RGB numpy array (native bit depth).

    Uses OpenCV (reads 8- and 16-bit PNG/PPM/TIFF); falls back to a
    minimal binary-P6 PPM reader if OpenCV is unavailable.
    """
    try:
        import cv2

        img = cv2.imread(path, -1)
        if img is None:
            raise FileNotFoundError(f"Could not read image at {path}")
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        return img[:, :, ::-1]  # BGR -> RGB
    except ImportError:
        return _read_ppm(path)


def _read_ppm(path: str) -> np.ndarray:
    """Minimal binary P6 PPM reader (8- or 16-bit big-endian)."""
    with open(path, "rb") as f:
        data = f.read()
    # Parse header: magic, width, height, maxval separated by whitespace
    # (comments starting with '#' allowed).
    tokens = []
    i = 0
    while len(tokens) < 4:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(data) and not data[i : i + 1].isspace():
            i += 1
        tokens.append(data[start:i])
    i += 1  # single whitespace after maxval
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    if magic != b"P6":
        raise ValueError(f"Unsupported PPM magic {magic!r}")
    dtype = np.dtype(">u2") if maxval > 255 else np.uint8
    arr = np.frombuffer(data, dtype=dtype, count=w * h * 3, offset=i)
    return arr.reshape(h, w, 3).astype(np.uint16 if maxval > 255 else np.uint8)


def stable_seed(name: str) -> int:
    """Deterministic 31-bit seed from a name — built-in hash() is salted
    per process (PYTHONHASHSEED), which would make the synthetic stand-in
    image differ between the fit and the visualize/JPEG-comparator
    processes."""
    import hashlib

    return int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little") % (
        2**31
    )


def _resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize with half-pixel centers (align_corners=False)."""
    try:
        import cv2

        return cv2.resize(img, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
    except ImportError:
        out = jax.image.resize(
            jnp.asarray(img), (out_h, out_w, img.shape[-1]), method="bilinear"
        )
        return np.asarray(out)


def _center_crop(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """kornia.center_crop-faithful crop (reference data.py:65).

    kornia warps the center box with bilinear grid_sample: destination
    pixel i samples source position (H - out_h)/2 + i in pixel centers.
    For an even size difference that start is integral — an exact slice —
    but for an ODD difference it sits on a half pixel, so each output
    row/col is the 0.5/0.5 average of two neighbors. Interpolation-parity
    matters more than model parity for PSNR (SURVEY.md hard part (f)).
    """
    h, w = img.shape[:2]
    start_y = max((h - out_h) / 2.0, 0.0)
    start_x = max((w - out_w) / 2.0, 0.0)
    iy, ix = int(start_y), int(start_x)
    fy, fx = start_y - iy, start_x - ix
    if fy == 0.0 and fx == 0.0:
        return img[iy : iy + out_h, ix : ix + out_w]
    out = img
    if fy > 0.0:
        hi = np.minimum(np.arange(iy, iy + out_h) + 1, h - 1)
        out = (1.0 - fy) * out[iy : iy + out_h] + fy * out[hi]
    else:
        out = out[iy : iy + out_h]
    if fx > 0.0:
        hi = np.minimum(np.arange(ix, ix + out_w) + 1, w - 1)
        out = (1.0 - fx) * out[:, ix : ix + out_w] + fx * out[:, hi]
    else:
        out = out[:, ix : ix + out_w]
    return out.astype(img.dtype, copy=False)


def load_img(
    path: str,
    height: int = 256,
    width: int = 256,
    bits: int = 8,
    crop_mode: str = "centre-crop",
    save_gt: bool = False,
    **kwargs,
) -> np.ndarray:
    """Load an image normalized to [0, 1] float32, shaped (H, W, 3).

    Mirrors reference data.py:44-75: read at native bit depth, divide by
    (2^bits - 1), optionally resize so the smaller side matches the smaller
    target side ('resize-crop'), then center-crop to (height, width).
    """
    img = _read_image(path).astype(np.float32) / float(2**bits - 1)

    if crop_mode == "resize-crop":
        # Reference (data.py:58-62): kornia.resize(img, min(height, width))
        # resizes the image's SMALLER side to that value, the long side to
        # int(size * long / short) — TRUNCATED, not rounded (kornia 0.4
        # resize int-size branch). Parity matters: a 1-pixel size change
        # flips the crop parity and shifts every sampled value.
        smaller_side = min(height, width)
        h, w = img.shape[:2]
        if not ((w <= h and w == smaller_side) or (h <= w and h == smaller_side)):
            if w < h:
                new_w = smaller_side
                new_h = int(smaller_side * h / w)
            else:
                new_h = smaller_side
                new_w = int(smaller_side * w / h)
            img = _resize_bilinear(img, new_h, new_w)

    img = _center_crop(img, height, width)

    if save_gt:
        save_img("gt.png", img)

    return np.ascontiguousarray(img, dtype=np.float32)


def save_img(path: str, img: np.ndarray) -> None:
    """Save a [0,1] float image as 8-bit."""
    arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    try:
        import cv2

        cv2.imwrite(path, arr[:, :, ::-1])
    except ImportError:
        from PIL import Image

        Image.fromarray(arr).save(path)


def get_grid(height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """Unit-square pixel-coordinate grid, shape (H, W, 2).

    Channel 0 is the row coordinate, channel 1 the column coordinate
    ('ij' meshgrid indexing) — reference data.py:78-88.
    Generated on device by broadcasting (no meshgrid materialization on host).
    """
    coords_h = jnp.linspace(0.0, 1.0, height, dtype=dtype)
    coords_w = jnp.linspace(0.0, 1.0, width, dtype=dtype)
    gh = jnp.broadcast_to(coords_h[:, None], (height, width))
    gw = jnp.broadcast_to(coords_w[None, :], (height, width))
    return jnp.stack([gh, gw], axis=-1)


def get_grid_window(
    height: int,
    width: int,
    row0: int,
    row1: int,
    col0: int,
    col1: int,
    dtype=jnp.float32,
) -> jax.Array:
    """Coordinate grid of the axis-aligned window [row0,row1)x[col0,col1)
    of the H×W unit-square lattice — bit-identical to
    `get_grid(height, width)[row0:row1, col0:col1]` without materializing
    the full grid. Remains a tensor product (grid[y, x] == (rows[y],
    cols[x])), so separable model families (CoordX, hashgrid) keep their
    fast path on windows. Used by region-of-interest decode
    (coding.render_region); the reference can only evaluate the full
    training grid (SURVEY.md §3.2)."""
    if not (0 <= row0 < row1 <= height and 0 <= col0 < col1 <= width):
        raise ValueError(
            f"window [{row0},{row1})x[{col0},{col1}) out of bounds for "
            f"{height}x{width}"
        )
    coords_h = jnp.linspace(0.0, 1.0, height, dtype=dtype)[row0:row1]
    coords_w = jnp.linspace(0.0, 1.0, width, dtype=dtype)[col0:col1]
    hh, ww = row1 - row0, col1 - col0
    gh = jnp.broadcast_to(coords_h[:, None], (hh, ww))
    gw = jnp.broadcast_to(coords_w[None, :], (hh, ww))
    return jnp.stack([gh, gw], axis=-1)


def pixel_batches(
    height: int,
    width: int,
    batch_size: int,
    key: jax.Array | None = None,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (row_idx, col_idx) minibatches over all H*W pixels.

    Functional replacement for the reference's SliceDataset/get_dataloaders
    (data.py:9-41; note the reference's __getitem__ transposed H and W —
    dead code there, implemented correctly here). Shuffled when `key` given.
    """
    n = height * width
    order = np.arange(n)
    if key is not None:
        order = np.asarray(jax.random.permutation(key, n))
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        yield idx // width, idx % width


def synthetic_image(
    height: int = 512, width: int = 512, seed: int = 0, complexity: int = 6
) -> np.ndarray:
    """Deterministic multi-frequency synthetic test image in [0,1], (H,W,3).

    Stands in for the imagecompression.info rgb16bit benchmark set in
    zero-egress environments; smooth + textured content so PSNR curves are
    meaningful.
    """
    rng = np.random.default_rng(seed)
    ys = np.linspace(0, 1, height, dtype=np.float32)[:, None]
    xs = np.linspace(0, 1, width, dtype=np.float32)[None, :]
    img = np.zeros((height, width, 3), dtype=np.float32)
    for c in range(3):
        acc = np.zeros((height, width), dtype=np.float32)
        for k in range(1, complexity + 1):
            fy, fx = rng.uniform(0.5, 3.0 * k, size=2)
            py, px = rng.uniform(0, 2 * np.pi, size=2)
            amp = 1.0 / k
            acc += amp * np.sin(2 * np.pi * fy * ys + py) * np.cos(
                2 * np.pi * fx * xs + px
            )
        img[:, :, c] = acc
    img -= img.min()
    img /= img.max() + 1e-12
    return img


def synthetic_ood(
    kind: str, height: int = 512, width: int = 512, seed: int = 0
) -> np.ndarray:
    """Deterministic OUT-OF-DISTRIBUTION stand-ins, (H,W,3) in [0,1].

    The meta-init warm start (training/metainit.py) was trained on the
    smooth multi-frequency `synthetic_image` family; these families
    deliberately break its statistics so the `train.init_path=auto`
    arbitration can be stress-tested where warm should LOSE
    (benchmarks/metainit_ood.py; VERDICT r3 item 4):

      pink:  1/f-spectrum noise per channel (natural-image-like power law
             but random phase — no smooth structure)
      text:  high-contrast glyph-like strokes on a flat page (sharp
             axis-aligned edges, bimodal histogram)
      noise: white noise (the incompressible extreme)
    """
    rng = np.random.default_rng(stable_seed(f"ood_{kind}") + seed)
    if kind == "noise":
        return rng.random((height, width, 3), dtype=np.float32)
    if kind == "pink":
        fy = np.fft.fftfreq(height)[:, None]
        fx = np.fft.fftfreq(width)[None, :]
        f = np.sqrt(fy * fy + fx * fx)
        f[0, 0] = 1.0
        img = np.zeros((height, width, 3), dtype=np.float32)
        for c in range(3):
            phase = rng.uniform(0, 2 * np.pi, size=(height, width))
            spec = (1.0 / f) * np.exp(1j * phase)
            img[:, :, c] = np.real(np.fft.ifft2(spec)).astype(np.float32)
        img -= img.min()
        img /= img.max() + 1e-12
        return img
    if kind == "text":
        img = np.full((height, width), 0.92, dtype=np.float32)  # page
        n_rows = max(height // 16, 1)
        for r in range(n_rows):
            y0 = r * 16 + 4
            x = 8
            while x < width - 8:
                glyph_w = int(rng.integers(3, 9))
                gap = int(rng.integers(2, 5))
                if rng.random() < 0.85:  # word body vs space
                    gh = int(rng.integers(6, 10))
                    img[y0 : y0 + gh, x : x + glyph_w] = 0.08
                    if rng.random() < 0.3:  # ascender/descender
                        img[y0 - 2 : y0, x : x + 2] = 0.08
                x += glyph_w + gap
        return np.repeat(img[:, :, None], 3, axis=2)
    raise ValueError(f"unknown OOD kind {kind!r} (pink|text|noise)")


def synthetic_video(
    height: int = 256,
    width: int = 256,
    frames: int = 8,
    seed: int = 0,
    complexity: int = 6,
    motion: float = 0.01,
) -> np.ndarray:
    """Deterministic temporally-coherent synthetic sequence, (T,H,W,3) in [0,1].

    The same multi-frequency field as `synthetic_image` advected by a
    constant per-channel phase velocity (global translation with
    wrap-around — every basis term is periodic) plus a slow amplitude
    drift, so consecutive frames are strongly correlated the way video
    frames are. `motion` is the per-frame translation as a fraction of the
    image extent. Normalization is joint over the whole sequence (per-frame
    normalization would flicker). frames=1, motion=0 reduces to a
    (renormalized) synthetic_image. Stand-in for real video in this
    zero-egress environment (beyond reference: the reference is
    single-image only).
    """
    rng = np.random.default_rng(seed)
    ys = np.linspace(0, 1, height, dtype=np.float32)[:, None]
    xs = np.linspace(0, 1, width, dtype=np.float32)[None, :]
    vid = np.zeros((frames, height, width, 3), dtype=np.float32)
    for c in range(3):
        # same draw order as synthetic_image so frame content is familiar
        terms = []
        for k in range(1, complexity + 1):
            fy, fx = rng.uniform(0.5, 3.0 * k, size=2)
            py, px = rng.uniform(0, 2 * np.pi, size=2)
            terms.append((fy, fx, py, px, 1.0 / k))
        # per-channel velocity and amplitude-drift phase
        vy, vx = rng.uniform(-1.0, 1.0, size=2) * motion
        drift = rng.uniform(0, 2 * np.pi)
        for t in range(frames):
            acc = np.zeros((height, width), dtype=np.float32)
            gain = 1.0 + 0.05 * np.sin(0.4 * t + drift)
            for fy, fx, py, px, amp in terms:
                acc += (amp * gain) * np.sin(
                    2 * np.pi * fy * (ys + vy * t) + py
                ) * np.cos(2 * np.pi * fx * (xs + vx * t) + px)
            vid[t, :, :, c] = acc
    vid -= vid.min()
    vid /= vid.max() + 1e-12
    return vid
