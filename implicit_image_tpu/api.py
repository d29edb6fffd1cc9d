"""Programmatic API — in-process counterparts of the CLIs.

The reference (and this framework's CLI surface) is config-tree driven:
`python -m implicit_image_tpu.compress img=... quant=kmeans ...`
(reference compress.py:52-54 is a Hydra entry point). This module wraps
the same orchestrator for library users — compress a numpy array or an
image file and get a decodable run directory back, without shelling out:

    import implicit_image_tpu as iit

    result = iit.compress_image(img_array, overrides=[
        "quant=kmeans", "entropy_coding=auto", "train.num_steps=2000",
    ])
    result.psnr, result.nbytes      # the (PSNR, bytes) the CLI reports
    decoded = result.decode()       # (H, W, 3) float32 via the bitstream
    big = result.decode(scale=2.0)  # the INR artifact is resolution-free

Every option is a standard dotted config override (the full tree lives
in config/conf/**) — there is deliberately no second options schema.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Sequence, Tuple, Union

import numpy as np

__all__ = [
    "CompressedImage", "compress_image", "compress_images",
    "decompress_image",
]


@dataclasses.dataclass(frozen=True)
class CompressedImage:
    """Result of `compress_image`: a standard, self-contained run dir
    (config.json + model_quantized/ bitstream + summary.json) plus the
    (PSNR, bytes) pair the CLI returns for sweepers."""

    psnr: float
    nbytes: int
    run_dir: Path

    def decode(self, **kwargs) -> np.ndarray:
        """Decode the bitstream back to an image. Accepts decode_run's
        geometry options (scale=, size=, roi=, tile_rows=, base=)."""
        return decompress_image(self.run_dir, **kwargs)

    @property
    def bitstream(self) -> bytes:
        return (
            self.run_dir / "model_quantized" / "compressed_weights.data"
        ).read_bytes()

    def save(self, path: Union[str, Path, None] = None) -> Path:
        """Pack the run dir into ONE .iic file (coding/container_file.py);
        decompress_image / the decompress CLI decode it directly."""
        from implicit_image_tpu.coding.container_file import pack_run

        return pack_run(self.run_dir, path)


def _validate_array(image) -> np.ndarray:
    arr = np.asarray(image, np.float32)
    if arr.ndim != 3 or arr.shape[-1] != 3:
        raise ValueError(
            f"expected an (H, W, 3) image array, got shape {arr.shape}"
        )
    if not np.isfinite(arr).all():
        raise ValueError("image contains NaN/inf values")
    if float(arr.min()) < 0.0 or float(arr.max()) > 1.0:
        raise ValueError(
            "image values must be in [0, 1] "
            f"(got [{arr.min():.3g}, {arr.max():.3g}])"
        )
    return arr


def _unique_run_dir(base: Path) -> Path:
    """First free outputs/api/run[_k] — successive calls must not silently
    overwrite each other's artifacts while earlier CompressedImage results
    still point at them."""
    d = base / "run"
    k = 0
    while d.exists():
        k += 1
        d = base / f"run_{k}"
    return d


def compress_image(
    image: Union[np.ndarray, str, Path],
    overrides: Sequence[str] = (),
    out_dir: Union[str, Path, None] = None,
    seed: int = 0,
) -> CompressedImage:
    """Compress one image through the full pipeline (fit -> sparsify ->
    quantize -> entropy-code), in process.

    image: (H, W, 3) float array in [0, 1], or an image file path (the
        file goes through the standard loader — img.height/img.width
        overrides control resize/centre-crop exactly like the CLI).
    overrides: dotted config overrides, identical to the compress CLI.
    out_dir: run directory; default = the first free outputs/api/run[_k]
        (an explicit `output_dir=` override wins over this parameter).
    """
    from implicit_image_tpu.compress import main
    from implicit_image_tpu.config import compose

    ov = [f"seed={int(seed)}", *map(str, overrides)]
    arr: Optional[np.ndarray] = None
    if not isinstance(image, (str, Path)):
        arr = _validate_array(image)
    cfg = compose(ov)
    if arr is None:
        # set path fields directly: an f"img.path={image}" override would
        # round-trip through YAML value parsing and mangle paths containing
        # '#', ',' or scalar-looking names
        cfg["img"]["path"] = str(image)
    else:
        # the run dir's config.json drives the decoder's lattice — it must
        # describe the array actually fitted, not the img-group default
        cfg["img"]["height"] = int(arr.shape[0])
        cfg["img"]["width"] = int(arr.shape[1])
    if cfg.get("entropy_coding", {}).get("stream_name", "none") == "none":
        raise ValueError(
            "compress_image produces a decodable bitstream — "
            "entropy_coding=none has no decode path; pick a backend "
            "(e.g. 'entropy_coding=auto' in overrides)"
        )
    explicit = any(str(o).startswith("output_dir=") for o in overrides)
    if explicit:
        run_dir = Path(str(cfg["output_dir"]))
    elif out_dir is not None:
        run_dir = Path(str(out_dir))
    else:
        run_dir = _unique_run_dir(Path("outputs/api"))
    cfg["output_dir"] = str(run_dir)
    psnr, nbytes = main(cfg, run_dir=str(run_dir), image=arr)
    return CompressedImage(
        psnr=float(psnr), nbytes=int(nbytes), run_dir=run_dir
    )


def compress_images(
    images: Sequence[np.ndarray],
    overrides: Sequence[str] = (),
    out_dir: Union[str, Path, None] = None,
    seed: int = 0,
    names: Optional[Sequence[str]] = None,
) -> list:
    """Compress B same-shape images as ONE vmapped compiled program (the
    TPU-native fleet encode — the reference's only many-images story is
    one OS process per image via Hydra multirun / SLURM arrays).

    Returns a list of CompressedImage, one per input, each backed by a
    standard decodable run dir under out_dir (default: the first free
    outputs/api/fleet[_k]).
    """
    from implicit_image_tpu.config import compose
    from implicit_image_tpu.fleet import encode_fleet

    arrs = [_validate_array(im) for im in images]
    if not arrs:
        raise ValueError("compress_images needs at least one image")
    if len({a.shape for a in arrs}) != 1:
        raise ValueError(
            "all images must share one shape (the fleet is one vmapped "
            "program); got " + ", ".join(str(a.shape) for a in arrs)
        )
    names = (
        [str(n) for n in names] if names is not None
        else [f"img{i}" for i in range(len(arrs))]
    )
    if len(names) != len(arrs):
        raise ValueError(f"{len(names)} names for {len(arrs)} images")
    if len(set(names)) != len(names):
        raise ValueError("member names must be unique (they become dirs)")
    cfg = compose([f"seed={int(seed)}", *map(str, overrides)])
    h, w = arrs[0].shape[:2]
    cfg["img"]["height"], cfg["img"]["width"] = int(h), int(w)
    if cfg.get("entropy_coding", {}).get("stream_name", "none") == "none":
        raise ValueError(
            "compress_images produces decodable bitstreams — pick an "
            "entropy_coding backend (e.g. 'entropy_coding=auto')"
        )
    if out_dir is not None:
        root = Path(str(out_dir))
    else:
        base = Path("outputs/api")
        root = base / "fleet"
        k = 0
        while root.exists():
            k += 1
            root = base / f"fleet_{k}"
    member_cfgs = []
    for name in names:
        m = dict(cfg)
        m["img"] = dict(cfg["img"]) | {"name": name, "path": None}
        member_cfgs.append(m)
    rows = encode_fleet(cfg, arrs, names, member_cfgs, root=root)
    return [
        CompressedImage(psnr=float(p), nbytes=int(b), run_dir=root / n)
        for n, p, b in rows
    ]


def decompress_image(
    run_dir: Union[str, Path], **kwargs
) -> np.ndarray:
    """Decode a run directory's bitstream to an (H, W, 3) float32 array.

    kwargs pass through to decompress.decode_run: scale=, size=(H, W),
    roi=(r0, r1, c0, c1), tile_rows=, base= (progressive prefix),
    delta_artifact= (relocated shared artifact).
    """
    from implicit_image_tpu.decompress import decode_run

    img, _ = decode_run(run_dir, **kwargs)
    return np.asarray(img, np.float32)
