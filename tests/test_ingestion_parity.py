"""Ingestion parity vs the reference loader (reference data.py:44-75).

SURVEY.md hard part (f): interpolation differences shift PSNR more than
model differences, so the loader is a parity surface in its own right.

The reference pipeline is cv2.imread (BGR->RGB, native bit depth) ->
/(2^bits-1) -> optional kornia.resize(min(H,W), align_corners=False) ->
kornia.center_crop((H,W), align_corners=False). kornia is a thin wrapper:
resize delegates to torch.nn.functional.interpolate(bilinear,
align_corners=False) with the smaller side matched and the long side
TRUNCATED (int(size*long/short)); center_crop warps the center box with
grid_sample, i.e. destination pixel i samples source pixel-center
position (H-out)/2 + i. The golden here re-runs that exact math with the
reference's actual backends (cv2 + torch, both installed); when kornia
itself is importable the reference's own load_img is executed too.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from implicit_image_tpu.data import _read_ppm, load_img  # noqa: E402

try:
    import kornia  # noqa: F401

    HAVE_KORNIA = True
except ImportError:
    HAVE_KORNIA = False


def _write_png16(path, rng, h, w):
    arr = rng.integers(0, 2**16, size=(h, w, 3), dtype=np.uint16)
    cv2.imwrite(str(path), arr[:, :, ::-1])  # cv2 writes BGR
    return arr


def _write_ppm(path, rng, h, w, bits):
    if bits == 16:
        arr = rng.integers(0, 2**16, size=(h, w, 3), dtype=np.uint16)
        payload = arr.astype(">u2").tobytes()
        maxval = 65535
    else:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = arr.tobytes()
        maxval = 255
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n{maxval}\n".encode())
        f.write(payload)
    return arr


def reference_load(path, height, width, bits, crop_mode):
    """The reference's load_img math on its actual backends (no kornia)."""
    img = cv2.imread(str(path), -1)[:, :, ::-1] / (2**bits - 1)
    t = torch.from_numpy(img.copy()).float().permute(2, 0, 1)[None]

    if crop_mode == "resize-crop":
        size = min(height, width)
        h, w = t.shape[-2:]
        if not ((w <= h and w == size) or (h <= w and h == size)):
            if w < h:
                ow, oh = size, int(size * h / w)
            else:
                oh, ow = size, int(size * w / h)
            t = F.interpolate(
                t, size=(oh, ow), mode="bilinear", align_corners=False
            )

    # kornia.center_crop == grid_sample of the center box at pixel centers
    h, w = t.shape[-2:]
    sy, sx = (h - height) / 2.0, (w - width) / 2.0
    ys = torch.arange(height, dtype=torch.float64) + sy
    xs = torch.arange(width, dtype=torch.float64) + sx
    gy = (2.0 * ys + 1.0) / h - 1.0  # align_corners=False normalization
    gx = (2.0 * xs + 1.0) / w - 1.0
    gyy, gxx = torch.meshgrid(gy, gx, indexing="ij")
    grid = torch.stack([gxx, gyy], dim=-1)[None].float()
    out = F.grid_sample(
        t, grid, mode="bilinear", padding_mode="border", align_corners=False
    )
    return out[0].permute(1, 2, 0).numpy()


@pytest.mark.parametrize("bits", [8, 16])
def test_ppm_reader_matches_cv2(tmp_path, bits):
    """Our zero-dep P6 fallback reads exactly what cv2 reads."""
    rng = np.random.default_rng(0)
    path = tmp_path / f"img{bits}.ppm"
    arr = _write_ppm(path, rng, 37, 53, bits)
    ours = _read_ppm(str(path))
    ref = cv2.imread(str(path), -1)[:, :, ::-1]
    np.testing.assert_array_equal(ours, ref)
    np.testing.assert_array_equal(ours, arr)


def test_centre_crop_even_diff_is_exact_slice(tmp_path):
    """Even size difference: kornia's warp degenerates to an exact slice."""
    rng = np.random.default_rng(1)
    path = tmp_path / "a.png"
    arr = _write_png16(path, rng, 40, 48)
    ours = load_img(str(path), height=32, width=32, bits=16)
    direct = arr.astype(np.float32)[4:36, 8:40] / 65535.0
    np.testing.assert_array_equal(ours, direct)
    ref = reference_load(path, 32, 32, 16, "centre-crop")
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("shape", [(41, 47), (41, 48), (40, 47)])
def test_centre_crop_odd_diff_half_pixel(tmp_path, shape):
    """Odd size difference: destination samples sit on half pixels, so the
    crop is a 0.5/0.5 neighbor average, NOT an integer slice."""
    rng = np.random.default_rng(2)
    path = tmp_path / "b.png"
    _write_png16(path, rng, *shape)
    ours = load_img(str(path), height=32, width=32, bits=16)
    ref = reference_load(path, 32, 32, 16, "centre-crop")
    # golden's grid_sample rounds sample positions in fp32 normalized
    # coords (error ~eps*W/2); ours uses the exact 0.5 weights
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # and it must differ from the naive slice when the diff is odd
    naive = cv2.imread(str(path), -1)[:, :, ::-1].astype(np.float32) / 65535.0
    top, left = (shape[0] - 32) // 2, (shape[1] - 32) // 2
    naive = naive[top : top + 32, left : left + 32]
    assert np.abs(ours - naive).max() > 1e-4


@pytest.mark.parametrize(
    "shape", [(384, 597), (600, 400), (512, 700), (771, 512), (513, 513)]
)
def test_resize_crop_parity(tmp_path, shape):
    """resize-crop end-to-end vs the reference math (cv2 bilinear matches
    torch's align_corners=False formula to ~1 ulp; the truncated long-side
    size and the half-pixel crop must line up exactly)."""
    rng = np.random.default_rng(3)
    path = tmp_path / "c.png"
    _write_png16(path, rng, *shape)
    ours = load_img(
        str(path), height=512, width=512, bits=16, crop_mode="resize-crop"
    )
    assert ours.shape == (512, 512, 3)
    ref = reference_load(path, 512, 512, 16, "resize-crop")
    # tolerance: fp32 normalized-coordinate rounding in the golden's
    # grid_sample is ~eps*W/2 ≈ 5e-5 at the post-resize widths here
    np.testing.assert_allclose(ours, ref, atol=2e-4)


@pytest.mark.skipif(not HAVE_KORNIA, reason="kornia not installed")
@pytest.mark.parametrize("crop_mode", ["centre-crop", "resize-crop"])
def test_against_reference_actual_loader(tmp_path, crop_mode):
    """When kornia exists, run the REFERENCE's own load_img byte-for-byte."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_data", "/root/reference/implicit_image/data.py"
    )
    ref_data = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_data)

    rng = np.random.default_rng(4)
    path = tmp_path / "d.png"
    _write_png16(path, rng, 600, 400)
    theirs = ref_data.load_img(
        str(path), height=256, width=256, bits=16, crop_mode=crop_mode
    ).numpy()
    ours = load_img(
        str(path), height=256, width=256, bits=16, crop_mode=crop_mode
    )
    np.testing.assert_allclose(ours, theirs, atol=5e-6)
