import numpy as np
import pytest

import jax.numpy as jnp

from implicit_image_tpu.data import (
    get_grid,
    load_img,
    pixel_batches,
    synthetic_image,
    _read_ppm,
)


def test_grid_shape_and_range():
    g = get_grid(8, 16)
    assert g.shape == (8, 16, 2)
    assert float(g[0, 0, 0]) == 0.0 and float(g[-1, 0, 0]) == 1.0
    assert float(g[0, 0, 1]) == 0.0 and float(g[0, -1, 1]) == 1.0
    # channel 0 = row coordinate ('ij' indexing, reference data.py:78-88)
    np.testing.assert_allclose(np.asarray(g[:, 0, 0]), np.linspace(0, 1, 8), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g[0, :, 1]), np.linspace(0, 1, 16), rtol=1e-6)


def test_grid_matches_linspace_meshgrid():
    g = np.asarray(get_grid(5, 7))
    hh, ww = np.meshgrid(np.linspace(0, 1, 5), np.linspace(0, 1, 7), indexing="ij")
    np.testing.assert_allclose(g[..., 0], hh, rtol=1e-6)
    np.testing.assert_allclose(g[..., 1], ww, rtol=1e-6)


def test_ppm_16bit_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 65535, size=(6, 5, 3), dtype=np.uint16)
    path = tmp_path / "x.ppm"
    with open(path, "wb") as f:
        f.write(b"P6\n5 6\n65535\n")
        f.write(img.astype(">u2").tobytes())
    back = _read_ppm(str(path))
    np.testing.assert_array_equal(back.astype(np.uint16), img)

    loaded = load_img(str(path), height=4, width=4, bits=16, crop_mode="centre-crop")
    assert loaded.shape == (4, 4, 3)
    assert loaded.dtype == np.float32
    assert loaded.min() >= 0.0 and loaded.max() <= 1.0


def test_load_img_resize_crop(tmp_path):
    img = (synthetic_image(64, 96) * 255).astype(np.uint8)
    path = tmp_path / "y.png"
    import cv2

    cv2.imwrite(str(path), img[:, :, ::-1])
    out = load_img(str(path), height=32, width=32, bits=8, crop_mode="resize-crop")
    assert out.shape == (32, 32, 3)


def test_pixel_batches_cover_all():
    seen = set()
    for r, c in pixel_batches(4, 6, batch_size=5):
        for ri, ci in zip(r, c):
            assert 0 <= ri < 4 and 0 <= ci < 6
            seen.add((int(ri), int(ci)))
    assert len(seen) == 24


def test_synthetic_image_deterministic():
    a = synthetic_image(16, 16, seed=3)
    b = synthetic_image(16, 16, seed=3)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= 0 and a.max() <= 1.0


def test_resolve_benchmark_path_search_order(tmp_path, monkeypatch):
    """The drop-in resolver tries the configured path, then data/<path>,
    then data/<basename>, then data/rgb16bit/<basename> (the MANIFEST.json
    documented layout)."""
    from implicit_image_tpu.data import resolve_benchmark_path

    monkeypatch.chdir(tmp_path)
    assert resolve_benchmark_path("img/rgb16bit/flower_foveon.ppm") is None
    assert resolve_benchmark_path("") is None

    (tmp_path / "data" / "rgb16bit").mkdir(parents=True)
    f1 = tmp_path / "data" / "rgb16bit" / "flower_foveon.ppm"
    f1.write_bytes(b"x")
    got = resolve_benchmark_path("img/rgb16bit/flower_foveon.ppm")
    assert got is not None and got.endswith("data/rgb16bit/flower_foveon.ppm")

    # the configured (reference-layout) path wins when it exists
    (tmp_path / "img" / "rgb16bit").mkdir(parents=True)
    f2 = tmp_path / "img" / "rgb16bit" / "flower_foveon.ppm"
    f2.write_bytes(b"y")
    assert resolve_benchmark_path("img/rgb16bit/flower_foveon.ppm") == (
        "img/rgb16bit/flower_foveon.ppm"
    )


def test_verify_benchmarks_tofu_and_enforce(tmp_path, monkeypatch):
    """tools/verify_benchmarks.py: records sha256 on first use, then
    enforces it; rejects 8-bit and non-P6 files."""
    import importlib.util
    import json as _json
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "verify_benchmarks",
        Path(__file__).resolve().parent.parent / "tools" / "verify_benchmarks.py",
    )
    vb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vb)

    monkeypatch.chdir(tmp_path)
    (tmp_path / "data" / "rgb16bit").mkdir(parents=True)
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 2**16, size=(16, 16, 3), dtype=np.uint16)
    good = tmp_path / "data" / "rgb16bit" / "ok.ppm"
    with open(good, "wb") as f:
        f.write(b"P6\n16 16\n65535\n" + arr.astype(">u2").tobytes())

    manifest = {
        "images": [
            {"name": "ok", "file": "rgb16bit/ok.ppm", "source_url": "x",
             "format": "", "min_height": 8, "min_width": 8,
             "sha256": None, "bytes": None},
            {"name": "gone", "file": "rgb16bit/gone.ppm", "source_url": "x",
             "format": "", "min_height": 8, "min_width": 8,
             "sha256": None, "bytes": None},
        ]
    }
    mpath = tmp_path / "MANIFEST.json"
    mpath.write_text(_json.dumps(manifest))

    # first use: records sha, missing file is non-fatal without --require-all
    assert vb.verify(manifest_path=mpath) == 0
    rec = _json.loads(mpath.read_text())
    assert rec["images"][0]["sha256"] is not None
    assert vb.verify(require_all=True, manifest_path=mpath) == 2

    # enforcement: corrupt the file -> mismatch
    with open(good, "r+b") as f:
        f.seek(64)
        f.write(b"\x00\x01\x02\x03")
    assert vb.verify(manifest_path=mpath) == 1

    # 8-bit file rejected
    with open(good, "wb") as f:
        f.write(b"P6\n16 16\n255\n" + arr.astype(np.uint8).tobytes())
    mpath.write_text(_json.dumps(manifest))
    assert vb.verify(manifest_path=mpath) == 1


def test_synthetic_ood_families():
    """OOD stand-ins (train.init_path=auto stress content): deterministic,
    in range, per-family statistics match their construction — pink has a
    decaying power spectrum, text is near-bimodal high-contrast, noise is
    white."""
    import numpy as np

    from implicit_image_tpu.data import synthetic_ood

    for kind in ("pink", "text", "noise"):
        a = synthetic_ood(kind, 48, 64, seed=1)
        b = synthetic_ood(kind, 48, 64, seed=1)
        assert a.shape == (48, 64, 3) and a.dtype == np.float32
        np.testing.assert_array_equal(a, b)
        assert 0.0 <= a.min() and a.max() <= 1.0
        assert np.abs(a - synthetic_ood(kind, 48, 64, seed=2)).max() > 0.01

    # pink: low-frequency energy dominates (power-law spectrum)
    pink = synthetic_ood("pink", 64, 64, seed=0)[:, :, 0]
    spec = np.abs(np.fft.fft2(pink - pink.mean())) ** 2
    lo = spec[1:4, 1:4].mean()
    hi = spec[28:32, 28:32].mean()
    assert lo > 50 * hi, (lo, hi)

    # noise: flat spectrum by comparison
    noise = synthetic_ood("noise", 64, 64, seed=0)[:, :, 0]
    spec_n = np.abs(np.fft.fft2(noise - noise.mean())) ** 2
    assert spec_n[1:4, 1:4].mean() < 10 * spec_n[28:32, 28:32].mean()

    # text: bimodal (page + ink) => most mass near the two modes
    text = synthetic_ood("text", 64, 64, seed=0)[:, :, 0]
    near_modes = ((np.abs(text - 0.92) < 0.05) | (np.abs(text - 0.08) < 0.05))
    assert near_modes.mean() > 0.95

    import pytest

    with pytest.raises(ValueError, match="unknown OOD kind"):
        synthetic_ood("fractal")
