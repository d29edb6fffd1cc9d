"""Programmatic API (api.py) — in-process compress/decompress.

The CLI surface is config-tree driven (reference compress.py:52-54 is a
Hydra entry point); compress_image/decompress_image wrap the same
orchestrator for library users with zero new options schema.
"""
import numpy as np
import pytest

import implicit_image_tpu as iit
from implicit_image_tpu.data import synthetic_image

FAST = [
    "mlp.depth=3", "mlp.hidden_size=16",
    "train.num_steps=30", "train.log_steps=30",
    "quant=kmeans", "quant.bits=4", "quant.num_steps=4", "quant.log_steps=4",
    "entropy_coding=zstd", "masking=none", "logging.use=false",
]


def test_compress_image_array_roundtrip(tmp_path):
    img = synthetic_image(24, 24, seed=0)
    res = iit.compress_image(img, overrides=FAST, out_dir=tmp_path / "run")
    assert res.nbytes > 0 and np.isfinite(res.psnr)
    assert (res.run_dir / "model_quantized" / "compressed_weights.data").is_file()
    assert res.bitstream[:1]  # raw payload accessor
    dec = res.decode()
    assert dec.shape == (24, 24, 3) and dec.dtype == np.float32
    # returned PSNR is the decoded-from-container headline the CLI reports
    mse = float(np.mean((dec - img) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert abs(psnr - res.psnr) < 0.05
    # resolution-free decode rides through
    up = res.decode(scale=2.0)
    assert up.shape == (48, 48, 3)


def test_compress_image_path_input(tmp_path):
    from implicit_image_tpu.data import save_img

    img = synthetic_image(20, 20, seed=1)
    src = tmp_path / "src.png"
    save_img(str(src), img)
    res = iit.compress_image(
        src,
        overrides=FAST + ["img.height=20", "img.width=20"],
        out_dir=tmp_path / "run",
    )
    assert res.decode().shape == (20, 20, 3)


def test_compress_image_input_validation(tmp_path):
    with pytest.raises(ValueError, match=r"\(H, W, 3\)"):
        iit.compress_image(np.zeros((8, 8)), out_dir=tmp_path)
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        iit.compress_image(
            np.full((8, 8, 3), 2.0, np.float32), out_dir=tmp_path
        )
    with pytest.raises(ValueError, match="entropy_coding"):
        iit.compress_image(
            synthetic_image(8, 8, seed=0),
            overrides=["entropy_coding=none"],
            out_dir=tmp_path,
        )


def test_compress_image_nan_rejected(tmp_path):
    img = synthetic_image(8, 8, seed=0).copy()
    img[0, 0, 0] = np.nan
    with pytest.raises(ValueError, match="NaN"):
        iit.compress_image(img, out_dir=tmp_path / "x")


def test_compress_image_unique_default_dirs(tmp_path, monkeypatch):
    """Successive calls without out_dir must not overwrite each other."""
    monkeypatch.chdir(tmp_path)
    img = synthetic_image(12, 12, seed=0)
    r1 = iit.compress_image(img, overrides=FAST)
    r2 = iit.compress_image(img, overrides=FAST)
    assert r1.run_dir != r2.run_dir
    assert r1.run_dir.exists() and r2.run_dir.exists()


def test_compress_image_output_dir_override_wins(tmp_path):
    """'output_dir=' in overrides is a standard dotted override — it must
    beat the out_dir parameter (docstring contract)."""
    img = synthetic_image(12, 12, seed=0)
    want = tmp_path / "explicit"
    res = iit.compress_image(
        img, overrides=FAST + [f"output_dir={want}"],
        out_dir=tmp_path / "ignored",
    )
    assert res.run_dir == want and want.exists()
    assert not (tmp_path / "ignored").exists()


def test_compress_images_fleet(tmp_path):
    """B same-shape arrays -> one vmapped program -> B decodable run dirs
    (fleet.encode_fleet under the hood)."""
    imgs = [synthetic_image(16, 16, seed=s) for s in (0, 1, 2)]
    res = iit.compress_images(
        imgs, overrides=FAST, out_dir=tmp_path / "fleet",
        names=["a", "b", "c"],
    )
    assert [r.run_dir.name for r in res] == ["a", "b", "c"]
    for r, src in zip(res, imgs):
        dec = r.decode()
        assert dec.shape == (16, 16, 3)
        mse = float(np.mean((dec - src) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        # each member decodes to ITS OWN image at the reported quality
        assert abs(psnr - r.psnr) < 0.05


def test_compress_images_validation(tmp_path):
    ok = synthetic_image(16, 16, seed=0)
    with pytest.raises(ValueError, match="share one shape"):
        iit.compress_images(
            [ok, synthetic_image(8, 8, seed=0)], out_dir=tmp_path
        )
    with pytest.raises(ValueError, match="at least one"):
        iit.compress_images([], out_dir=tmp_path)
    with pytest.raises(ValueError, match="unique"):
        iit.compress_images([ok, ok], names=["x", "x"], out_dir=tmp_path)
    with pytest.raises(ValueError, match="2 names"):
        iit.compress_images([ok], names=["x", "y"], out_dir=tmp_path)
