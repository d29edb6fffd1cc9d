"""Single-file .iic container (coding/container_file.py)."""
import json
from pathlib import Path

import numpy as np
import pytest

import implicit_image_tpu as iit
from implicit_image_tpu.coding.container_file import (
    is_packed_container,
    pack_run,
    unpack_run,
)
from implicit_image_tpu.data import synthetic_image

FAST = [
    "mlp.depth=3", "mlp.hidden_size=16",
    "train.num_steps=30", "train.log_steps=30",
    "quant=kmeans", "quant.bits=4", "quant.num_steps=4", "quant.log_steps=4",
    "entropy_coding=zstd", "masking=none", "logging.use=false",
]


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    root = tmp_path_factory.mktemp("iic")
    img = synthetic_image(20, 20, seed=3)
    res = iit.compress_image(img, overrides=FAST, out_dir=root / "run")
    return img, res, res.save(root / "artifact.iic")


def test_pack_roundtrip_and_file_decode(packed):
    img, res, iic = packed
    assert is_packed_container(iic)
    # the single file decodes identically to the run dir
    from_dir = res.decode()
    from_file = iit.decompress_image(iic)
    np.testing.assert_array_equal(from_dir, from_file)
    # geometry options ride through the packed path
    up = iit.decompress_image(iic, scale=2.0)
    assert up.shape == (40, 40, 3)


def test_pack_is_deterministic(packed, tmp_path):
    _, res, iic = packed
    again = pack_run(res.run_dir, tmp_path / "again.iic")
    assert iic.read_bytes() == again.read_bytes()


def test_unpack_restores_run_dir(packed, tmp_path):
    _, res, iic = packed
    out = unpack_run(iic, tmp_path / "restored")
    for name in ("config.json", "model_quantized/meta_data.json",
                 "model_quantized/compressed_weights.data"):
        assert (out / name).read_bytes() == (res.run_dir / name).read_bytes()


def test_pack_refuses_pframe_and_garbage(packed, tmp_path):
    _, res, _ = packed
    # a P-frame container (inter-frame `prev` link) cannot ship standalone
    import shutil

    broken = tmp_path / "pframe_run"
    shutil.copytree(res.run_dir, broken)
    meta_p = broken / "model_quantized" / "meta_data.json"
    meta = json.loads(meta_p.read_text())
    meta.setdefault("__meta__", {})["delta"] = {
        "prev": "../frame_0000/model_quantized", "sha256": "0" * 64,
        "layers": [1], "xor": [],
    }
    meta_p.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="inter-frame"):
        pack_run(broken)
    # not-a-container inputs fail loudly
    junk = tmp_path / "junk.iic"
    junk.write_bytes(b"not a zip")
    assert not is_packed_container(junk)
    with pytest.raises(ValueError, match="not a packed"):
        unpack_run(junk)
    with pytest.raises(FileNotFoundError, match="missing"):
        pack_run(tmp_path / "nope")


def test_container_cli(packed, tmp_path, capsys):
    from implicit_image_tpu.coding.container_file import main

    _, res, _ = packed
    out = tmp_path / "cli.iic"
    main(["pack", str(res.run_dir), str(out)])
    assert out.exists() and "packed" in capsys.readouterr().out
    main(["unpack", str(out), str(tmp_path / "cli_dir")])
    assert (tmp_path / "cli_dir" / "config.json").exists()
    with pytest.raises(SystemExit, match="usage"):
        main([])
