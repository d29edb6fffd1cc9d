"""Fleet encode CLI (fleet.py) — many images, one compiled program."""
import json

import numpy as np
import pytest

from implicit_image_tpu.fleet import run as fleet_run


def _overrides(tmp_path, extra=()):
    return [
        "img=synthetic", "img.height=24", "img.width=24",
        "mlp.depth=3", "mlp.hidden_size=16",
        "train.num_steps=6", "train.log_steps=6",
        "masking=RigL", "masking.density=0.5",
        "masking.interval=3", "masking.end_when=4",
        "quant=kmeans", "quant.num_steps=2", "quant.log_steps=2",
        "entropy_coding=plain",
        f"output_dir={tmp_path}", "exp_name=t",
        *extra,
    ]


def test_fleet_writes_decodable_run_dirs(tmp_path):
    out = fleet_run(_overrides(
        tmp_path, ["fleet.images=alpha,beta"]
    ))
    assert [n for n, _, _ in out] == ["alpha", "beta"]
    from implicit_image_tpu.decompress import decode_run

    for name, psnr, nbytes in out:
        assert np.isfinite(psnr) and nbytes > 0
        run_dir = tmp_path / "fleet_t" / name
        cfg = json.loads((run_dir / "config.json").read_text())
        assert cfg["img"]["name"] == name
        assert (run_dir / "model_quantized").is_dir()
        img, _ = decode_run(str(run_dir))
        assert img.shape == (24, 24, 3)
    # the two members are different images -> different streams
    assert out[0][1] != out[1][1]


def test_fleet_requires_images(tmp_path):
    with pytest.raises(ValueError, match="fleet.images"):
        fleet_run(_overrides(tmp_path))


def test_fleet_dense_and_warm_start(tmp_path):
    import jax

    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.metainit import save_meta_init

    mdef, mcfg = build_model(
        "siren", depth=3, hidden_size=16, input_size=2, output_size=3
    )
    meta = mdef.init(jax.random.PRNGKey(0), mcfg)
    path = tmp_path / "meta.npz"
    save_meta_init(path, meta, mdef.name, mcfg)

    out = fleet_run(_overrides(tmp_path, [
        "fleet.images=gamma", "masking=none", f"train.init_path={path}",
    ]))
    assert len(out) == 1 and np.isfinite(out[0][1])
