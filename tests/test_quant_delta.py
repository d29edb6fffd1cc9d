"""Delta (residual) quantization against the meta-init artifact.

quant.delta (beyond reference — the reference has no shared-artifact
notion): quantized layers cluster and entropy-code the RESIDUAL
w - offset, where offset is the train.init_path warm-start artifact
(training/metainit.py), which becomes shared encoder/decoder state. The
decode rule is w = (offset + centroids[labels]) * (labels != 0), so
label 0 still means "pruned" exactly (reference decode semantics,
entropy_coding/__init__.py:170-185, keep the labels-carry-the-mask
invariant).
"""
import hashlib
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_image_tpu.models import build_model
from implicit_image_tpu.quant import quantize_weight
from implicit_image_tpu.quant.kmeans import ecvq_refine
from implicit_image_tpu.training.metainit import save_meta_init


def _masked_weight(shape=(24, 24), density=0.5, seed=0):
    w = jax.random.normal(jax.random.PRNGKey(seed), shape)
    mask = (
        jax.random.uniform(jax.random.PRNGKey(seed + 1), shape) < density
    ).astype(w.dtype)
    return w * mask, mask


def test_quantize_weight_delta_decode_rule():
    w, mask = _masked_weight()
    offset = jax.random.normal(jax.random.PRNGKey(7), w.shape) * 0.1
    snapped, book = quantize_weight(w, bits=4, offset=offset)
    labels = np.asarray(book.labels)
    cents = np.asarray(book.centroids)
    m = np.asarray(mask)
    # pruned weights sit on label 0 and decode to exactly zero
    np.testing.assert_array_equal(labels[m == 0], 0)
    np.testing.assert_array_equal(np.asarray(snapped)[m == 0], 0.0)
    # valid weights never take label 0 (labels carry the prune mask)
    assert (labels[m == 1] >= 1).all()
    # the decoder's reconstruction rule reproduces the encoder's snap
    rec = (cents[labels] + np.asarray(offset)) * (labels != 0)
    np.testing.assert_allclose(rec, np.asarray(snapped), atol=1e-6)


def test_quantize_weight_delta_zero_offset_matches_absolute():
    # offset == 0 reduces to the absolute quantizer's geometry: identical
    # codebook and identical assignment EXCEPT that delta mode reserves
    # label 0 for pruned weights (a near-zero valid weight that the
    # absolute path snaps to the 0 centroid goes to its nearest nonzero
    # centroid instead)
    w, _ = _masked_weight(seed=3)
    s_abs, b_abs = quantize_weight(w, bits=4)
    s_del, b_del = quantize_weight(w, bits=4, offset=jnp.zeros_like(w))
    np.testing.assert_allclose(
        np.asarray(b_abs.centroids), np.asarray(b_del.centroids), atol=1e-6
    )
    la, ld = np.asarray(b_abs.labels), np.asarray(b_del.labels)
    diff_ok = (la == 0) & (np.asarray(w) != 0)
    assert ((la == ld) | diff_ok).all()
    np.testing.assert_allclose(
        np.asarray(s_abs)[la == ld], np.asarray(s_del)[la == ld], atol=1e-6
    )


def test_ecvq_delta_keeps_label0_reserved():
    w, mask = _masked_weight(seed=5)
    offset = jax.random.normal(jax.random.PRNGKey(11), w.shape) * 0.05
    _, book = quantize_weight(w, bits=4, offset=offset)
    refined = ecvq_refine(w, book, lam=5.0, iters=4, offset=offset)
    labels = np.asarray(refined.labels)
    m = np.asarray(mask)
    np.testing.assert_array_equal(labels[m == 0], 0)
    # even under a strong rate penalty a valid weight may not move onto
    # label 0 (delta decode derives the mask from labels != 0)
    assert (labels[m == 1] >= 1).all()


def _tiny_artifact(tmp_path, mdef, mcfg, seed=5):
    params = mdef.init(jax.random.PRNGKey(seed), mcfg)
    path = tmp_path / "meta.npz"
    save_meta_init(path, params, mdef.name, mcfg)
    return path, params


def test_delta_container_roundtrip(tmp_path):
    from collections import OrderedDict

    from implicit_image_tpu.coding import (
        compress_state_dict,
        decompress_state_dict,
    )

    mdef, mcfg = build_model(
        "siren", depth=3, hidden_size=16, input_size=2, output_size=3
    )
    art_path, meta_params = _tiny_artifact(tmp_path, mdef, mcfg)
    params = mdef.init(jax.random.PRNGKey(1), mcfg)

    i = 1  # quantize the middle layer against the artifact offset
    offset = meta_params[i]["w"]
    snapped, book = quantize_weight(params[i]["w"], bits=4, offset=offset)
    labels = np.asarray(book.labels).astype(np.uint8)
    state = OrderedDict()
    state["layers.0.weight"] = np.asarray(params[0]["w"], np.float32)
    state[f"layers.{i}.labeled_weight"] = labels
    state[f"layers.{i}.centroids"] = np.asarray(book.centroids, np.float32)
    state["layers.2.weight"] = np.asarray(params[2]["w"], np.float32)

    info = {
        "artifact": str(art_path),
        "sha256": hashlib.sha256(art_path.read_bytes()).hexdigest(),
        "layers": [i],
    }
    out = tmp_path / "stream"
    compress_state_dict(state, out, "zstd", delta=info)
    dec = decompress_state_dict(out, "zstd")
    np.testing.assert_allclose(
        dec[f"layers.{i}.weight"], np.asarray(snapped), atol=1e-6
    )
    # non-delta layers decode as usual
    np.testing.assert_allclose(
        dec["layers.0.weight"], np.asarray(params[0]["w"]), atol=1e-6
    )

    # a wrong artifact must fail LOUDLY, not decode garbage
    import json

    meta_file = out / "meta_data.json"
    meta = json.loads(meta_file.read_text())
    meta["__meta__"]["delta"]["sha256"] = "0" * 64
    meta_file.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="sha256 mismatch"):
        decompress_state_dict(out, "zstd")

    # a missing artifact fails with the search list; an explicit
    # delta_artifact override resolves it
    meta = json.loads(meta_file.read_text())
    meta["__meta__"]["delta"]["sha256"] = info["sha256"]
    meta["__meta__"]["delta"]["artifact"] = "does/not/exist.npz"
    meta_file.write_text(json.dumps(meta))
    with pytest.raises(FileNotFoundError, match="delta artifact"):
        decompress_state_dict(out, "zstd")
    dec2 = decompress_state_dict(out, "zstd", delta_artifact=art_path)
    np.testing.assert_allclose(
        dec2[f"layers.{i}.weight"], np.asarray(snapped), atol=1e-6
    )


def test_delta_end_to_end_cli(tmp_path):
    """compress.py with quant.delta=true: the run directory decodes
    through the standard decode CLI path and the decoded image matches
    the quant-phase quality (the container genuinely carries residual
    codebooks + the artifact reference)."""
    import json

    from implicit_image_tpu.compress import main as compress_main
    from implicit_image_tpu.config import compose
    from implicit_image_tpu.decompress import decode_run

    mdef, mcfg = build_model(
        "siren", depth=3, hidden_size=16, input_size=2, output_size=3
    )
    art_path, _ = _tiny_artifact(tmp_path, mdef, mcfg)

    overrides = [
        "img=synthetic", "img.height=24", "img.width=24",
        "mlp.depth=3", "mlp.hidden_size=16",
        "train.num_steps=5", "train.log_steps=5",
        "masking=RigL", "masking.density=0.5",
        "quant=kmeans", "quant.bits=4", "quant.num_steps=4",
        "quant.log_steps=4", "quant.delta=true",
        "entropy_coding=zstd",
        f"train.init_path={art_path}",
        f"output_dir={tmp_path}/run",
    ]
    psnr, nbytes = compress_main(compose(overrides))
    assert np.isfinite(psnr) and nbytes > 0

    manifest = json.loads(
        (tmp_path / "run" / "model_quantized" / "meta_data.json").read_text()
    )
    delta = manifest["__meta__"]["delta"]
    assert delta["artifact"] == str(art_path)
    assert len(delta["layers"]) >= 1  # middle layer(s) quantized

    img, stats = decode_run(tmp_path / "run")
    assert img.shape == (24, 24, 3)
    # the summary's Decoded PSNR is the same render the CLI produces
    summary = json.loads((tmp_path / "run" / "summary.json").read_text())
    assert np.isclose(summary["Decoded PSNR"], psnr)

    # --delta-artifact CLI override: with the recorded location gone the
    # decode fails loudly; the override restores it bit-identically
    meta_file = tmp_path / "run" / "model_quantized" / "meta_data.json"
    m = json.loads(meta_file.read_text())
    m["__meta__"]["delta"]["artifact"] = "relocated_away.npz"
    meta_file.write_text(json.dumps(m))
    with pytest.raises(FileNotFoundError, match="delta artifact"):
        decode_run(tmp_path / "run")
    img2, _ = decode_run(tmp_path / "run", delta_artifact=art_path)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))


def test_delta_guards(tmp_path):
    from implicit_image_tpu.compress import main as compress_main
    from implicit_image_tpu.config import compose

    base = [
        "img=synthetic", "img.height=16", "img.width=16",
        "mlp.depth=3", "mlp.hidden_size=8",
        "train.num_steps=2", "train.log_steps=2",
        "masking=none", "entropy_coding=plain",
        f"output_dir={tmp_path}/run",
    ]
    # delta without a warm start has no shared state to code against
    with pytest.raises(ValueError, match="init_path"):
        compress_main(compose(base + [
            "quant=kmeans", "quant.num_steps=2", "quant.delta=true",
        ]))

    # the ladder path needs the artifact too (no silent drop)
    from implicit_image_tpu.parallel.ladder import build_ladder_args

    with pytest.raises(ValueError, match="init_path"):
        build_ladder_args(compose([
            "img=synthetic", "img.height=16", "img.width=16",
            "quant=kmeans", "quant.delta=true",
        ]))


def test_xor_residual_roundtrip_and_rate(tmp_path):
    """apply_xor_residual: bit-exact round trip through the container in
    fp32 AND fp16, and a much smaller stream when tensors sit near the
    reference (the warm-start regime delta mode requires)."""
    from collections import OrderedDict

    from implicit_image_tpu.coding import (
        apply_xor_residual,
        compress_state_dict,
        decompress_state_dict,
    )

    mdef, mcfg = build_model(
        "siren", depth=3, hidden_size=32, input_size=2, output_size=3
    )
    art_path, meta_params = _tiny_artifact(tmp_path, mdef, mcfg)
    rng = np.random.default_rng(0)

    for fdtype in (np.float32, np.float16):
        state = OrderedDict()
        ref_map = {}
        for i, layer in enumerate(meta_params):
            for key, cname in (("w", "weight"), ("b", "bias")):
                ref = np.asarray(layer[key], np.float32)
                name = f"layers.{i}.{cname}"
                ref_map[name] = ref
                state[name] = (
                    ref * (1.0 + rng.normal(0, 1e-4, ref.shape))
                ).astype(fdtype)
        orig = OrderedDict((k, v.copy()) for k, v in state.items())

        xstate, names = apply_xor_residual(state, ref_map)
        assert set(names) == set(state.keys())
        info = {
            "artifact": str(art_path),
            "sha256": hashlib.sha256(art_path.read_bytes()).hexdigest(),
            "layers": [], "xor": names,
        }
        out = tmp_path / f"xor_{fdtype.__name__}"
        nb_xor = compress_state_dict(xstate, out, "zstd", delta=info)
        dec = decompress_state_dict(out, "zstd")
        for k in orig:
            # bit-exact (XOR is its own inverse; no re-rounding)
            np.testing.assert_array_equal(
                dec[k].astype(fdtype).view(np.uint8),
                orig[k].view(np.uint8),
            )

        nb_abs = compress_state_dict(
            orig, tmp_path / f"abs_{fdtype.__name__}", "zstd"
        )
        # near-reference tensors: the XOR stream must be clearly smaller
        assert nb_xor < 0.9 * nb_abs, (nb_xor, nb_abs)


def _delta_cli_base(tmp_path, art_path):
    return [
        "img=synthetic", "img.height=24", "img.width=24",
        "mlp.depth=3", "mlp.hidden_size=16",
        "train.num_steps=6", "train.log_steps=6",
        "masking=RigL", "masking.density=0.5",
        "quant=kmeans", "quant.bits=4", "quant.num_steps=4",
        "quant.log_steps=4", "quant.delta=true",
        "entropy_coding=zstd",
        f"train.init_path={art_path}",
        f"output_dir={tmp_path}/out",
    ]


def test_delta_through_ladder(tmp_path):
    """quant.delta rides the one-compile ladder: every member's manifest
    records the shared artifact and the member decodes through the
    standard chain (residual reconstruction)."""
    import json

    from implicit_image_tpu.config import compose
    from implicit_image_tpu.parallel.ladder import (
        build_ladder_args,
        ladder_compress,
    )

    mdef, mcfg = build_model(
        "siren", depth=3, hidden_size=16, input_size=2, output_size=3
    )
    art_path, _ = _tiny_artifact(tmp_path, mdef, mcfg)
    cfg = compose(_delta_cli_base(tmp_path, art_path))
    args = build_ladder_args(cfg)
    assert args["delta_info"] is not None
    assert args["delta_info"]["artifact"] == str(art_path)

    import jax as _jax

    results = ladder_compress(
        _jax.random.PRNGKey(0), args["mdef"], args["mcfg"], args["grid"],
        args["img"], args["train_cfg"], args["optim_cfg"], args["masking"],
        [0.4, 0.6], quant_cfg=args["quant_cfg"],
        stream_name=args["stream_name"],
        stream_root=str(tmp_path / "ladder"), half=args["half"],
        coding_kwargs=args["coding_kwargs"],
        init_params=args["init_params"], delta_info=args["delta_info"],
    )
    assert len(results) == 2
    for d, r in zip([0.4, 0.6], results):
        assert np.isfinite(r.decoded_psnr) and r.compressed_bytes > 0
        m = json.loads(
            (tmp_path / "ladder" / f"d{d}" / "model_quantized" /
             "meta_data.json").read_text()
        )
        delta = m["__meta__"]["delta"]
        assert delta["artifact"] == str(art_path)
        assert len(delta["layers"]) >= 1


def test_delta_through_batched_fleet(tmp_path):
    """delta_info on batched_compress: every lane codes residuals against
    the one shared artifact."""
    import json

    import jax as _jax

    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.parallel.pipeline import batched_compress
    from implicit_image_tpu.quant import QuantConfig
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig

    mdef, mcfg = build_model(
        "siren", depth=3, hidden_size=16, input_size=2, output_size=3
    )
    art_path, meta_params = _tiny_artifact(tmp_path, mdef, mcfg)
    import hashlib

    info = {
        "artifact": str(art_path),
        "sha256": hashlib.sha256(art_path.read_bytes()).hexdigest(),
    }
    imgs = np.stack([synthetic_image(16, 16, seed=s) for s in (0, 1)])
    grid = get_grid(16, 16)
    results = batched_compress(
        _jax.random.PRNGKey(0), mdef, mcfg, grid, imgs,
        TrainConfig(num_steps=4, log_steps=4), OptimConfig(),
        quant_cfg=QuantConfig(name="KMeans", bits=4, num_steps=3,
                              log_steps=3),
        stream_root=str(tmp_path / "fleet"),
        init_params=meta_params, delta_info=info,
    )
    assert len(results) == 2
    for r in results:
        assert np.isfinite(r.decoded_psnr)
        m = json.loads(
            (Path(r.stream_dir) / "meta_data.json").read_text()
        )
        assert m["__meta__"]["delta"]["artifact"] == str(art_path)

    # guard: delta without the shared init is refused
    with pytest.raises(ValueError, match="init_params"):
        batched_compress(
            _jax.random.PRNGKey(0), mdef, mcfg, grid, imgs,
            TrainConfig(num_steps=2, log_steps=2), OptimConfig(),
            quant_cfg=QuantConfig(name="KMeans", bits=4, num_steps=2,
                                  log_steps=2),
            stream_root=str(tmp_path / "fleet2"), delta_info=info,
        )
