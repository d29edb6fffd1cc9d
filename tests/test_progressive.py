"""Progressive (format-4) container — coding/progressive.py.

The reference container is all-or-nothing; format 4 makes a PREFIX of
the stream decode standalone at base quality while the full stream stays
bit-exact to the non-progressive decode (VQ-rank nesting over the sorted
scalar codebooks).
"""
import json
from collections import OrderedDict
from pathlib import Path

import numpy as np
import pytest

from implicit_image_tpu.coding import (
    compress_state_dict,
    decompress_state_dict,
)
from implicit_image_tpu.coding.progressive import (
    base_bytes,
    compress_progressive,
    read_progressive,
)


def _vq_state(seed=0, k=256, n=4096):
    """A realistic mixed state dict: one flat-VQ uint8 label tensor, one
    unquantized fp tensor, one bias."""
    rng = np.random.default_rng(seed)
    centroids = np.sort(rng.normal(size=k).astype(np.float16))
    rng.shuffle(centroids)  # unsorted on purpose — encode must sort
    labels = rng.integers(0, k, size=(64, n // 64), dtype=np.uint8)
    return OrderedDict([
        ("layers.0.weight", rng.normal(size=(2, 16)).astype(np.float32)),
        ("layers.1.labeled_weight", labels),
        ("layers.1.centroids", centroids),
        ("layers.1.bias", rng.normal(size=16).astype(np.float16)),
    ])


def test_full_decode_bit_exact_vs_nonprogressive(tmp_path):
    state = _vq_state()
    d_prog, d_flat = tmp_path / "prog", tmp_path / "flat"
    total = compress_progressive(state, d_prog, "zstd")
    compress_state_dict(state, d_flat, "zstd")

    full = decompress_state_dict(d_prog, "zstd")
    ref = decompress_state_dict(d_flat, "zstd")
    assert set(full) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(full[k], ref[k])
    assert 0 < base_bytes(d_prog) < total


def test_base_decode_from_physically_truncated_file(tmp_path):
    state = _vq_state()
    d = tmp_path / "prog"
    compress_progressive(state, d, "zstd")
    nbase = base_bytes(d)

    # hard-truncate the payload to the base prefix — a client that fetched
    # only the first nbase bytes must still decode
    payload = (d / "compressed_weights.data").read_bytes()
    (d / "compressed_weights.data").write_bytes(payload[:nbase])

    base = decompress_state_dict(d, "zstd", base_only=True)
    full_centroids = np.sort(_vq_state()["layers.1.centroids"])
    w = base["layers.1.weight"]
    # base weights are the 16-entry run-mean codebook: every decoded value
    # lies within its run's [min, max] of the true sorted codebook
    assert np.unique(w).size <= 16
    assert w.min() >= float(full_centroids[0]) - 1e-6
    assert w.max() <= float(full_centroids[-1]) + 1e-6
    # unquantized tensors are exact in the base layer
    np.testing.assert_array_equal(
        base["layers.0.weight"], _vq_state()["layers.0.weight"]
    )

    # and a full read of the truncated file fails loudly
    with pytest.raises(Exception):
        decompress_state_dict(d, "zstd")


def test_base_quality_monotone(tmp_path):
    """Base reconstruction error is bounded by the run spread: refining
    must strictly reduce the weight-space MSE."""
    state = _vq_state(seed=3)
    d = tmp_path / "prog"
    compress_progressive(state, d, "zstd")
    full = decompress_state_dict(d, "zstd")
    base = decompress_state_dict(d, "zstd", base_only=True)
    labels = state["layers.1.labeled_weight"]
    true_w = state["layers.1.centroids"][labels].astype(np.float64)
    err_base = np.mean((base["layers.1.weight"] - true_w) ** 2)
    err_full = np.mean((full["layers.1.weight"] - true_w) ** 2)
    assert err_full == 0.0
    assert err_base > 0.0


def test_uint16_and_qscale_tensors_stay_unsplit(tmp_path):
    rng = np.random.default_rng(0)
    state = OrderedDict([
        ("layers.0.labeled_weight", rng.integers(0, 300, (8, 8)).astype(np.uint16)),
        ("layers.0.centroids", rng.normal(size=300).astype(np.float16)),
        ("layers.1.labeled_weight", rng.integers(-127, 127, (4, 4)).astype(np.int8)),
        ("layers.1.qscale", rng.random(4).astype(np.float16)),
    ])
    d = tmp_path / "prog"
    compress_progressive(state, d, "zstd")
    meta = json.loads((d / "meta_data.json").read_text())
    secs = {v["name"]: v["sec"] for k, v in meta.items() if k != "__meta__"}
    assert all(s == 0 for s in secs.values())  # everything in the base layer
    full = decompress_state_dict(d, "zstd")
    np.testing.assert_array_equal(
        full["layers.0.weight"],
        state["layers.0.centroids"][state["layers.0.labeled_weight"]],
    )


def test_base_finetune_improves_base_render(tmp_path):
    """The output-distortion finetune of the 16-entry base books lowers
    the base-layer render error with the full stream bit-unchanged."""
    import jax

    from implicit_image_tpu.coding.progressive import _split_entries
    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.quant.base_layer import finetune_base_codebooks
    from implicit_image_tpu.quant import QuantConfig
    from implicit_image_tpu.training.fit import (
        OptimConfig, TrainConfig, fit,
    )
    from implicit_image_tpu.training.quant_phase import make_quant_fit_fn
    from implicit_image_tpu.coding import (
        decompress_state_dict, linear_state_dict, params_from_state_dict,
    )

    mdef, mcfg = build_model(
        "siren", depth=3, hidden_size=16, input_size=2, output_size=3
    )
    grid = get_grid(24, 24)
    img = synthetic_image(24, 24, seed=1, complexity=3)
    res = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
              TrainConfig(num_steps=60, log_steps=60), OptimConfig())
    qfn = jax.jit(make_quant_fit_fn(
        mdef, mcfg, grid, QuantConfig(name="KMeans", bits=8, num_steps=3,
                                      log_steps=3),
        OptimConfig(), None,
    ))
    params_q, codebooks, _ = qfn(res.params, img)
    state = linear_state_dict(params_q, codebooks, half="auto")

    def base_mse(base_ft):
        d = tmp_path / ("ft" if base_ft else "plain")
        compress_progressive(dict(state), d, "zstd", base_finetune=base_ft)
        dec = decompress_state_dict(d, "zstd", base_only=True)
        pred = np.asarray(mdef.apply(
            params_from_state_dict(dec), grid, mcfg, None
        ))
        return float(np.mean((pred - img) ** 2))

    ft = lambda entries: finetune_base_codebooks(mdef, mcfg, grid, img,
                                                 entries, steps=60)
    assert base_mse(ft) < base_mse(None)

    # full decode identical with and without the base finetune
    full_a = decompress_state_dict(tmp_path / "ft", "zstd")
    full_b = decompress_state_dict(tmp_path / "plain", "zstd")
    for k in full_a:
        np.testing.assert_array_equal(full_a[k], full_b[k])


def test_ladder_args_do_not_leak_container_policy_keys():
    """entropy_coding.progressive/base_finetune must not reach
    encode_stream through the ladder/fleet coding kwargs."""
    from implicit_image_tpu.config import compose
    from implicit_image_tpu.parallel.ladder import build_ladder_args

    cfg = compose([
        "img=synthetic", "img.height=16", "img.width=16",
        "mlp.depth=3", "mlp.hidden_size=8",
        "entropy_coding=zstd", "entropy_coding.progressive=true",
        "entropy_coding.base_finetune=false",
    ])
    args = build_ladder_args(cfg)
    assert "progressive" not in args["coding_kwargs"]
    assert "base_finetune" not in args["coding_kwargs"]


def test_base_finetune_validation(tmp_path):
    state = _vq_state()
    with pytest.raises(ValueError, match="base_centroids"):
        compress_progressive(
            state, tmp_path / "x", "zstd",
            base_finetune=lambda e: {"layers.1.labels_hi": np.zeros(3)},
        )
    with pytest.raises(ValueError, match="shape"):
        compress_progressive(
            state, tmp_path / "y", "zstd",
            base_finetune=lambda e: {
                "layers.1.base_centroids": np.zeros(3, np.float16)
            },
        )


def test_cli_progressive_round_trip(tmp_path):
    """entropy_coding.progressive=true end-to-end: compress, decoded PSNR
    finite, --base CLI decode renders from the prefix."""
    from implicit_image_tpu.compress import main as compress_main
    from implicit_image_tpu.config import compose
    from implicit_image_tpu.decompress import decode_run

    run = tmp_path / "run"
    psnr, nbytes = compress_main(compose([
        "img=synthetic", "img.height=24", "img.width=24",
        "mlp.depth=3", "mlp.hidden_size=16",
        "train.num_steps=20", "train.log_steps=20",
        "masking=none", "quant=kmeans", "quant.num_steps=2",
        "quant.log_steps=2",
        "entropy_coding=zstd", "entropy_coding.progressive=true",
        f"output_dir={run}",
    ]))
    assert np.isfinite(psnr) and nbytes > 0
    meta = json.loads((run / "model_quantized" / "meta_data.json").read_text())
    assert meta["__meta__"]["format"] == 4

    img_full, _ = decode_run(str(run))
    img_base, stats = decode_run(str(run), base=True)
    assert img_base.shape == img_full.shape
    assert stats["out"].endswith("decoded_base.png")
    # refinement must change the render (the base layer is coarser)
    assert not np.allclose(img_base, img_full)


# ---- delta + progressive (VERDICT r3 item 5) ----

def _delta_problem(tmp_path):
    """A sparse delta-quantized layer + artifact, the real quant path."""
    import hashlib

    import jax

    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.quant import quantize_weight
    from implicit_image_tpu.training.metainit import save_meta_init

    mdef, mcfg = build_model(
        "siren", depth=3, hidden_size=16, input_size=2, output_size=3
    )
    meta_params = mdef.init(jax.random.PRNGKey(5), mcfg)
    art_path = tmp_path / "meta.npz"
    save_meta_init(art_path, meta_params, mdef.name, mcfg)
    params = mdef.init(jax.random.PRNGKey(1), mcfg)

    i = 1
    rng = np.random.default_rng(0)
    w = np.asarray(params[i]["w"]).copy()
    w[rng.random(w.shape) < 0.4] = 0.0  # pruned positions (label 0)
    offset = meta_params[i]["w"]
    snapped, book = quantize_weight(w, bits=8, offset=offset)
    labels = np.asarray(book.labels).astype(np.uint8)
    assert (labels == 0).any() and (labels != 0).any()

    state = OrderedDict([
        ("layers.0.weight", np.asarray(params[0]["w"], np.float32)),
        (f"layers.{i}.labeled_weight", labels),
        (f"layers.{i}.centroids", np.asarray(book.centroids, np.float32)),
        ("layers.2.weight", np.asarray(params[2]["w"], np.float32)),
    ])
    info = {
        "artifact": str(art_path),
        "sha256": hashlib.sha256(art_path.read_bytes()).hexdigest(),
        "layers": [i],
    }
    return state, info, np.asarray(snapped), labels


def test_delta_progressive_full_decode_bit_exact(tmp_path):
    """A progressive DELTA container's full decode equals the flat delta
    container's bit-for-bit: the pinned rank permutation keeps `labels
    != 0` meaning pruned, so offsets + masking reconstruct identically."""
    state, info, snapped, labels = _delta_problem(tmp_path)
    d_prog, d_flat = tmp_path / "prog", tmp_path / "flat"
    compress_progressive(state, d_prog, "zstd", delta=dict(info))
    compress_state_dict(state, d_flat, "zstd", delta=dict(info))

    dec_p = decompress_state_dict(d_prog, "zstd")
    dec_f = decompress_state_dict(d_flat, "zstd")
    assert set(dec_p) == set(dec_f)
    for name in dec_f:
        np.testing.assert_array_equal(dec_p[name], dec_f[name])
    np.testing.assert_allclose(dec_p["layers.1.weight"], snapped, atol=1e-6)
    # pruned positions are EXACT zeros
    assert (dec_p["layers.1.weight"][labels == 0] == 0.0).all()


def test_delta_progressive_base_prefix(tmp_path):
    """The base prefix of a delta stream decodes STANDALONE (physically
    truncated file): pruned weights stay exact zeros (rank 0 pinned),
    non-pruned weights approximate offset + 16-entry residual book."""
    state, info, snapped, labels = _delta_problem(tmp_path)
    d = tmp_path / "prog"
    total = compress_progressive(state, d, "zstd", delta=dict(info))
    nbase = base_bytes(d)
    assert 0 < nbase < total

    # physically truncate to the base prefix
    blob = (d / "compressed_weights.data").read_bytes()
    (d / "compressed_weights.data").write_bytes(blob[:nbase])
    dec_b = decompress_state_dict(d, "zstd", base_only=True)
    wb = dec_b["layers.1.weight"]
    assert np.isfinite(wb).all()
    # pruned exact at base quality; group-0 non-pruned also zero (the
    # documented base cost of a delta stream)
    assert (wb[labels == 0] == 0.0).all()
    # base approximates the full-quality weights (same scale, correlated)
    nz = (wb != 0) & (snapped != 0)
    assert nz.sum() > 0.5 * (snapped != 0).sum()
    corr = np.corrcoef(wb[nz], snapped[nz])[0, 1]
    assert corr > 0.9, corr


def test_cli_delta_progressive_round_trip(tmp_path):
    """compress.py with quant.delta=true AND entropy_coding.progressive:
    the flagship residual stream gains a standalone base layer; full
    decode matches the summary, base decode renders finite and worse-or-
    equal quality."""
    import jax

    from implicit_image_tpu.compress import main as compress_main
    from implicit_image_tpu.config import compose
    from implicit_image_tpu.decompress import decode_run
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.metainit import save_meta_init

    mdef, mcfg = build_model(
        "siren", depth=3, hidden_size=16, input_size=2, output_size=3
    )
    meta_params = mdef.init(jax.random.PRNGKey(5), mcfg)
    art_path = tmp_path / "meta.npz"
    save_meta_init(art_path, meta_params, mdef.name, mcfg)

    overrides = [
        "img=synthetic", "img.height=24", "img.width=24",
        "mlp.depth=3", "mlp.hidden_size=16",
        "train.num_steps=5", "train.log_steps=5",
        "masking=RigL", "masking.density=0.5",
        "quant=kmeans", "quant.bits=8", "quant.num_steps=4",
        "quant.log_steps=4", "quant.delta=true",
        "entropy_coding=zstd", "entropy_coding.progressive=true",
        f"train.init_path={art_path}",
        f"output_dir={tmp_path}/run",
    ]
    psnr, nbytes = compress_main(compose(overrides))
    assert np.isfinite(psnr) and nbytes > 0

    manifest = json.loads(
        (tmp_path / "run" / "model_quantized" / "meta_data.json").read_text()
    )
    hdr = manifest["__meta__"]
    assert hdr["format"] == 4 and "delta" in hdr
    assert 0 < hdr["base_bytes"] < nbytes

    img_full, _ = decode_run(tmp_path / "run")
    summary = json.loads((tmp_path / "run" / "summary.json").read_text())
    assert np.isclose(summary["Decoded PSNR"], psnr)

    img_base, _ = decode_run(tmp_path / "run", base=True)
    assert img_base.shape == img_full.shape
    assert np.isfinite(np.asarray(img_base)).all()


def test_legacy_container_without_ctx_lo_flag_decodes(tmp_path):
    """Pre-r5 format-4 containers stored the lo plane UNGROUPED and have
    no "ctx_lo" header flag; the reader must decode them unchanged."""
    from implicit_image_tpu.coding import _plane_group_payload
    from implicit_image_tpu.coding.parsers import encode_stream

    state = _vq_state(seed=7)
    book = state["layers.1.centroids"]
    labels = state["layers.1.labeled_weight"]
    order = np.argsort(book, kind="stable")
    rank_of = np.empty(book.size, np.uint8)
    rank_of[order] = np.arange(book.size, dtype=np.uint8)
    ranks = rank_of[labels]
    sorted_book = np.ascontiguousarray(book[order])
    counts = np.bincount(ranks.reshape(-1), minlength=book.size)
    base_book = np.empty(16, book.dtype)
    for g in range(16):
        c = counts[g * 16:(g + 1) * 16].astype(np.float64)
        v = sorted_book[g * 16:(g + 1) * 16].astype(np.float64)
        base_book[g] = (v * c).sum() / c.sum() if c.sum() else v.mean()

    base = OrderedDict([
        ("layers.0.weight", state["layers.0.weight"]),
        ("layers.1.labels_hi", (ranks >> 4).astype(np.uint8)),
        ("layers.1.base_centroids", base_book),
        ("layers.1.bias", state["layers.1.bias"]),
    ])
    refine = OrderedDict([
        ("layers.1.labels_lo", (ranks & 15).astype(np.uint8)),  # UNGROUPED
        ("layers.1.centroids", sorted_book),
    ])
    meta, order_i = OrderedDict(), 0
    for sec, entries in ((0, base), (1, refine)):
        for name, arr in entries.items():
            meta[str(order_i)] = {"shape": list(arr.shape),
                                  "dtype": str(arr.dtype),
                                  "name": name, "sec": sec}
            order_i += 1
    base_blob = encode_stream("zstd", _plane_group_payload(list(base.values())))
    refine_blob = encode_stream(
        "zstd", _plane_group_payload(list(refine.values())))
    meta["__meta__"] = {"format": 4, "plane_group": True, "shuffle": True,
                        "base_bytes": len(base_blob)}  # no ctx_lo: legacy
    d = tmp_path / "legacy"
    d.mkdir()
    (d / "compressed_weights.data").write_bytes(base_blob + refine_blob)
    (d / "meta_data.json").write_text(json.dumps(meta, indent=2,
                                                 sort_keys=True))

    full = read_progressive(d, "zstd")
    np.testing.assert_array_equal(full["layers.1.labeled_weight"], ranks)
    np.testing.assert_array_equal(
        full["layers.1.centroids"][full["layers.1.labeled_weight"]],
        book[labels],
    )


def test_ctx_lo_grouping_round_trips_peaked_labels(tmp_path):
    """A peaked (delta-like) label distribution round-trips bit-exactly
    through the grouped lo plane and the container carries the flag."""
    rng = np.random.default_rng(11)
    k = 256
    centroids = rng.normal(size=k).astype(np.float16)
    # peaked ranks: most mass in a few groups, like residual codebooks
    labels = np.clip(
        rng.normal(64, 12, size=(128, 64)), 0, k - 1
    ).astype(np.uint8)
    state = OrderedDict([
        ("layers.1.labeled_weight", labels),
        ("layers.1.centroids", centroids),
    ])
    d = tmp_path / "prog"
    compress_progressive(state, d, "zstd")
    meta = json.loads((d / "meta_data.json").read_text())
    assert meta["__meta__"].get("ctx_lo") is True
    full = read_progressive(d, "zstd")
    np.testing.assert_array_equal(
        full["layers.1.centroids"][full["layers.1.labeled_weight"]],
        centroids[labels],
    )
