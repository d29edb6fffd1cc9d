"""Entropy coding tests: backends, bitstream round trip, decode->render."""
import json
from collections import OrderedDict
import numpy as np
import pytest

import jax

from implicit_image_tpu.coding import (
    compress_state_dict,
    decode_and_render,
    decompress_state_dict,
    linear_state_dict,
    params_from_state_dict,
    sparsity,
)
from implicit_image_tpu.coding.huffman import (
    _py_decode,
    _py_encode,
    huffman_decode,
    huffman_encode,
    native_available,
)
from implicit_image_tpu.coding.parsers import backend_names, decode_stream, encode_stream
from implicit_image_tpu.coding.range_coder import (
    _py_decode as _rc_py_decode,
    _py_encode as _rc_py_encode,
    range_decode,
    range_encode,
)


@pytest.mark.parametrize("name", backend_names)
def test_stream_roundtrip(name):
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 40, size=100_000, dtype=np.uint8).tobytes()
    blob = encode_stream(name, raw)
    assert decode_stream(name, blob) == raw
    if name != "plain":
        assert len(blob) < len(raw)  # skewed data must actually compress


@pytest.mark.parametrize(
    "data",
    [b"", b"x", b"ab" * 500, bytes(range(256)) * 7],
    ids=["empty", "single", "two-sym", "uniform"],
)
def test_huffman_edge_cases(data):
    assert huffman_decode(huffman_encode(data)) == data
    assert _py_decode(_py_encode(data)) == data


def test_huffman_native_python_interop():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 8, size=20_000, dtype=np.uint8).tobytes()
    # each implementation decodes the other's stream
    assert _py_decode(huffman_encode(data)) == data
    assert huffman_decode(_py_encode(data)) == data


@pytest.mark.parametrize(
    "data",
    [b"", b"x", b"ab" * 500, bytes(range(256)) * 7],
    ids=["empty", "single", "two-sym", "uniform"],
)
def test_range_coder_edge_cases(data):
    assert range_decode(range_encode(data)) == data
    assert _rc_py_decode(_rc_py_encode(data)) == data


def test_range_coder_native_python_interop():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 8, size=5_000, dtype=np.uint8).tobytes()
    # each implementation decodes the other's stream bit-identically
    assert _rc_py_decode(range_encode(data)) == data
    assert range_decode(_rc_py_encode(data)) == data
    assert range_encode(data) == _rc_py_encode(data)


@pytest.mark.parametrize(
    "data",
    [b"", b"x", b"ab" * 500, bytes(range(256)) * 7, b"\x00" * 4096],
    ids=["empty", "single", "two-sym", "uniform", "constant"],
)
def test_rans_edge_cases(data):
    from implicit_image_tpu.coding.rans import (
        _py_decode as _ra_py_decode,
        _py_encode as _ra_py_encode,
        rans_decode,
        rans_encode,
    )

    assert rans_decode(rans_encode(data)) == data
    assert _ra_py_decode(_ra_py_encode(data)) == data


def test_rans_native_python_interop():
    from implicit_image_tpu.coding.rans import (
        _py_decode as _ra_py_decode,
        _py_encode as _ra_py_encode,
        rans_decode,
        rans_encode,
    )

    rng = np.random.default_rng(3)
    data = rng.integers(0, 8, size=5_000, dtype=np.uint8).tobytes()
    # each implementation decodes the other's stream bit-identically
    assert _ra_py_decode(rans_encode(data)) == data
    assert rans_decode(_ra_py_encode(data)) == data
    assert rans_encode(data) == _ra_py_encode(data)


def test_rans_rate_beats_huffman_on_skewed_labels():
    """The point of rANS: fractional-bit rate. On a skewed (k-means-label-
    like) distribution the canonical-Huffman integer bit lengths must lose
    to the rANS stream, and rANS must land within ~2% of the empirical
    order-0 entropy floor."""
    from implicit_image_tpu.coding.rans import rans_encode

    rng = np.random.default_rng(4)
    # Zipf-ish 8-symbol alphabet, strongly skewed
    p = np.array([0.55, 0.2, 0.1, 0.06, 0.04, 0.025, 0.015, 0.01])
    data = rng.choice(8, size=200_000, p=p).astype(np.uint8).tobytes()
    freq = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
    q = freq[freq > 0] / len(data)
    h0_bytes = -(q * np.log2(q)).sum() * len(data) / 8
    r = len(rans_encode(data))
    h = len(huffman_encode(data))
    assert r < h
    assert r < h0_bytes * 1.02 + 64


def test_rans_corrupt_blob_raises_valueerror():
    """Corrupt/truncated rans streams raise ValueError (the backends'
    shared contract), never struct.error or a giant allocation."""
    from implicit_image_tpu.coding.rans import rans_decode, rans_encode

    with pytest.raises(ValueError):
        rans_decode(b"IIRA" + b"\x00" * 5)  # truncated header
    with pytest.raises(ValueError):
        rans_decode(b"XXXX" + b"\x00" * 10)  # bad magic
    import struct as _struct

    huge = _struct.pack("<IQH", 0x41524949, 1 << 50, 0)
    with pytest.raises(ValueError):
        rans_decode(huge)  # implausible raw size
    good = bytearray(rans_encode(b"hello world" * 10))
    with pytest.raises(ValueError):
        rans_decode(bytes(good[:20]))  # truncated body/table


def test_auto_backend_tag_order_back_compat():
    """auto-stream tags are burned into written containers: the candidate
    order must stay append-only (zstd,lzma,huffman,range,plain,rans)."""
    from implicit_image_tpu.coding.parsers import _AUTO_ORDER

    assert _AUTO_ORDER[:5] == ("zstd", "lzma", "huffman", "range", "plain")


def test_shuffle_plus_auto_beats_plain_zstd_on_fp16():
    """The headline rate win: byte-plane shuffle + auto backend must encode
    an fp16 weight-like payload strictly smaller than the reference
    protocol (element-interleaved zstd-22)."""
    from implicit_image_tpu.coding import (
        _shuffle_tensor_bytes,
        _unshuffle_tensor_bytes,
    )

    rng = np.random.default_rng(3)
    w = (rng.standard_normal(40_000) * 0.05).astype(np.float16)
    plain_zstd = len(encode_stream("zstd", w.tobytes()))
    shuf = _shuffle_tensor_bytes(w)
    auto_shuf = len(encode_stream("auto", shuf))
    assert auto_shuf < plain_zstd
    # shuffle round-trips exactly
    back = _unshuffle_tensor_bytes(shuf, w.dtype, w.size)
    np.testing.assert_array_equal(back, w)


def test_sparsity_helper():
    assert sparsity(np.asarray([0.0, 1.0, 0.0, 2.0])) == 0.5


@pytest.fixture(scope="module")
def fitted_quantized():
    """One small fitted+quantized model shared by every bitstream test in
    this module — the fit/quant compile dominates wall time on a 1-core
    box, and these tests only read the artifacts."""
    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.quant import QuantConfig
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit
    from implicit_image_tpu.training.quant_phase import quant_finetune

    img = synthetic_image(24, 24, seed=1)
    grid = get_grid(24, 24)
    mdef, mcfg = build_model("siren", depth=4, hidden_size=16)
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=100, log_steps=50), OptimConfig(lr=1e-3),
    )
    qres = quant_finetune(
        res.params, img, mdef, mcfg, grid,
        QuantConfig(bits=4, num_steps=10), OptimConfig(lr=1e-3),
    )
    return mdef, mcfg, img, grid, qres


@pytest.mark.parametrize("stream", ["plain", "zstd", "lzma", "huffman", "range", "auto"])
def test_bitstream_roundtrip_quantized_model(tmp_path, stream, fitted_quantized):
    mdef, mcfg, img, grid, qres = fitted_quantized
    state = linear_state_dict(qres.params, qres.codebooks, half=True)

    # quantized layers store labels + centroids, not weights
    assert "layers.1.labeled_weight" in state
    assert "layers.1.centroids" in state
    assert "layers.1.weight" not in state
    assert state["layers.1.labeled_weight"].dtype == np.uint8
    assert "layers.0.weight" in state  # skipped layer keeps fp weights

    nbytes = compress_state_dict(state, tmp_path / stream, stream)
    assert nbytes > 0
    if stream != "plain":
        raw_bytes = sum(a.nbytes for a in state.values())
        # huffman's 268-byte canonical-lengths header dominates at this tiny
        # model size; it still must stay within header overhead of raw.
        budget = raw_bytes + (300 if stream == "huffman" else 0)
        assert nbytes < budget

    decoded = decompress_state_dict(tmp_path / stream, stream)
    # decoded weight == centroids[labels] in fp16, exactly
    expect = state["layers.1.centroids"][state["layers.1.labeled_weight"]]
    np.testing.assert_array_equal(decoded["layers.1.weight"], expect.astype(np.float32))
    # skipped layers round trip through fp16
    np.testing.assert_array_equal(
        decoded["layers.0.weight"], state["layers.0.weight"].astype(np.float32)
    )


def test_decode_and_render_matches_fp16_params(tmp_path, fitted_quantized):
    mdef, mcfg, img, grid, qres = fitted_quantized
    state = linear_state_dict(qres.params, qres.codebooks, half=True)
    compress_state_dict(state, tmp_path / "zstd", "zstd")

    rendered, stats = decode_and_render(
        tmp_path / "zstd", "zstd", mdef, mcfg, 24, 24
    )
    assert rendered.shape == (24, 24, 3)
    assert stats["mpix_per_s"] > 0

    # render from the fp16-rounded original params for comparison
    params = params_from_state_dict(
        {
            k: v
            for k, v in decompress_state_dict(tmp_path / "zstd", "zstd").items()
        }
    )
    direct = mdef.apply(params, grid, mcfg)
    np.testing.assert_allclose(np.asarray(rendered), np.asarray(direct), atol=1e-5)


def test_half_auto_keeps_unquantized_fp32(tmp_path, fitted_quantized):
    """half='auto' stores unquantized tensors fp32 (closing the decoded-
    PSNR gap the blanket fp16 cast causes at ω₀=50) and centroids fp16;
    the per-tensor dtype manifest round-trips the mix losslessly."""
    mdef, mcfg, img, grid, qres = fitted_quantized
    state = linear_state_dict(qres.params, qres.codebooks, half="auto")
    assert state["layers.0.weight"].dtype == np.float32
    assert state["layers.0.bias"].dtype == np.float32
    assert state["layers.1.centroids"].dtype == np.float16
    assert state["layers.1.labeled_weight"].dtype == np.uint8

    compress_state_dict(state, tmp_path / "mixed", "zstd")
    decoded = decompress_state_dict(tmp_path / "mixed", "zstd")
    # unquantized tensors are bit-exact (no fp16 round trip at all)
    np.testing.assert_array_equal(
        decoded["layers.0.weight"], np.asarray(qres.params[0]["w"], np.float32)
    )
    np.testing.assert_array_equal(
        decoded["layers.0.bias"], np.asarray(qres.params[0]["b"], np.float32)
    )

    # parameter-space error vs the exact params: auto's fp16 cast set is a
    # strict per-tensor subset of half=True's, so its error never exceeds it
    p_auto = params_from_state_dict(decoded)
    state16 = linear_state_dict(qres.params, qres.codebooks, half=True)
    compress_state_dict(state16, tmp_path / "fp16", "zstd")
    p_16 = params_from_state_dict(decompress_state_dict(tmp_path / "fp16", "zstd"))

    def err(p):
        return sum(
            float(np.sum((np.asarray(a[k], np.float64) - np.asarray(e[k], np.float64)) ** 2))
            for a, e in zip(p, qres.params)
            for k in a
        )

    assert err(p_auto) <= err(p_16)
    assert err(p_auto) < err(p_16)  # strictly better: fp32 tensors exist


def test_format3_plane_group_roundtrip(tmp_path):
    """Format-3 (global plane grouping) round-trips bit-exactly for mixed
    dtypes (fp32/fp16/uint8/uint16) and decodes via the same reader that
    handles formats 1/2."""
    from implicit_image_tpu.coding import (
        compress_state_dict,
        read_raw_container,
    )

    rng = np.random.default_rng(0)
    state = OrderedDict([
        ("layers.0.weight", rng.standard_normal((7, 5)).astype(np.float32)),
        ("layers.0.bias", rng.standard_normal((5,)).astype(np.float16)),
        ("layers.1.labeled_weight",
         rng.integers(0, 255, (5, 9)).astype(np.uint8)),
        ("layers.1.centroids",
         rng.standard_normal((256,)).astype(np.float16)),
        ("layers.2.labeled_weight",
         rng.integers(0, 400, (3, 4)).astype(np.uint16)),
        ("layers.2.bias", np.zeros((0,), np.float32)),  # empty tensor
    ])
    for backend in ("zstd", "auto", "plain"):
        d = tmp_path / backend
        compress_state_dict(state, d, backend)
        meta = json.loads((d / "meta_data.json").read_text())
        assert meta["__meta__"]["format"] == 3
        back = read_raw_container(d, backend)
        assert list(back) == list(state)
        for k in state:
            np.testing.assert_array_equal(back[k], state[k], err_msg=k)
            assert back[k].dtype == state[k].dtype


def test_format3_not_larger_than_format2(tmp_path):
    """On a realistic quantized state dict the format-3 layout is never
    larger than format 2 (measured −1.2% mean on real finals streams,
    benchmarks/context_ab.py)."""
    from implicit_image_tpu.coding import compress_state_dict

    rng = np.random.default_rng(1)
    state = OrderedDict()
    for i in range(6):
        labels = rng.integers(0, 255, (128, 128)).astype(np.uint8)
        labels[rng.random((128, 128)) < 0.6] = 0  # sparse
        state[f"layers.{i}.labeled_weight"] = labels
        state[f"layers.{i}.centroids"] = (
            np.sort(rng.standard_normal(256)).astype(np.float16))
        state[f"layers.{i}.bias"] = (
            0.01 * rng.standard_normal(128)).astype(np.float32)
    n3 = compress_state_dict(state, tmp_path / "f3", "auto")
    n2 = compress_state_dict(state, tmp_path / "f2", "auto", plane_group=False)
    assert n3 <= n2, (n3, n2)


def test_format2_streams_still_decode(tmp_path):
    """Back-compat: containers written as format 2 (plane_group=False)
    and format 1 (shuffle=False) decode unchanged."""
    from implicit_image_tpu.coding import (
        compress_state_dict,
        read_raw_container,
    )

    rng = np.random.default_rng(2)
    state = OrderedDict([
        ("layers.0.weight", rng.standard_normal((8, 8)).astype(np.float16)),
        ("layers.0.bias", rng.standard_normal((8,)).astype(np.float32)),
    ])
    for kwargs, fmt in (
        (dict(plane_group=False), 2),
        (dict(shuffle=False), 1),
    ):
        d = tmp_path / f"f{fmt}"
        compress_state_dict(state, d, "zstd", **kwargs)
        meta = json.loads((d / "meta_data.json").read_text())
        assert meta.get("__meta__", {}).get("format", 1) == fmt
        back = read_raw_container(d, "zstd")
        for k in state:
            np.testing.assert_array_equal(back[k], state[k])
