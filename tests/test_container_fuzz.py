"""Container-corruption fuzzing: hostile bitstreams must fail LOUDLY.

Safety contract for the decode surface (coding/__init__.py,
coding/parsers.py, the native C++ codecs behind ctypes):

  * decompress of a corrupted/truncated container either raises
    ValueError or returns tensors of exactly the manifest's shapes and
    dtypes (value corruption is undetectable for checksum-free backends
    like `plain` — that is inherent to raw storage);
  * no corruption may crash the process, hang, or drive an
    attacker-controlled allocation (a tampered declared-size field in a
    huffman/range/rans header used to size the output buffer — now
    bounded by the manifest's expected payload size, and by a
    body-length expansion bound when no manifest is available);
  * backend streams fed to decode_stream directly (no manifest) raise a
    clean Exception, never a segfault in the native codecs.

The reference has no corrupt-input story at all (its decode
np.frombuffer-walks whatever zstd returns, reference
entropy_coding/__init__.py:123-186); this surface is load-bearing here
because serving decodes untrusted bytes.
"""
from __future__ import annotations

import json
import struct
from collections import OrderedDict
from pathlib import Path

import numpy as np
import pytest

from implicit_image_tpu.coding import (
    compress_state_dict,
    decompress_state_dict,
)
from implicit_image_tpu.coding.parsers import backend_names, decode_stream

BACKENDS = [b for b in backend_names if b != "auto"] + ["auto"]


def _state():
    rng = np.random.default_rng(7)
    labels = rng.integers(0, 256, size=(24, 24)).astype(np.uint8)
    return OrderedDict(
        [
            ("layers.0.weight", rng.normal(size=(2, 24)).astype(np.float32)),
            ("layers.0.bias", rng.normal(size=(24,)).astype(np.float16)),
            ("layers.1.labeled_weight", labels),
            ("layers.1.centroids", rng.normal(size=(256,)).astype(np.float16)),
            ("layers.2.weight", rng.normal(size=(24, 3)).astype(np.float16)),
        ]
    )


@pytest.mark.parametrize("backend", BACKENDS)
def test_truncation_and_flips_fail_loudly(tmp_path, backend):
    state = _state()
    d = tmp_path / backend
    n = compress_state_dict(state, d, backend)
    payload_file = d / "compressed_weights.data"
    good = payload_file.read_bytes()
    assert len(good) == n

    shapes = {
        k.replace("labeled_weight", "weight"): v.shape
        for k, v in state.items()
        if "centroids" not in k
    }

    def attempt():
        try:
            out = decompress_state_dict(d, backend)
        except ValueError:
            return  # loud failure: the contract
        # silent value corruption is allowed only at intact structure
        for name, shape in shapes.items():
            assert out[name].shape == shape
            assert out[name].dtype == np.float32

    cuts = sorted({0, 1, 13, len(good) // 4, len(good) // 2, len(good) - 1})
    for k in cuts:
        payload_file.write_bytes(good[:k])
        attempt()
    rng = np.random.default_rng(11)
    for pos in sorted({0, 1, 4, 8, 12, len(good) // 2, len(good) - 1}):
        bad = bytearray(good)
        bad[pos] ^= 1 + int(rng.integers(0, 255))
        payload_file.write_bytes(bytes(bad))
        attempt()
    # appended garbage
    payload_file.write_bytes(good + b"\xaa" * 32)
    attempt()
    # the pristine payload still round-trips after all that
    payload_file.write_bytes(good)
    out = decompress_state_dict(d, backend)
    np.testing.assert_array_equal(
        out["layers.1.weight"],
        np.asarray(state["layers.1.centroids"], np.float32)[
            state["layers.1.labeled_weight"]
        ],
    )


@pytest.mark.parametrize("backend", ["huffman", "range", "rans"])
def test_tampered_declared_size_never_allocates(tmp_path, backend):
    """A corrupt declared-size field (the u64 at offset 4 of the native
    codec headers) must raise ValueError BEFORE sizing the output buffer
    — with a manifest (container decode) and without one (raw backend
    decode), where the body-length expansion bound catches huffman/range
    and the plausibility cap catches rans."""
    state = _state()
    d = tmp_path / backend
    compress_state_dict(state, d, backend)
    payload_file = d / "compressed_weights.data"
    blob = bytearray(payload_file.read_bytes())
    struct.pack_into("<Q", blob, 4, 1 << 50)  # ~1 PB declared
    payload_file.write_bytes(bytes(blob))
    with pytest.raises(ValueError):
        decompress_state_dict(d, backend)
    with pytest.raises(ValueError):
        decode_stream(backend, bytes(blob))


@pytest.mark.parametrize("backend", ["huffman", "range", "rans"])
def test_declared_size_vs_manifest_mismatch(tmp_path, backend):
    """Consistent-looking stream, wrong manifest: grow a tensor's shape
    in meta_data.json — the expected-size check must refuse instead of
    offset-walking garbage."""
    state = _state()
    d = tmp_path / backend
    compress_state_dict(state, d, backend)
    meta = json.loads((d / "meta_data.json").read_text())
    for k, v in meta.items():
        if k != "__meta__" and v["name"] == "layers.0.weight":
            v["shape"] = [64, 64]
    (d / "meta_data.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError):
        decompress_state_dict(d, backend)


@pytest.mark.parametrize("backend", [b for b in BACKENDS if b != "plain"])
def test_random_blob_fuzz_backend_decode(backend):
    """decode_stream on arbitrary bytes (no manifest): any clean
    Exception is acceptable, crashing the process is not. 64 seeded
    random blobs per backend, including ones wearing the right magic."""
    magics = {
        "huffman": b"IIHF",
        "range": b"IIRC",
        "rans": b"IIRA",
    }
    rng = np.random.default_rng(23)
    for trial in range(64):
        size = int(rng.integers(0, 400))
        blob = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        if backend in magics and trial % 2 == 0 and size >= 4:
            blob = magics[backend] + blob[4:]
        try:
            decode_stream(backend, blob)
        except Exception:
            pass  # loud failure of any flavor is fine; surviving is the test


def test_corrupt_manifest_json_raises(tmp_path):
    state = _state()
    d = tmp_path / "m"
    compress_state_dict(state, d, "zstd")
    (d / "meta_data.json").write_text("{not json")
    with pytest.raises(ValueError):  # json.JSONDecodeError is a ValueError
        decompress_state_dict(d, "zstd")


def test_empty_payload_raises(tmp_path):
    state = _state()
    d = tmp_path / "e"
    compress_state_dict(state, d, "auto")
    (d / "compressed_weights.data").write_bytes(b"")
    with pytest.raises(ValueError):
        decompress_state_dict(d, "auto")


def test_progressive_sections_check_expected_size(tmp_path):
    """Format-4 containers validate each section against the manifest."""
    from implicit_image_tpu.coding.progressive import compress_progressive

    rng = np.random.default_rng(5)
    labels = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    state = OrderedDict(
        [
            ("layers.1.labeled_weight", labels),
            ("layers.1.centroids", rng.normal(size=(256,)).astype(np.float16)),
            ("layers.0.weight", rng.normal(size=(2, 16)).astype(np.float32)),
        ]
    )
    d = tmp_path / "prog"
    compress_progressive(state, d, "zstd")
    good = (d / "compressed_weights.data").read_bytes()
    from implicit_image_tpu.coding import read_raw_container

    read_raw_container(d, "zstd")  # pristine round-trip
    meta = json.loads((d / "meta_data.json").read_text())
    nbase = int(meta["__meta__"]["base_bytes"])
    # corrupt the refinement section only (keep base prefix valid)
    (d / "compressed_weights.data").write_bytes(good[: nbase + 3])
    with pytest.raises(ValueError):
        read_raw_container(d, "zstd")
    # base-only decode of the truncated file still works by design
    out = read_raw_container(d, "zstd", base_only=True)
    assert "layers.1.labeled_weight" in out
