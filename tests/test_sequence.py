"""Sequence (video) inter-frame compression — sequence.py.

Beyond reference (the reference is single-image only, SURVEY.md §1):
frame 0 is an I-frame (standard protocol), later frames warm-start from
the previous frame's DECODED params and delta-code residual codebooks
against them; the container manifest records the previous frame + its
payload sha256 (coding/__init__.py `prev` delta mode).
"""
import json
from pathlib import Path

import numpy as np
import pytest

from implicit_image_tpu.data import synthetic_video
from implicit_image_tpu.sequence import decode_sequence, encode_sequence

SEQ_OVERRIDES = [
    "img=synthetic", "img.height=24", "img.width=24",
    "mlp.depth=3", "mlp.hidden_size=16",
    "train.num_steps=20", "train.log_steps=20",
    "quant=kmeans", "quant.bits=4", "quant.num_steps=4", "quant.log_steps=4",
    "entropy_coding=zstd",
    "sequence.video=unittest", "sequence.frames=3",
    "sequence.steps0=20", "sequence.steps=6",
]


def test_synthetic_video_shape_range_determinism():
    v1 = synthetic_video(16, 20, frames=4, seed=3)
    v2 = synthetic_video(16, 20, frames=4, seed=3)
    assert v1.shape == (4, 16, 20, 3)
    assert v1.min() >= 0.0 and v1.max() <= 1.0
    np.testing.assert_array_equal(v1, v2)
    # a different seed gives different content
    assert np.abs(v1 - synthetic_video(16, 20, frames=4, seed=4)).max() > 0.05


def test_synthetic_video_temporal_coherence():
    v = synthetic_video(32, 32, frames=6, seed=0, motion=0.01)
    consec = np.mean((v[1:] - v[:-1]) ** 2)
    far = np.mean((v[0] - v[5]) ** 2)
    # consecutive frames are much closer than distant ones (real-video-like)
    assert consec < far
    assert consec > 0  # and the sequence actually moves


@pytest.fixture(scope="module")
def encoded_seq(tmp_path_factory):
    root = tmp_path_factory.mktemp("seq")
    results = encode_sequence(
        SEQ_OVERRIDES + [f"output_dir={root}", "masking=none"]
    )
    return Path(root) / "seq_unittest", results


def test_sequence_layout_and_manifest(encoded_seq):
    root, results = encoded_seq
    assert [r["frame"] for r in results] == [
        "frame_0000", "frame_0001", "frame_0002"
    ]
    assert results[0]["kind"] == "I"
    assert all(r["kind"] == "P" for r in results[1:])
    for r in results:
        d = root / r["frame"]
        assert (d / "config.json").is_file()
        assert (d / "summary.json").is_file()
        assert (d / "model_quantized" / "compressed_weights.data").is_file()
    # P-frame manifests record the prev link + payload hash
    m = json.loads(
        (root / "frame_0002" / "model_quantized" / "meta_data.json")
        .read_text()
    )
    delta = m["__meta__"]["delta"]
    assert delta["prev"].endswith("frame_0001/model_quantized")
    assert len(delta["sha256"]) == 64
    assert len(delta["layers"]) >= 1
    # I-frame has no delta entry
    m0 = json.loads(
        (root / "frame_0000" / "model_quantized" / "meta_data.json")
        .read_text()
    )
    assert "delta" not in m0.get("__meta__", {})


def test_sequence_decode_matches_encode_side(encoded_seq):
    root, results = encoded_seq
    frames, names = decode_sequence(root)
    assert frames.shape[0] == 3 and names[0] == "frame_0000"
    # the encoder already rendered each frame's decoded params; the decode
    # walk must land on the same images (PSNR rows match)
    v = synthetic_video(24, 24, frames=3,
                        seed=_seed("unittest"), motion=0.01)
    for t, r in enumerate(results):
        mse = float(np.mean((frames[t] - v[t]) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        assert abs(psnr - r["decoded_psnr"]) < 0.05


def _seed(name):
    from implicit_image_tpu.data import stable_seed

    return stable_seed(name)


def test_sequence_standalone_frame_decode_walks_chain(encoded_seq):
    """decompress_state_dict on a P-frame alone recursively decodes the
    verified chain back to the I-frame — no prev_state required."""
    from implicit_image_tpu.coding import decompress_state_dict

    root, _ = encoded_seq
    seq_frames, _ = decode_sequence(root)
    alone = decompress_state_dict(
        root / "frame_0002" / "model_quantized", "zstd"
    )
    chain = None
    for d in ["frame_0000", "frame_0001", "frame_0002"]:
        chain = decompress_state_dict(
            root / d / "model_quantized", "zstd", prev_state=chain
        )
    for k in alone:
        np.testing.assert_array_equal(alone[k], chain[k])


def test_sequence_broken_chain_fails_loudly(encoded_seq, tmp_path):
    import shutil

    from implicit_image_tpu.coding import decompress_state_dict

    root, _ = encoded_seq
    copy = tmp_path / "seq_copy"
    shutil.copytree(root, copy)
    payload = copy / "frame_0000" / "model_quantized" / "compressed_weights.data"
    payload.write_bytes(payload.read_bytes()[:-1] + b"\x00")
    with pytest.raises(ValueError, match="sha256 mismatch"):
        decompress_state_dict(copy / "frame_0001" / "model_quantized", "zstd")
    # a missing previous frame also fails with a clear message
    shutil.rmtree(copy / "frame_0000")
    with pytest.raises(FileNotFoundError, match="previous frame"):
        decompress_state_dict(copy / "frame_0001" / "model_quantized", "zstd")


def test_sequence_sparse_masks_survive(tmp_path):
    """Sparse sequence: P-frames resume the mask from the previous decoded
    nonzeros; decoded weights stay sparse and pruned entries stay 0."""
    from implicit_image_tpu.coding import decompress_state_dict

    results = encode_sequence(SEQ_OVERRIDES + [
        f"output_dir={tmp_path}", "masking=RigL", "masking.density=0.5",
        "sequence.frames=2",
    ])
    assert len(results) == 2
    root = tmp_path / "seq_unittest"
    state = decompress_state_dict(
        root / "frame_0001" / "model_quantized", "zstd"
    )
    w = state["layers.1.weight"]
    frac_zero = float((w == 0).mean())
    assert frac_zero > 0.3  # ~half pruned (density 0.5)


def test_sequence_frame_decodes_via_decode_cli(encoded_seq):
    """Every frame dir is a standard run dir: the decode CLI renders a
    P-frame standalone (walking the verified chain itself)."""
    from implicit_image_tpu.decompress import decode_run

    root, results = encoded_seq
    img, stats = decode_run(root / "frame_0001")
    assert img.shape == (24, 24, 3)
    frames, _ = decode_sequence(root)
    np.testing.assert_allclose(np.asarray(img), frames[1], atol=1e-6)


def test_sequence_gop_inserts_iframes(tmp_path):
    """sequence.gop=2 -> frames 0 and 2 are I (absolute containers, no
    delta entry), frames 1 and 3 are P chained to the frame before them."""
    results = encode_sequence(SEQ_OVERRIDES + [
        f"output_dir={tmp_path}", "masking=none",
        "sequence.frames=4", "sequence.gop=2",
    ])
    assert [r["kind"] for r in results] == ["I", "P", "I", "P"]
    root = tmp_path / "seq_unittest"
    m2 = json.loads(
        (root / "frame_0002" / "model_quantized" / "meta_data.json")
        .read_text()
    )
    assert "delta" not in m2.get("__meta__", {})
    m3 = json.loads(
        (root / "frame_0003" / "model_quantized" / "meta_data.json")
        .read_text()
    )
    assert m3["__meta__"]["delta"]["prev"].endswith(
        "frame_0002/model_quantized"
    )
    # the whole gop-structured sequence decodes
    frames, names = decode_sequence(root)
    assert frames.shape[0] == 4


def test_sequence_curve_plot(encoded_seq):
    pytest.importorskip("matplotlib")
    from implicit_image_tpu.visualize.sequence_curve import plot_sequence

    root, _ = encoded_seq
    out = plot_sequence(root)
    assert out.is_file() and out.stat().st_size > 0


def test_sequence_stop_at_psnr_bounds_pframe_budget(tmp_path):
    """sequence.stop_at_psnr: a trivially-reachable target stops P-frames
    at the first segment boundary; an unreachable one uses the full cap."""
    base = SEQ_OVERRIDES + [
        f"output_dir={tmp_path}", "masking=none",
        "sequence.frames=2", "sequence.steps=40",
    ]
    early = encode_sequence(base + ["sequence.stop_at_psnr=5"])
    assert early[1]["kind"] == "P" and early[1]["steps"] < 40
    full = encode_sequence(base + [
        "sequence.stop_at_psnr=99", f"output_dir={tmp_path}/full",
    ])
    assert full[1]["steps"] == 40
    # both variants still decode end-to-end
    frames, _ = decode_sequence(tmp_path / "seq_unittest")
    assert frames.shape[0] == 2


def test_sequence_delta_iframes(tmp_path):
    """quant.delta + train.init_path: I-frames code residuals against the
    meta artifact (artifact-mode manifest), P-frames still chain on the
    previous frame (prev-mode), and the mixed chain decodes."""
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.metainit import save_meta_init

    mdef, mcfg = build_model(
        "siren", depth=3, hidden_size=16, input_size=2, output_size=3
    )
    import jax as _jax

    art = tmp_path / "meta.npz"
    save_meta_init(art, mdef.init(_jax.random.PRNGKey(5), mcfg),
                   mdef.name, mcfg)
    results = encode_sequence(SEQ_OVERRIDES + [
        f"output_dir={tmp_path}", "masking=none",
        "quant.delta=true", f"train.init_path={art}",
        "sequence.frames=3", "sequence.gop=2",
    ])
    assert [r["kind"] for r in results] == ["I", "P", "I"]
    root = tmp_path / "seq_unittest"
    m0 = json.loads((root / "frame_0000" / "model_quantized" /
                     "meta_data.json").read_text())
    assert m0["__meta__"]["delta"]["artifact"] == str(art)
    assert m0["__meta__"]["delta"].get("xor")
    m1 = json.loads((root / "frame_0001" / "model_quantized" /
                     "meta_data.json").read_text())
    assert "prev" in m1["__meta__"]["delta"]
    frames, _ = decode_sequence(root)
    assert frames.shape[0] == 3


def test_sequence_lr_overrides_pfit_only(tmp_path):
    """sequence.lr retunes the P-fit optimizer; I-frames keep optim.lr.

    The knob exists because the fresh-Adam transient at the full fit lr
    moves weights farther from the previous frame's params than the
    content motion requires, inflating the P residual codebook support
    (BASELINE.md "Sequence coding"; default 1e-4 = the measured sweet
    spot of the lr A/B there).
    """
    base = SEQ_OVERRIDES + ["masking=none"]
    r_hi = encode_sequence(base + [f"output_dir={tmp_path}/hi"])
    r_lo = encode_sequence(
        base + [f"output_dir={tmp_path}/lo", "sequence.lr=1e-5"]
    )
    # the I-frame is untouched by the P lr (deterministic seeds)
    assert r_hi[0]["bytes"] == r_lo[0]["bytes"]
    assert r_hi[0]["decoded_psnr"] == r_lo[0]["decoded_psnr"]
    # the P-fits really ran at a different lr -> different streams
    assert any(
        a["bytes"] != b["bytes"] or a["decoded_psnr"] != b["decoded_psnr"]
        for a, b in zip(r_hi[1:], r_lo[1:])
    )


def test_sequence_requires_kmeans(tmp_path):
    with pytest.raises(ValueError, match="kmeans"):
        encode_sequence([
            "img=synthetic", "img.height=16", "img.width=16",
            "quant=none", "sequence.video=x", "sequence.frames=2",
            f"output_dir={tmp_path}",
        ])


def test_sequence_max_drop_fallback_and_disable(tmp_path):
    """Scene-cut guard: at huge inter-frame motion and a starved P budget,
    the P attempt decodes far below the I-frame; with the guard on the
    frame re-encodes as a standalone I-frame, with max_drop=none the low
    quality P-frame ships."""
    high_motion = [
        "sequence.video=scenecut", "sequence.frames=2",
        "sequence.motion=0.5", "sequence.steps=2",
        # the I-frame must actually be good for a quality floor to exist
        "sequence.steps0=400", "img.height=32", "img.width=32",
    ]
    guarded = encode_sequence(SEQ_OVERRIDES + high_motion + [
        f"output_dir={tmp_path}/a", "masking=none",
        "sequence.max_drop=0.5",
    ])
    assert [r["kind"] for r in guarded] == ["I", "I"]
    meta = json.loads(
        (Path(tmp_path) / "a" / "seq_scenecut" / "frame_0001" /
         "model_quantized" / "meta_data.json").read_text()
    )
    # fallback frame is standalone: no inter-frame delta manifest
    assert "prev" not in meta.get("__meta__", {}).get("delta", {})
    frames, names = decode_sequence(Path(tmp_path) / "a" / "seq_scenecut")
    assert frames.shape[0] == 2

    unguarded = encode_sequence(SEQ_OVERRIDES + high_motion + [
        f"output_dir={tmp_path}/b", "masking=none",
        "sequence.max_drop=none",
    ])
    assert [r["kind"] for r in unguarded] == ["I", "P"]
    # the guard exists because the P attempt is measurably worse
    assert (
        guarded[1]["decoded_psnr"]
        > unguarded[1]["decoded_psnr"] + 0.5
    )


def test_sequence_ekfac_pframe_carry(tmp_path):
    """P-frame init must build the same carry structure as the fit's
    init_fn — with preconditioner=ekfac that includes live KFE state
    (regression: pframe_init used to hand the compiled segment an empty
    ekfac slot)."""
    rows = encode_sequence(SEQ_OVERRIDES + [
        f"output_dir={tmp_path}", "masking=none",
        "optim.preconditioner=ekfac",
        "sequence.frames=2", "sequence.steps0=10", "sequence.steps=4",
        "sequence.max_drop=none",
    ])
    assert [r["kind"] for r in rows] == ["I", "P"]
    frames, _ = decode_sequence(Path(tmp_path) / "seq_unittest")
    assert frames.shape[0] == 2


def test_sequence_files_input(tmp_path):
    """sequence.files=a.png,b.png — real multi-file input goes through the
    standard image loader per frame; geometry comes from the files."""
    from implicit_image_tpu.data import save_img

    v = synthetic_video(24, 24, frames=2, seed=7, motion=0.02)
    paths = []
    for t in range(2):
        p = tmp_path / f"f{t}.png"
        save_img(str(p), v[t])
        paths.append(str(p))
    rows = encode_sequence([
        "mlp.depth=3", "mlp.hidden_size=16",
        "img.height=24", "img.width=24", "img.bits=8",
        "train.num_steps=20", "train.log_steps=20",
        "quant=kmeans", "quant.bits=4", "quant.num_steps=4",
        "quant.log_steps=4", "entropy_coding=zstd", "masking=none",
        f"sequence.files={paths[0]},{paths[1]}",
        "sequence.steps0=20", "sequence.steps=6", "sequence.max_drop=none",
        f"output_dir={tmp_path}",
    ])
    assert [r["kind"] for r in rows] == ["I", "P"]
    frames, _ = decode_sequence(tmp_path / "seq_f0")
    assert frames.shape == (2, 24, 24, 3)


def test_sequence_iiv_pack_roundtrip_and_gop_seek(tmp_path):
    """Single-file sequence artifact + GOP seek (VERDICT r3 item 6): a
    gop=2 sequence packs into ONE .iiv whose index records the I/P map;
    decode_sequence on the FILE equals the dir decode bit-for-bit, and
    frame=t seeks from the nearest I-frame (P offsets exact) instead of
    walking the whole chain."""
    from implicit_image_tpu.coding.container_file import (
        is_packed_sequence,
        pack_sequence,
        sequence_index,
        unpack_sequence,
    )

    encode_sequence(SEQ_OVERRIDES + [
        f"output_dir={tmp_path}", "masking=none",
        "sequence.frames=4", "sequence.gop=2",
    ])
    root = tmp_path / "seq_unittest"

    idx = sequence_index(root)
    assert [f["kind"] for f in idx["frames"]] == ["I", "P", "I", "P"]

    iiv = pack_sequence(root, tmp_path / "clip.iiv")
    assert is_packed_sequence(iiv)
    # deterministic bytes: packing the same dir twice is bit-identical
    again = pack_sequence(root, tmp_path / "again.iiv")
    assert iiv.read_bytes() == again.read_bytes()

    ref_frames, ref_names = decode_sequence(root)
    file_frames, file_names = decode_sequence(iiv)
    assert file_names == ref_names
    np.testing.assert_array_equal(file_frames, ref_frames)

    # GOP seek on both the dir and the packed file: every frame matches
    # the full chain decode exactly
    for t in range(4):
        img_d, name_d = decode_sequence(root, frame=t)
        np.testing.assert_array_equal(img_d, ref_frames[t])
        assert name_d == ref_names[t]
    img_f, _ = decode_sequence(iiv, frame=3)
    np.testing.assert_array_equal(img_f, ref_frames[3])

    with pytest.raises(IndexError):
        decode_sequence(root, frame=4)

    # unpack restores a decodable seq dir
    restored = unpack_sequence(iiv, tmp_path / "restored")
    r_frames, r_names = decode_sequence(restored)
    np.testing.assert_array_equal(r_frames, ref_frames)

    # selective unpack (the packed-seek fast path): only the requested
    # frame dirs are extracted
    part = unpack_sequence(iiv, tmp_path / "part",
                           frames=["frame_0002", "frame_0003"])
    got = sorted(d.name for d in part.iterdir() if d.is_dir())
    assert got == ["frame_0002", "frame_0003"]
    # the partial dir decodes its GOP (frame 2 is an I-frame)
    img2, _ = decode_sequence(part, frame=0)
    np.testing.assert_array_equal(img2, ref_frames[2])

    # a pure P-chain (gop=0 fixture shape): seek to the tail walks from
    # frame 0 only because no later I exists — still exact
    # (covered by the gop case above where frames 1,3 seek from 0,2)


def test_sequence_iiv_refuses_rootless_chain(tmp_path):
    """An archive whose first frame is a P-frame has no decode root; the
    index builder must refuse at PACK time, not produce a dead file."""
    from implicit_image_tpu.coding.container_file import sequence_index

    encode_sequence(SEQ_OVERRIDES + [
        f"output_dir={tmp_path}", "masking=none", "sequence.frames=3",
    ])
    root = tmp_path / "seq_unittest"
    # drop the I-frame: the remaining chain starts at a P-frame
    import shutil

    shutil.rmtree(root / "frame_0000")
    with pytest.raises(ValueError, match="not an\n?.*I-frame|I-frame"):
        sequence_index(root)
