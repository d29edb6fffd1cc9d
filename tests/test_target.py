"""Target-rate / target-quality mode (implicit_image_tpu/target.py)."""
import numpy as np
import pytest

from implicit_image_tpu.parallel.pipeline import PipelineResult
from implicit_image_tpu.target import _bracket, _meets, _pick


def _member(db, nbytes):
    return PipelineResult(
        psnr=db, quant_psnr=db, decoded_psnr=db,
        compressed_bytes=nbytes, params=None, stream_dir="",
    )


MEMBERS = [
    (0.05, _member(40.0, 10_000)),
    (0.2, _member(46.0, 30_000)),
    (0.5, _member(50.0, 60_000)),
    (0.9, _member(52.0, 100_000)),
]


def test_pick_rate_constrained_maximizes_quality():
    d, r, hit = _pick(MEMBERS, tb=35_000, tdb=None)
    assert hit and d == 0.2 and r.compressed_bytes == 30_000


def test_pick_quality_constrained_minimizes_rate():
    d, r, hit = _pick(MEMBERS, tb=None, tdb=47.0)
    assert hit and d == 0.5 and r.compressed_bytes == 60_000


def test_pick_joint_constraint():
    d, r, hit = _pick(MEMBERS, tb=70_000, tdb=None)
    assert hit and d == 0.5
    assert _meets(r, 70_000, 49.0)
    assert not _meets(r, 70_000, 51.0)


def test_pick_miss_returns_nearest():
    # nothing fits 5 KB: smallest member, reported as a miss
    d, r, hit = _pick(MEMBERS, tb=5_000, tdb=None)
    assert not hit and d == 0.05
    # nothing reaches 60 dB: best-PSNR member, reported as a miss
    d, r, hit = _pick(MEMBERS, tb=None, tdb=60.0)
    assert not hit and d == 0.9


def test_bracket_straddles_the_constraint():
    lo, hi = _bracket(MEMBERS, tb=35_000, tdb=None)
    assert (lo, hi) == (0.2, 0.5)  # last inside -> first outside
    lo, hi = _bracket(MEMBERS, tb=None, tdb=47.0)
    assert (lo, hi) == (0.2, 0.5)


@pytest.mark.slow
def test_compress_to_target_end_to_end(tmp_path):
    """Tiny full search on CPU: the returned member's bitstream exists and
    the selection respects the byte budget when feasible."""
    from implicit_image_tpu.config import compose
    from implicit_image_tpu.target import compress_to_target

    cfg = compose(
        [
            "img=synthetic",
            "img.height=24",
            "img.width=24",
            "mlp.depth=4",
            "mlp.hidden_size=16",
            "train.num_steps=60",
            "train.log_steps=30",
            "train.use_pallas=False",
            "train.mixed_precision=False",
            "masking=RigL",
            "masking.end_when=40",
            "masking.interval=20",
            "quant.num_steps=5",
            "quant.bits=5",
            "entropy_coding=zstd",
        ]
    )
    res = compress_to_target(
        cfg, target_bytes=10_000, densities=[0.1, 0.5, 0.9],
        refine=1, out_root=str(tmp_path),
    )
    assert len(res["probes"]) >= 3
    assert (res["compressed_bytes"] <= 10_000) == res["target_met"]
    from pathlib import Path

    assert (
        Path(res["stream_dir"]) / "model_quantized" / "compressed_weights.data"
    ).exists()
    bytes_by_density = {p["density"]: p["bytes"] for p in res["probes"]}
    # rate grows with density (the monotonicity the bracketing relies on)
    assert bytes_by_density[0.1] < bytes_by_density[0.9]
