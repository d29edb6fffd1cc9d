"""Real-benchmark-image suite (reference protocol images).

The reference's evaluation is anchored on flower_foveon / big_building /
bridge from the imagecompression.info rgb16bit set (reference
conf/img/*.yaml, README.md:31-32, visualize/rate_distortion.py:162-168).
This environment has zero egress, so the whole suite AUTO-SKIPS when the
files are absent; drop them into data/rgb16bit/ (see data/MANIFEST.json)
and it activates with zero edits:

    python tools/verify_benchmarks.py      # format + sha (TOFU)
    python -m pytest tests/ -m realimage   # this suite
    make finals.real                       # full finals ladder + R-D plot
"""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

from implicit_image_tpu.data import load_img, resolve_benchmark_path

REPO = Path(__file__).resolve().parent.parent
MANIFEST = REPO / "data" / "MANIFEST.json"

_entries = json.loads(MANIFEST.read_text())["images"]
_available = [
    e for e in _entries
    if resolve_benchmark_path(f"img/{e['file']}") is not None
]

pytestmark = [
    pytest.mark.realimage,
    pytest.mark.skipif(
        not _available,
        reason="rgb16bit benchmark images not present (data/MANIFEST.json)",
    ),
]


@pytest.mark.parametrize("entry", _available, ids=lambda e: e["name"])
def test_manifest_integrity(entry):
    """Present files pass format validation + sha enforcement (no-write:
    the test never mutates the manifest)."""
    sys.path.insert(0, str(REPO / "tools"))
    import verify_benchmarks

    assert verify_benchmarks.verify(require_all=False, write=False) == 0


@pytest.mark.parametrize("entry", _available, ids=lambda e: e["name"])
def test_load_protocol_geometry(entry):
    """load_img reproduces the protocol geometry on the real file:
    resize-crop to 512x512 (conf/img/*.yaml), [0,1] float32, 3 channels."""
    path = resolve_benchmark_path(f"img/{entry['file']}")
    img = load_img(path, height=512, width=512, bits=16,
                   crop_mode="resize-crop")
    assert img.shape == (512, 512, 3)
    assert img.dtype == np.float32
    assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0
    # a natural photograph is not constant and uses most of the range
    assert float(img.std()) > 0.02
    assert float(img.max()) > 0.5


@pytest.mark.parametrize("entry", _available, ids=lambda e: e["name"])
def test_loader_parity_vs_reference_backends(entry):
    """Our loader matches the reference's cv2(+kornia-math) pipeline on
    the REAL bytes, not just on generated PPMs
    (tests/test_ingestion_parity.py covers the synthetic case)."""
    from test_ingestion_parity import reference_load

    path = resolve_benchmark_path(f"img/{entry['file']}")
    ours = load_img(path, height=512, width=512, bits=16,
                    crop_mode="resize-crop")
    ref = reference_load(path, 512, 512, 16, "resize-crop")
    np.testing.assert_allclose(ours, ref, atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("entry", _available[:1], ids=lambda e: e["name"])
def test_short_fit_reaches_natural_image_regime(entry):
    """A 500-step d6/w128 SIREN fit on the real image lands in the PSNR
    regime natural 512² images show (>25 dB float PSNR) — the smoke test
    that the whole fit path works on real content end-to-end."""
    import jax

    from implicit_image_tpu.data import get_grid
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.fit import (
        OptimConfig, TrainConfig, fit,
    )

    path = resolve_benchmark_path(f"img/{entry['file']}")
    img = load_img(path, height=512, width=512, bits=16,
                   crop_mode="resize-crop")
    grid = get_grid(512, 512)
    mdef, mcfg = build_model("siren", depth=6, hidden_size=128)
    res = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
              TrainConfig(num_steps=500, log_steps=100), OptimConfig())
    p = np.asarray(res.metrics["psnr"])
    p = p[np.isfinite(p)]
    assert p.size and p[-1] > 25.0, p
