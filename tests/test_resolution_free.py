"""Resolution-free decode: super-resolution, ROI window, tiled render.

The INR weights are the artifact; any lattice can be rendered from them.
The reference's decode path can only re-evaluate the full training grid
(reference entropy_coding/__init__.py:123-186 + eval_epoch; SURVEY.md
§3.2) — these capabilities are new, built on get_grid_window /
coding.render_region.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_image_tpu.coding import render_region
from implicit_image_tpu.data import get_grid, get_grid_window
from implicit_image_tpu.models import build_model


def test_grid_window_bit_identical_to_slice():
    full = np.asarray(get_grid(37, 23))
    for r0, r1, c0, c1 in [(0, 37, 0, 23), (5, 12, 0, 23), (0, 1, 7, 8),
                           (36, 37, 22, 23), (10, 30, 3, 20)]:
        win = np.asarray(get_grid_window(37, 23, r0, r1, c0, c1))
        np.testing.assert_array_equal(win, full[r0:r1, c0:c1])


def test_grid_window_rejects_out_of_bounds():
    for bad in [(-1, 5, 0, 5), (0, 11, 0, 5), (3, 3, 0, 5), (0, 5, 2, 1)]:
        with pytest.raises(ValueError):
            get_grid_window(10, 5, *bad)


@pytest.mark.parametrize("name,kw", [
    ("siren", dict(depth=3, hidden_size=16)),
    ("fourier", dict(depth=3, hidden_size=16)),
    ("coordx", dict(depth=4, hidden_size=16, split_depth=2)),
    ("hashgrid", dict(n_levels=4, log2_table_size=6, features=2,
                      base_resolution=4, finest_resolution=24,
                      hidden_size=8, depth=2)),
])
def test_roi_render_matches_full_render_slice(name, kw):
    """An ROI render must equal the corresponding slice of the full
    render — same coordinates, same network, for every model family that
    consumes the grid (incl. the separable CoordX/hashgrid fast paths,
    which read the window's row/col coordinate vectors)."""
    mdef, mcfg = build_model(name, **kw)
    params = mdef.init(jax.random.PRNGKey(3), mcfg)
    h, w = 24, 18
    full = np.asarray(jax.jit(lambda p: mdef.apply(p, get_grid(h, w), mcfg))(params))
    roi = (4, 15, 2, 11)
    win = render_region(mdef, mcfg, params, h, w, roi=roi)
    np.testing.assert_allclose(
        win, full[roi[0]:roi[1], roi[2]:roi[3]], rtol=0, atol=1e-6)


def test_tiled_render_matches_untiled():
    mdef, mcfg = build_model("coordx", depth=4, hidden_size=16, split_depth=2)
    params = mdef.init(jax.random.PRNGKey(1), mcfg)
    untiled = render_region(mdef, mcfg, params, 25, 16)
    tiled = render_region(mdef, mcfg, params, 25, 16, tile_rows=7)
    np.testing.assert_allclose(tiled, untiled, rtol=0, atol=1e-6)
    assert tiled.shape == (25, 16, 3)
    # tiling composes with an ROI window
    roi = (3, 22, 5, 13)
    t = render_region(mdef, mcfg, params, 25, 16, roi=roi, tile_rows=4)
    np.testing.assert_allclose(
        t, untiled[roi[0]:roi[1], roi[2]:roi[3]], rtol=0, atol=1e-6)


def test_superres_render_is_denser_lattice():
    """Scaling the lattice = evaluating the same INR on a denser grid."""
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    up = render_region(mdef, mcfg, params, 32, 32)
    direct = np.asarray(
        jax.jit(lambda p: mdef.apply(p, get_grid(32, 32), mcfg))(params))
    np.testing.assert_allclose(up, direct, rtol=0, atol=1e-6)


@pytest.mark.parametrize("name,kw", [
    ("siren", dict(depth=3, hidden_size=16)),
    ("coordx", dict(depth=4, hidden_size=16, split_depth=2)),
])
def test_sharded_render_matches_single_device(name, kw):
    """Multi-chip decode: a row-sharded render over the 8-device virtual
    mesh must equal the unsharded render (GSPMD inserts the collectives;
    separable families keep their fast path)."""
    from implicit_image_tpu.parallel import make_mesh, sharded_render

    mdef, mcfg = build_model(name, **kw)
    params = mdef.init(jax.random.PRNGKey(5), mcfg)
    mesh = make_mesh(image=1, pixel=8)
    h, w = 32, 16
    single = np.asarray(
        jax.jit(lambda p: mdef.apply(p, get_grid(h, w), mcfg))(params))
    out = np.asarray(sharded_render(mesh, mdef, mcfg, params, h, w))
    np.testing.assert_allclose(out, single, rtol=0, atol=1e-6)
    # ROI window (rows divisible by the pixel axis)
    win = np.asarray(
        sharded_render(mesh, mdef, mcfg, params, h, w, roi=(8, 24, 2, 14)))
    np.testing.assert_allclose(win, single[8:24, 2:14], rtol=0, atol=1e-6)
    with pytest.raises(ValueError):
        sharded_render(mesh, mdef, mcfg, params, h, w, roi=(0, 12, 0, 16))


def _tiny_run(tmp_path, extra=()):
    from implicit_image_tpu.compress import main
    from implicit_image_tpu.config import compose

    cfg = compose([
        "img=synthetic", "img.height=16", "img.width=16",
        "mlp.depth=3", "mlp.hidden_size=8",
        "masking=none", "train.num_steps=20", "train.log_steps=10",
        "quant.num_steps=4", "quant.bits=4", "entropy_coding=zstd",
        *extra,
    ])
    rd = tmp_path / "run"
    main(cfg, run_dir=str(rd))
    return rd


def test_decode_run_geometry_end_to_end(tmp_path):
    from implicit_image_tpu.decompress import decode_run

    rd = _tiny_run(tmp_path)
    base, _ = decode_run(rd)
    assert np.asarray(base).shape == (16, 16, 3)

    up, stats = decode_run(rd, scale=2)
    assert np.asarray(up).shape == (32, 32, 3)
    assert stats["lattice"] == (32, 32)

    sz, _ = decode_run(rd, size=(24, 12))
    assert np.asarray(sz).shape == (24, 12, 3)

    # ROI of the native lattice == slice of the native decode
    win, stats = decode_run(rd, roi=(2, 10, 4, 12))
    np.testing.assert_allclose(
        np.asarray(win), np.asarray(base)[2:10, 4:12], rtol=0, atol=1e-6)
    assert stats["window"] == (2, 10, 4, 12)

    # tiled decode == untiled decode at the same geometry
    t, _ = decode_run(rd, scale=2, tile_rows=5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(up), rtol=0, atol=1e-6)


def test_cli_geometry_flags(tmp_path):
    from implicit_image_tpu.decompress import cli

    rd = _tiny_run(tmp_path)
    out = tmp_path / "roi.png"
    cli([str(rd), "--roi", "2:10,4:12", "--scale", "2", "--out", str(out)])
    assert out.exists()
    import cv2

    arr = cv2.imread(str(out))
    # --roi applies to the SCALED (32x32) lattice: rows 2:10, cols 4:12
    assert arr.shape == (8, 8, 3)

    # multi-run + geometry flags is an error
    with pytest.raises(SystemExit):
        cli([str(rd), str(rd), "--scale", "2"])
