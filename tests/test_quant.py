"""Quantization subsystem tests (k-means codebook + uniform fake-quant)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_image_tpu.quant import (
    QuantConfig,
    convert,
    dequantize,
    quantize_params,
    quantize_weight,
    quantized_layer_indices,
    uniform_quantize_weight,
)
from implicit_image_tpu.quant.kmeans import kmeans_fit
from implicit_image_tpu.quant.uniform import fake_quant


def test_kmeans_fit_recovers_clusters():
    # three well-separated blobs -> Lloyd should land one center in each
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [rng.normal(c, 0.01, 200) for c in (-1.0, 0.5, 2.0)]
    ).astype(np.float32)
    valid = np.ones_like(pts)
    centers0 = jnp.linspace(pts.min(), pts.max(), 3)
    centers = np.sort(np.asarray(kmeans_fit(jnp.asarray(pts), jnp.asarray(valid), centers0, iters=10)))
    np.testing.assert_allclose(centers, [-1.0, 0.5, 2.0], atol=0.05)


def test_kmeans_fit_ignores_invalid_points():
    pts = jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.1, 0.9], jnp.float32)
    valid = jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
    centers = kmeans_fit(pts, valid, jnp.asarray([0.5]), iters=5)
    np.testing.assert_allclose(np.asarray(centers), [1.0], atol=1e-6)


def test_quantize_weight_zero_centroid_and_snap():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (32, 32))
    mask = (jax.random.uniform(jax.random.PRNGKey(1), w.shape) < 0.5).astype(w.dtype)
    w = w * mask
    snapped, book = quantize_weight(w, bits=4)
    cents = np.asarray(book.centroids)
    assert cents.shape == (16,)
    assert cents[0] == 0.0  # zero centroid first after |c| sort
    # zeros stay exactly zero after snapping
    np.testing.assert_array_equal(np.asarray(snapped)[np.asarray(mask) == 0], 0.0)
    # snapped values are all centroids
    assert set(np.round(np.unique(snapped), 5)) <= set(np.round(cents, 5))
    # labels reproduce the snapped weight
    np.testing.assert_allclose(
        np.asarray(dequantize(book.labels, book.centroids)), np.asarray(snapped)
    )


def test_quantize_weight_is_jittable():
    w = jax.random.normal(jax.random.PRNGKey(2), (16, 16))
    f = jax.jit(lambda w: quantize_weight(w, bits=3)[0])
    np.testing.assert_allclose(
        np.asarray(f(w)), np.asarray(quantize_weight(w, bits=3)[0]), atol=1e-6
    )


def test_uniform_quantize_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(3), (64,))
    snapped, book = uniform_quantize_weight(w, bits=8)
    # max error bounded by scale/2
    scale = float(np.diff(np.asarray(book.centroids)).max())
    assert np.abs(np.asarray(snapped) - np.asarray(w)).max() <= scale / 2 + 1e-6
    np.testing.assert_allclose(
        np.asarray(dequantize(book.labels, book.centroids)),
        np.asarray(snapped),
        atol=1e-7,
    )


def test_fake_quant_straight_through_gradient():
    w = jnp.asarray([0.1, -0.3, 0.7])
    g = jax.grad(lambda x: jnp.sum(fake_quant(x, 8) * 2.0))(w)
    np.testing.assert_allclose(np.asarray(g), 2.0)  # STE passes grads through


def test_skip_layers_default_first_last():
    from implicit_image_tpu.models import build_model

    mdef, mcfg = build_model("siren", depth=4, hidden_size=8)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    cfg = QuantConfig(bits=4)
    qidx = quantized_layer_indices(params, cfg)
    assert qidx == [1, 2]  # first & last linear kept full precision

    qparams = quantize_params(params, cfg)
    # skipped layers untouched
    np.testing.assert_array_equal(
        np.asarray(qparams[0]["w"]), np.asarray(params[0]["w"])
    )
    # quantized layer snapped to <= 2^bits distinct values
    assert len(np.unique(qparams[1]["w"])) <= 2**4


def test_convert_emits_codebooks_only_for_quantized():
    from implicit_image_tpu.models import build_model

    mdef, mcfg = build_model("siren", depth=4, hidden_size=8)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    qparams, books = convert(params, QuantConfig(bits=4))
    assert books[0] is None and books[3] is None
    assert books[1] is not None and books[2] is not None
    np.testing.assert_allclose(
        np.asarray(dequantize(books[1].labels, books[1].centroids)),
        np.asarray(qparams[1]["w"]),
    )


def test_quant_finetune_end_to_end():
    """Quant phase recovers PSNR close to the dense fit (small scale)."""
    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit
    from implicit_image_tpu.training.quant_phase import quant_finetune

    img = synthetic_image(32, 32, seed=0)
    grid = get_grid(32, 32)
    mdef, mcfg = build_model("siren", depth=4, hidden_size=32)
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=300, log_steps=100), OptimConfig(lr=1e-3),
    )
    pre = np.asarray(res.metrics["psnr"])
    pre = pre[~np.isnan(pre)][-1]

    # reference operating point: 8 bits, ~100 finetune steps
    # (conf/quant/kmeans.yaml). SIREN's omega_0 amplification makes raw
    # snapping lossy; the finetune recovers most of it.
    qres = quant_finetune(
        res.params, img, mdef, mcfg, grid,
        QuantConfig(bits=8, num_steps=100), OptimConfig(lr=1e-3),
    )
    qpsnr = float(np.asarray(qres.metrics["quant_psnr"]))
    assert qpsnr > pre - 3.0, (qpsnr, pre)
    # all quantized layers express <= 2^bits values
    for i, book in enumerate(qres.codebooks):
        if book is not None:
            assert len(np.unique(qres.params[i]["w"])) <= 2**8


def test_codebook_finetune_improves_over_post_training():
    """KMeans finetune trains the codebook (labels frozen) and must BEAT
    pure post-training clustering — the projected-Adam scheme the reference
    uses measurably loses dB instead (quant_phase.py docstring)."""
    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.ops.metrics import psnr
    from implicit_image_tpu.quant import quantize_weight
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit
    from implicit_image_tpu.training.quant_phase import quant_finetune

    img = synthetic_image(32, 32, seed=0)
    grid = get_grid(32, 32)
    mdef, mcfg = build_model("siren", depth=4, hidden_size=32)
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=300, log_steps=100), OptimConfig(lr=1e-3),
    )

    # post-training clustering only (4-bit so the gap is visible)
    snapped = list(res.params)
    for i in (1, 2):
        w, _ = quantize_weight(snapped[i]["w"], bits=4)
        snapped[i] = dict(snapped[i], w=w)
    post = float(psnr(mdef.apply(tuple(snapped), grid, mcfg), img))

    qres = quant_finetune(
        res.params, img, mdef, mcfg, grid,
        QuantConfig(bits=4, num_steps=100), OptimConfig(lr=1e-3),
    )
    qpsnr = float(np.asarray(qres.metrics["quant_psnr"]))
    assert qpsnr > post, (qpsnr, post)
    # pruning compatibility: frozen zero centroid stays exactly zero
    assert float(np.asarray(qres.codebooks[1].centroids)[0]) == 0.0


def test_qat_uniform_finetune_end_to_end():
    """Uniform fake-quant QAT (fbgemm stand-in) round-trips the phase."""
    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit
    from implicit_image_tpu.training.quant_phase import quant_finetune

    img = synthetic_image(24, 24, seed=0)
    grid = get_grid(24, 24)
    mdef, mcfg = build_model("siren", depth=4, hidden_size=16)
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=150, log_steps=50), OptimConfig(lr=1e-3),
    )
    qres = quant_finetune(
        res.params, img, mdef, mcfg, grid,
        QuantConfig(name="QAT", bits=8, num_steps=30), OptimConfig(lr=1e-4),
    )
    assert np.isfinite(float(np.asarray(qres.metrics["quant_psnr"])))
    assert qres.codebooks[1] is not None


def test_9bit_quant_uint16_labels_roundtrip(tmp_path):
    """The finals protocol uses 9-bit quant for building/bridge
    (slurm_scripts/finals.sh): >255 clusters must flow through uint16
    labels and the bitstream."""
    from implicit_image_tpu.coding import (
        compress_state_dict,
        decompress_state_dict,
        linear_state_dict,
    )
    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit
    from implicit_image_tpu.training.quant_phase import quant_finetune

    img = synthetic_image(24, 24, seed=1)
    grid = get_grid(24, 24)
    mdef, mcfg = build_model("siren", depth=4, hidden_size=32)
    res = fit(jax.random.PRNGKey(0), mdef, mcfg, grid, img,
              TrainConfig(num_steps=80, log_steps=40), OptimConfig(lr=1e-3))
    q = quant_finetune(res.params, img, mdef, mcfg, grid,
                       QuantConfig(bits=9, num_steps=10), OptimConfig(lr=1e-3))
    state = linear_state_dict(q.params, q.codebooks, half=True)
    lab = state["layers.1.labeled_weight"]
    assert lab.dtype == np.uint16 and int(lab.max()) > 255
    assert state["layers.1.centroids"].shape == (512,)
    compress_state_dict(state, tmp_path, "auto")
    dec = decompress_state_dict(tmp_path, "auto")
    expect = state["layers.1.centroids"][lab].astype(np.float32)
    np.testing.assert_array_equal(dec["layers.1.weight"], expect)


def test_ecvq_refine_lowers_label_entropy_keeps_zero_semantics():
    """ECVQ (quant/kmeans.py ecvq_refine): rate-penalized assignment must
    reduce label entropy monotonically-ish with lambda, keep pruned
    weights exactly at label 0, and keep centroid 0 exactly zero."""
    import numpy as np

    from implicit_image_tpu.quant import ecvq_refine, quantize_weight

    rng = np.random.default_rng(3)
    w = rng.normal(0, 0.1, (96, 96)).astype(np.float32)
    w[rng.random(w.shape) < 0.6] = 0.0
    w = jnp.asarray(w)

    def entropy(labels):
        _, c = np.unique(np.asarray(labels).reshape(-1), return_counts=True)
        p = c / c.sum()
        return float(-(p * np.log2(p)).sum())

    _, book = quantize_weight(w, 6)
    h0 = entropy(book.labels)
    refined = ecvq_refine(w, book, lam=2.0, iters=10)
    h1 = entropy(refined.labels)
    assert h1 < h0
    zeros = np.asarray(w) == 0
    assert (np.asarray(refined.labels)[zeros] == 0).all()
    assert float(refined.centroids[0]) == 0.0
    # reconstruction error stays within a small factor of plain k-means
    def err(b):
        rec = np.asarray(b.centroids)[np.asarray(b.labels)]
        return float(np.mean((np.asarray(w) - rec) ** 2))
    assert err(refined) < 3.0 * err(book)


def test_ecvq_lambda_zero_is_identity():
    """lam is only consumed when > 0 in the quant phase; refine itself at
    lam=0 must still be a pure Lloyd refinement (no rate pull, zeros fixed)."""
    import numpy as np

    from implicit_image_tpu.quant import QuantConfig

    cfg = QuantConfig()
    assert cfg.ecvq_lambda == 0.0  # dataclass default stays strict parity


def test_per_channel_fake_quant_matches_torch_fbgemm():
    """Gold parity for the fbgemm QAT weight scheme: our per-channel
    symmetric scales equal torch's MovingAveragePerChannelMinMaxObserver
    qparams EXACTLY, and fake-quant outputs match
    torch.fake_quantize_per_channel_affine except for half-way boundary
    elements (|w/s| == 127.5, 1-ULP artifacts in either framework)."""
    torch = pytest.importorskip("torch")
    from implicit_image_tpu.quant import fake_quant_per_channel
    from implicit_image_tpu.quant.uniform import _per_channel_qparams

    torch.manual_seed(0)
    w_t = torch.randn(64, 96) * 0.3  # (out, in) torch layout
    obs = torch.ao.quantization.MovingAveragePerChannelMinMaxObserver(
        averaging_constant=0.01, ch_axis=0, dtype=torch.qint8,
        qscheme=torch.per_channel_symmetric,
    )
    obs(w_t)
    scales_t, zps_t = obs.calculate_qparams()
    fq_t = torch.fake_quantize_per_channel_affine(
        w_t, scales_t, zps_t.to(torch.int32), 0, -128, 127
    ).numpy()

    w_j = jnp.asarray(np.array(w_t.numpy(), copy=True).T)  # (in, out) ours
    scales_j, _ = _per_channel_qparams(w_j, 8, axis=1)
    np.testing.assert_allclose(
        np.asarray(scales_j), scales_t.numpy(), rtol=1e-6
    )
    fq_j = np.asarray(fake_quant_per_channel(w_j, 8)).T
    d = np.abs(fq_j - fq_t)
    step = scales_t.numpy()[:, None]
    mismatched = d > 1e-7
    assert mismatched.mean() < 0.005  # only half-way boundary elements
    assert (d[mismatched] <= step.repeat(96, 1)[mismatched] * 1.01).all()


def test_moving_average_observer_matches_torch():
    """ObserverState/observe_minmax reproduces torch's
    MovingAverageMinMaxObserver sequence (first batch initializes, later
    batches EMA with averaging_constant)."""
    torch = pytest.importorskip("torch")
    from implicit_image_tpu.quant import observe_minmax
    from implicit_image_tpu.quant.uniform import observer_init

    tobs = torch.ao.quantization.MovingAverageMinMaxObserver(
        averaging_constant=0.01
    )
    state = observer_init()
    rng = np.random.default_rng(0)
    for _ in range(5):
        x = rng.standard_normal((32, 8)).astype(np.float32) * rng.uniform(0.5, 2)
        tobs(torch.from_numpy(x))
        state = observe_minmax(state, jnp.asarray(x), 0.01)
    np.testing.assert_allclose(
        float(state.min_val), float(tobs.min_val), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(state.max_val), float(tobs.max_val), rtol=1e-6
    )


def test_qat_per_channel_container_roundtrip(tmp_path):
    """QAT per-channel convert -> bitstream -> decode: the decoded weight
    equals codes * scales exactly, and the QAT pipeline runs end-to-end."""
    from implicit_image_tpu.coding import (
        compress_state_dict,
        decompress_state_dict,
        linear_state_dict,
    )
    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.quant import QuantConfig, convert
    from implicit_image_tpu.training.fit import OptimConfig
    from implicit_image_tpu.training.quant_phase import quant_finetune

    grid = get_grid(16, 16)
    img = synthetic_image(16, 16, seed=0)
    mdef, mcfg = build_model("siren", depth=4, hidden_size=16)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    qcfg = QuantConfig(name="QAT", bits=8, num_steps=10)
    res = quant_finetune(params, img, mdef, mcfg, grid, qcfg, OptimConfig(lr=1e-3))
    # quantized layers carry PerChannelCodebook
    books = [b for b in res.codebooks if b is not None]
    assert books and all(hasattr(b, "scales") for b in books)

    state = linear_state_dict(res.params, res.codebooks, half=False)
    assert any("qscale" in k for k in state)
    n = compress_state_dict(state, tmp_path, "zstd")
    assert n > 0
    back = decompress_state_dict(tmp_path, "zstd")
    for i, b in enumerate(res.codebooks):
        if b is None:
            continue
        expect = np.asarray(b.codes, np.float32) * np.asarray(b.scales)[None, :]
        np.testing.assert_allclose(
            back[f"layers.{i}.weight"], expect, rtol=1e-6
        )
        # and equals the snapped params the model used
        np.testing.assert_allclose(
            back[f"layers.{i}.weight"], np.asarray(res.params[i]["w"]),
            atol=1e-6,
        )


def test_quant_finetune_pixel_chunks_matches_full_batch():
    """Chunked quant finetune (pixel_chunks>1) equals the full-batch
    finetune: equal chunks average exactly (quant_phase._make_grad_fn),
    so params/metrics must agree to float tolerance. Covers the kmeans
    path on both a separable (CoordX, row-aligned chunk fast path) and a
    flat (SIREN) model, and the STE/QAT path on SIREN."""
    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit
    from implicit_image_tpu.training.quant_phase import quant_finetune

    img = synthetic_image(16, 16, seed=0)
    grid = get_grid(16, 16)

    for name, qname in (("coordx", "KMeans"), ("siren", "KMeans"),
                        ("siren", "QAT")):
        depth = 5 if name == "coordx" else 4  # coordx needs split_depth<=depth-2
        mdef, mcfg = build_model(name, depth=depth, hidden_size=16)
        res = fit(
            jax.random.PRNGKey(0), mdef, mcfg, grid, img,
            TrainConfig(num_steps=50, log_steps=50), OptimConfig(lr=1e-3),
        )
        # single step: chunk accumulation is bit-near the full-batch grad
        # (exactly equal in f64; fp32 leaves ~1e-9 reduction-order noise)
        q1 = QuantConfig(name=qname, bits=4, num_steps=1)
        full1 = quant_finetune(res.params, img, mdef, mcfg, grid, q1,
                               OptimConfig(lr=1e-3))
        chunk1 = quant_finetune(res.params, img, mdef, mcfg, grid, q1,
                                OptimConfig(lr=1e-3), pixel_chunks=4)
        if qname == "KMeans":
            # (QAT's convert() snaps latents to the uniform grid, so a
            # ~1e-9 grad difference can flip a weight sitting on a bin
            # boundary — covered by the metrics band below instead)
            for lf, lc in zip(full1.params, chunk1.params):
                for k in lf:
                    np.testing.assert_allclose(
                        np.asarray(lf[k]), np.asarray(lc[k]), atol=1e-5,
                        err_msg=f"{name}/{qname}/{k}",
                    )

        # multi-step: Adam's sqrt nonlinearity amplifies that noise, so the
        # bound is a small dB band, not bitwise
        qcfg = QuantConfig(name=qname, bits=4, num_steps=8)
        full = quant_finetune(res.params, img, mdef, mcfg, grid, qcfg,
                              OptimConfig(lr=1e-3))
        chunked = quant_finetune(res.params, img, mdef, mcfg, grid, qcfg,
                                 OptimConfig(lr=1e-3), pixel_chunks=4)
        np.testing.assert_allclose(
            float(np.asarray(full.metrics["quant_psnr"])),
            float(np.asarray(chunked.metrics["quant_psnr"])),
            atol=0.1,
        )
        np.testing.assert_allclose(
            float(np.asarray(full.metrics["quant_psnr_8bit"])),
            float(np.asarray(chunked.metrics["quant_psnr_8bit"])),
            atol=0.1,
        )


def test_quant_finetune_pixel_chunks_must_divide():
    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.fit import OptimConfig
    from implicit_image_tpu.training.quant_phase import quant_finetune

    img = synthetic_image(10, 10, seed=0)
    grid = get_grid(10, 10)
    mdef, mcfg = build_model("siren", depth=4, hidden_size=8)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    with pytest.raises(ValueError, match="pixel_chunks"):
        quant_finetune(params, img, mdef, mcfg, grid,
                       QuantConfig(bits=4, num_steps=2),
                       OptimConfig(lr=1e-3), pixel_chunks=3)


def test_quant_finetune_segmented_matches_single_execution():
    """segment_steps chains the finetune scan over shorter device
    executions (watchdog workaround, mirroring fit's run_segment_chain) —
    the steps are numerically the same, so params/codebooks/metrics must
    match the single-execution path to float tolerance. Covers kmeans and
    the STE/QAT path, plus a masked (sparse) kmeans run."""
    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.sparsity import MaskingConfig
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit
    from implicit_image_tpu.training.quant_phase import quant_finetune

    img = synthetic_image(16, 16, seed=0)
    grid = get_grid(16, 16)

    for qname, masking in (("KMeans", None), ("QAT", None),
                           ("KMeans", MaskingConfig(density=0.5, end_when=30))):
        mdef, mcfg = build_model("siren", depth=4, hidden_size=16)
        res = fit(
            jax.random.PRNGKey(0), mdef, mcfg, grid, img,
            TrainConfig(num_steps=40, log_steps=40), OptimConfig(lr=1e-3),
            masking,
        )
        masks = res.mask_state.masks if res.mask_state is not None else None
        qcfg = QuantConfig(name=qname, bits=4, num_steps=10)
        single = quant_finetune(res.params, img, mdef, mcfg, grid, qcfg,
                                OptimConfig(lr=1e-3), masks=masks)
        seg = quant_finetune(res.params, img, mdef, mcfg, grid, qcfg,
                             OptimConfig(lr=1e-3), masks=masks,
                             segment_steps=4)  # 4+4+2
        for lf, lc in zip(single.params, seg.params):
            for k in lf:
                np.testing.assert_allclose(
                    np.asarray(lf[k]), np.asarray(lc[k]), atol=1e-6,
                    err_msg=f"{qname}/{k}",
                )
        np.testing.assert_allclose(
            np.asarray(single.metrics["loss"]),
            np.asarray(seg.metrics["loss"]), atol=1e-7,
        )
        np.testing.assert_allclose(
            float(np.asarray(single.metrics["quant_psnr"])),
            float(np.asarray(seg.metrics["quant_psnr"])), atol=1e-4,
        )
        if qname == "KMeans":
            for bs, bc in zip(single.codebooks, seg.codebooks):
                assert (bs is None) == (bc is None)
                if bs is not None:
                    np.testing.assert_allclose(
                        np.asarray(bs.centroids), np.asarray(bc.centroids),
                        atol=1e-6,
                    )


def test_quant_lr_override_changes_finetune_scale():
    """quant.lr decouples the finetune step size from the fit lr: lr=0
    freezes the finetune (params == post-clustering snap), while the
    default (None -> optim.lr) trains the codebook (QuantConfig.lr;
    reference behavior is inherit, compress.py:174-177)."""
    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit
    from implicit_image_tpu.training.quant_phase import quant_finetune

    img = synthetic_image(16, 16, seed=0)
    grid = get_grid(16, 16)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=50, log_steps=50), OptimConfig(lr=1e-3),
    )

    def run(qlr):
        return quant_finetune(
            res.params, img, mdef, mcfg, grid,
            QuantConfig(bits=4, num_steps=20, lr=qlr),
            OptimConfig(lr=1e-3),
        )

    inherit, frozen, tiny = run(None), run(0.0), run(1e-6)
    d_frozen_tiny = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for la, lb in zip(frozen.params, tiny.params)
        for a, b in zip(la.values(), lb.values())
    )
    d_frozen_inherit = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for la, lb in zip(frozen.params, inherit.params)
        for a, b in zip(la.values(), lb.values())
    )
    # the override is live: a tiny lr moves params a tiny amount, the
    # inherited 1e-3 moves them orders of magnitude more
    assert 0 < d_frozen_tiny < 1e-3
    assert d_frozen_inherit > 10 * d_frozen_tiny


# ---- per-layer bit allocation (quant.bit_alloc, quant/allocate.py) ----


def test_bits_per_layer_overrides_codebook_sizes():
    """QuantConfig.bits_per_layer controls each layer's codebook width."""
    params = tuple(
        {"w": jax.random.normal(jax.random.PRNGKey(i), (32, 32)),
         "b": jnp.zeros((32,))}
        for i in range(4)
    )
    cfg = QuantConfig(bits=8, bits_per_layer=(None, 4, 6, None))
    assert cfg.layer_bits(0) == 8 and cfg.layer_bits(1) == 4
    assert cfg.layer_bits(2) == 6 and cfg.layer_bits(3) == 8
    _, books = convert(params, cfg)
    assert books[0] is None and books[3] is None  # first/last skip
    assert np.asarray(books[1].centroids).shape == (2**4,)
    assert np.asarray(books[2].centroids).shape == (2**6,)
    # degenerate-codebook guard uses the per-layer width
    small = tuple(
        {"w": jax.random.normal(jax.random.PRNGKey(i), (4, 4))}
        for i in range(4)
    )
    idx = quantized_layer_indices(
        small, QuantConfig(bits=3, bits_per_layer=(None, 3, 8, None))
    )
    assert idx == [1]  # layer 2 wants 256 > 16 weights -> skipped


def test_quant_finetune_bits_per_layer_container_roundtrip(tmp_path):
    """Mixed per-layer widths ride the quant phase and the container."""
    from implicit_image_tpu.coding import (
        compress_state_dict,
        decompress_state_dict,
        linear_state_dict,
    )
    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit
    from implicit_image_tpu.training.quant_phase import quant_finetune

    img = synthetic_image(24, 24, seed=0)
    grid = get_grid(24, 24)
    # hidden layers need >= 2^9 weights for the 9-bit probe (the
    # degenerate-codebook guard skips layers smaller than the codebook)
    mdef, mcfg = build_model("siren", depth=4, hidden_size=24)
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=150, log_steps=50), OptimConfig(lr=1e-3),
    )
    qcfg = QuantConfig(bits=8, num_steps=20,
                       bits_per_layer=(None, 4, 9, None))
    qres = quant_finetune(res.params, img, mdef, mcfg, grid, qcfg,
                          OptimConfig(lr=1e-3))
    assert np.asarray(qres.codebooks[1].centroids).shape == (2**4,)
    assert np.asarray(qres.codebooks[2].centroids).shape == (2**9,)

    state = linear_state_dict(qres.params, qres.codebooks, half=False)
    # 4-bit labels fit uint8; 9-bit labels need uint16 (coding/__init__.py)
    assert state["layers.1.labeled_weight"].dtype == np.uint8
    assert state["layers.2.labeled_weight"].dtype == np.uint16
    compress_state_dict(state, tmp_path, "zstd")
    dec = decompress_state_dict(tmp_path, "zstd")
    np.testing.assert_allclose(
        dec["layers.1.weight"], np.asarray(qres.params[1]["w"]), atol=0
    )
    np.testing.assert_allclose(
        dec["layers.2.weight"], np.asarray(qres.params[2]["w"]), atol=0
    )


def test_allocate_bits_exploits_insensitive_layer():
    """A layer whose weights barely matter should get a narrower codebook,
    and the chosen allocation must dominate the uniform baseline in the
    search's own (measured MSE, modeled bytes) terms — allocate_bits can
    never return a worse joint operating point than uniform."""
    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.quant.allocate import allocate_bits
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit

    img = synthetic_image(32, 32, seed=0)
    grid = get_grid(32, 32)
    mdef, mcfg = build_model("siren", depth=5, hidden_size=32)
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=200, log_steps=100), OptimConfig(lr=1e-3),
    )
    # make layer 3 nearly transparent: tiny weights -> its quantization
    # error is invisible at any width (its contribution to the image is
    # ~1e-4 of the residual); SIREN still renders through the +bias path
    params = list(res.params)
    params[3] = dict(params[3], w=params[3]["w"] * 1e-4)
    params = tuple(params)

    qcfg = QuantConfig(bits=8)
    rep = allocate_bits(mdef, mcfg, params, grid, img, qcfg,
                        candidates=(4, 5, 6, 7, 8))
    assert not rep.chosen_uniform
    assert rep.rate < rep.base_rate
    assert rep.mse <= rep.base_mse * (1.0 + 1e-9)
    # the transparent layer gets a strictly narrower codebook (its ΔD is
    # noise at every width, so exactly which narrow width wins is
    # arbitrary — the claim is that it never stays at the base width)
    assert rep.bits_per_layer[3] <= 6
    # non-quantized layers carry None
    assert rep.bits_per_layer[0] is None
    assert rep.bits_per_layer[-1] is None


def test_cli_bit_alloc_auto(tmp_path):
    """quant.bit_alloc=auto flows through the orchestrator end to end."""
    import json

    from implicit_image_tpu.compress import main
    from implicit_image_tpu.config import compose

    cfg = compose(
        [
            "img=synthetic",
            "img.height=24",
            "img.width=24",
            "mlp.depth=4",
            "mlp.hidden_size=16",
            "train.num_steps=100",
            "train.log_steps=50",
            "train.use_pallas=False",
            "train.mixed_precision=False",
            "quant.num_steps=10",
            "quant.bit_alloc=auto",
            "entropy_coding=zstd",
        ]
    )
    psnr, nbytes = main(cfg, run_dir=str(tmp_path))
    assert np.isfinite(psnr) and nbytes > 0
    summary = json.loads((tmp_path / "summary.json").read_text())
    alloc = summary["Bit Allocation"]
    assert len(alloc) == 4 and alloc[0] == -1 and alloc[-1] == -1
    assert all(2 <= b <= 16 for b in alloc[1:-1])
    # the A/B probe containers are kept as audit artifacts
    assert (tmp_path / "bit_alloc_auto" / "compressed_weights.data").exists()
    assert (tmp_path / "bit_alloc_uniform" / "compressed_weights.data").exists()
    # decoded MS-SSIM rides every coded run (ops/ssim.py)
    assert 0.0 < summary["Decoded MS-SSIM"] <= 1.0
