"""FLOPs accounting + EKFAC preconditioner tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from implicit_image_tpu.data import get_grid, synthetic_image
from implicit_image_tpu.models import build_model
from implicit_image_tpu.sparsity.counting import (
    dense_flops,
    inference_flops,
    layer_flops,
    sparse_param_bits,
    xla_cost_analysis,
)


def test_layer_flops_dense():
    # 4->8 FC, bias, activation: mults = 4*8 + 8(act), adds = 3*8 + 8(bias)
    mults, adds = layer_flops(4, 8, sparsity=0.0)
    assert mults == 4 * 8 + 8
    assert adds == 3 * 8 + 8


def test_layer_flops_sparsity_scales_fanin():
    m_dense, _ = layer_flops(100, 10, 0.0, has_bias=False, activation=False)
    m_half, _ = layer_flops(100, 10, 0.5, has_bias=False, activation=False)
    assert m_half == m_dense / 2


def test_inference_flops_respects_masks():
    mdef, mcfg = build_model("siren", depth=4, hidden_size=16)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    full = inference_flops(params)
    assert full == dense_flops(params)
    # mask half of layer 1
    masks = [None] * len(params)
    m = np.ones(params[1]["w"].shape, np.float32)
    m[: m.shape[0] // 2] = 0.0
    masks[1] = jnp.asarray(m)
    masked_params = list(params)
    masked_params[1] = {**params[1], "w": params[1]["w"] * masks[1]}
    sparse = inference_flops(tuple(masked_params), masks)
    assert sparse < full


def test_sparse_param_bits():
    params = ({"w": jnp.ones((4, 4)), "b": jnp.ones((4,))},)
    dense_bits = sparse_param_bits(params)
    assert dense_bits == 20 * 32
    half = ({"w": jnp.concatenate([jnp.ones((2, 4)), jnp.zeros((2, 4))]),
             "b": jnp.ones((4,))},)
    bits = sparse_param_bits(half)
    assert bits == (8 * 32 + 16) + 4 * 32  # nnz*32 + 1-bit mask + bias


def test_xla_cost_analysis_reports_flops():
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    coords = get_grid(8, 8).reshape(-1, 2)
    ca = xla_cost_analysis(lambda p: mdef.apply_flat(p, coords, mcfg), params)
    assert ca.get("flops", 0) > 0


def test_ekfac_capture_and_precondition_shapes():
    from implicit_image_tpu.optim.ekfac import (
        capture_layer_stats,
        ekfac_init,
        ekfac_precondition,
        ekfac_update_stats,
    )

    mdef, mcfg = build_model("siren", depth=3, hidden_size=8)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    coords = get_grid(6, 6).reshape(-1, 2)
    target = jax.random.uniform(jax.random.PRNGKey(1), (36, 3))
    acts, grads = capture_layer_stats(mdef, mcfg, params, coords, target)
    assert len(acts) == 3 and len(grads) == 3
    assert acts[0].shape == (36, 2) and grads[0].shape == (36, 8)

    # per-sample grads sum to the bias gradient (consistency check)
    def loss(p):
        return jnp.mean((mdef.apply_flat(p, coords, mcfg) - target) ** 2)

    g_auto = jax.grad(loss)(params)
    np.testing.assert_allclose(
        np.asarray(grads[1].sum(0)), np.asarray(g_auto[1]["b"]), rtol=1e-4, atol=1e-7
    )

    state = ekfac_init(params)
    state = ekfac_update_stats(state, acts, grads)
    pre = ekfac_precondition(state, g_auto)
    for layer, orig in zip(pre, g_auto):
        for k in layer:
            assert layer[k].shape == orig[k].shape


def test_ekfac_fit_converges():
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit

    img = synthetic_image(16, 16, seed=0)
    grid = get_grid(16, 16)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=100, log_steps=50),
        OptimConfig(lr=1e-3, preconditioner="ekfac", precond_interval=10),
    )
    psnr = np.asarray(res.metrics["psnr"])
    psnr = psnr[~np.isnan(psnr)]
    assert np.isfinite(psnr).all() and psnr[-1] > 15.0, psnr


@pytest.mark.slow
def test_ekfac_m2_scale_comparable_to_eps():
    """The KFE second moments must carry the true per-sample gradient scale
    (grads x batch) — otherwise eps dominates and the preconditioner
    silently degenerates to uniform grads/eps scaling."""
    from implicit_image_tpu.data import get_grid, synthetic_image
    from implicit_image_tpu.models import build_model
    from implicit_image_tpu.optim.ekfac import (
        capture_layer_stats,
        ekfac_init,
        ekfac_update_stats,
    )

    img = synthetic_image(32, 32, seed=0).reshape(-1, 3)
    grid = get_grid(32, 32).reshape(-1, 2)
    mdef, mcfg = build_model("siren", depth=4, hidden_size=32)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    acts, grads = capture_layer_stats(mdef, mcfg, params, grid, img)
    st = ekfac_init(params)
    for _ in range(8):
        st = ekfac_update_stats(st, acts, grads, alpha=0.5)
    # with the batch rescale, m2 is within a few orders of eps=0.1 and the
    # division is no longer a uniform 1/eps
    assert max(float(m.max()) for m in st.m2) > 1e-3


def test_ekfac_capture_coordx():
    """EKFAC capture for the CoordX family (the flagship model): acts/
    grads align with the flat params order, per-sample pre-activation
    grads sum to the bias grad for branch AND fused layers, and a short
    EKFAC-preconditioned coordx fit improves PSNR."""
    from implicit_image_tpu.optim.ekfac import (
        capture_layer_stats,
        ekfac_init,
        ekfac_precondition,
        ekfac_update_stats,
    )

    mdef, mcfg = build_model(
        "coordx", depth=5, hidden_size=8, split_depth=2, fast_sine=False
    )
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    coords = get_grid(6, 6).reshape(-1, 2)
    target = jax.random.uniform(jax.random.PRNGKey(1), (36, 3))
    acts, grads = capture_layer_stats(mdef, mcfg, params, coords, target)
    assert len(acts) == len(params) == len(grads)
    # branch first layers see the 1-D coordinate input
    assert acts[0].shape == (36, 1) and acts[2].shape == (36, 1)

    def loss(p):
        return jnp.mean((mdef.apply_flat(p, coords, mcfg) - target) ** 2)

    g_auto = jax.grad(loss)(params)
    for i in range(len(params)):
        np.testing.assert_allclose(
            np.asarray(grads[i].sum(0)), np.asarray(g_auto[i]["b"]),
            rtol=1e-4, atol=1e-7, err_msg=f"layer {i}",
        )

    state = ekfac_init(params)
    state = ekfac_update_stats(state, acts, grads)
    pre = ekfac_precondition(state, g_auto)
    for layer, orig in zip(pre, g_auto):
        for k in layer:
            assert layer[k].shape == orig[k].shape


def test_ekfac_fit_coordx_converges():
    """preconditioner='ekfac' runs end-to-end on coordx (the guard that
    excluded the flagship family is gone)."""
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit

    img = synthetic_image(16, 16, seed=0)
    grid = get_grid(16, 16)
    mdef, mcfg = build_model("coordx", depth=5, hidden_size=16, split_depth=2)
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=60, log_steps=30),
        OptimConfig(lr=1e-3, preconditioner="ekfac", precond_interval=10),
    )
    p = np.asarray(res.metrics["psnr"])
    p = p[np.isfinite(p)]
    assert p.size and p[-1] > 10.0, p


def test_micronet_summary_matches_reference_counter():
    """Gold parity: micronet_summary equals the reference's own count_ops
    + process_counts aggregation (micronet_challenge.py:161-285,332-338)
    for the SIREN FC stack at several sparsities and bit widths."""
    import importlib.util

    path = ("/root/reference/implicit_image/pipeline/masking/counting/"
            "micronet_challenge.py")
    if not __import__("os").path.exists(path):
        pytest.skip("reference not mounted")
    spec = importlib.util.spec_from_file_location("ref_micronet", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from implicit_image_tpu.sparsity.counting import (
        micronet_score,
        micronet_summary,
    )

    mdef, mcfg = build_model("siren", depth=4, hidden_size=32)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    dims = [(l["w"].shape[0], l["w"].shape[1]) for l in params]

    for sparsity in (0.0, 0.5, 0.9):
        for param_bits, add_bits, mul_bits in ((32, 32, 32), (16, 16, 16)):
            # the reference counts a uniform sparsity across ops
            ops = [
                (f"fc_{i}",
                 ref.FullyConnected((fi, fo), True,
                                    "relu" if i < len(dims) - 1 else None))
                for i, (fi, fo) in enumerate(dims)
            ]
            # masks quantize sparsity to whole elements; feed the
            # reference each layer's ACTUAL mask sparsity
            masks, actual_s = [], []
            for fi, fo in dims:
                m = np.ones((fi, fo), np.float32)
                k = int(round(sparsity * fi * fo))
                m.ravel()[:k] = 0.0
                masks.append(m)
                actual_s.append(k / (fi * fo))

            tp = tm = ta = 0.0
            counter = ref.MicroNetCounter(ops)
            for (_, op), s_i in zip(ops, actual_s):
                pc, fm, fa = ref.count_ops(op, s_i, param_bits)
                tp += pc
                tm += fm
                ta += fa
            ref_p, ref_m, ref_a = counter.process_counts(
                tp, tm, ta, mul_bits, add_bits
            )
            got = micronet_summary(
                params, masks, param_bits, add_bits, mul_bits
            )
            np.testing.assert_allclose(got["params_mbytes"], ref_p, rtol=1e-6)
            np.testing.assert_allclose(got["mults_m"], ref_m, rtol=1e-6)
            np.testing.assert_allclose(got["adds_m"], ref_a, rtol=1e-6)

    # score semantics: dense fp32 normalizes to exactly 2.0; sparsity and
    # reduced bits shrink it
    assert abs(micronet_score(params) - 2.0) < 1e-9
    sparse_score = micronet_score(params, masks, param_bits=16,
                                  add_bits=16, mul_bits=16)
    assert sparse_score < 1.0


def test_conv_counting_matches_reference_counter():
    """Gold parity: conv_layer_flops / conv_param_bits equal the
    reference's Conv2D and DepthWiseConv2D branches of count_ops
    (micronet_challenge.py:161-285) across geometry, stride, padding,
    sparsity, and bit width."""
    import importlib.util
    import os

    path = ("/root/reference/implicit_image/pipeline/masking/counting/"
            "micronet_challenge.py")
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    spec = importlib.util.spec_from_file_location("ref_micronet2", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from implicit_image_tpu.sparsity.counting import (
        conv_layer_flops,
        conv_output_size,
        conv_param_bits,
    )

    cases = [
        # (img, k, c_in, c_out, stride, padding, sparsity, bias, act, bits)
        (32, 3, 8, 16, 1, "same", 0.0, True, True, 32),
        (32, 3, 8, 16, 2, "same", 0.5, True, True, 32),
        (17, 5, 4, 12, 1, "valid", 0.25, False, True, 16),
        (64, 1, 16, 8, 1, "same", 0.0, True, False, 32),
        (28, 7, 3, 10, 3, "valid", 0.9, True, True, 16),
    ]
    for img, k, ci, co, st, pad, s, bias, act, bits in cases:
        op = ref.Conv2D(img, [k, k, ci, co], [st, st], pad, bias,
                        "relu" if act else None)
        ref_pc, ref_m, ref_a = ref.count_ops(op, s, bits)
        got_m, got_a = conv_layer_flops(
            img, k, ci, co, stride=st, padding=pad, sparsity=s,
            has_bias=bias, activation=act)
        got_pc = conv_param_bits(k, ci, co, sparsity=s, has_bias=bias,
                                 param_bits=bits)
        np.testing.assert_allclose(got_m, ref_m, rtol=1e-9)
        np.testing.assert_allclose(got_a, ref_a, rtol=1e-9)
        np.testing.assert_allclose(got_pc, ref_pc, rtol=1e-9)
        assert conv_output_size(img, k, pad, st) == ref.get_conv_output_size(
            img, k, pad, st)

    # depthwise (groups == in_channels) branch
    for img, k, ch, st, pad, s, bias, act, bits in [
        (32, 3, 16, 1, "same", 0.0, True, True, 32),
        (20, 5, 8, 2, "valid", 0.5, False, True, 16),
        (15, 3, 4, 1, "same", 0.75, True, False, 32),
    ]:
        op = ref.DepthWiseConv2D(img, [k, k, ch, 1], [st, st], pad, bias,
                                 "relu" if act else None)
        ref_pc, ref_m, ref_a = ref.count_ops(op, s, bits)
        got_m, got_a = conv_layer_flops(
            img, k, ch, ch, stride=st, padding=pad, sparsity=s,
            has_bias=bias, activation=act, depthwise=True)
        got_pc = conv_param_bits(k, ch, ch, sparsity=s, has_bias=bias,
                                 param_bits=bits, depthwise=True)
        np.testing.assert_allclose(got_m, ref_m, rtol=1e-9)
        np.testing.assert_allclose(got_a, ref_a, rtol=1e-9)
        np.testing.assert_allclose(got_pc, ref_pc, rtol=1e-9)


def test_ekfac_capture_wavelet_siren():
    """EKFAC capture for wavelet_siren (r3 weak #7: the family was
    guarded out): per-layer sample counts differ between the LF and HF
    sub-SIRENs (each runs on its own DWT-resolution grid), per-sample
    pre-activation grads still sum to each layer's bias grad through the
    idwt + chroma-upsample + color transform, and preconditioning
    preserves shapes."""
    from implicit_image_tpu.optim.ekfac import (
        capture_layer_stats,
        ekfac_init,
        ekfac_precondition,
        ekfac_update_stats,
    )

    mdef, mcfg = build_model(
        "wavelet_siren", depth=3, hidden_size=8, height=16, width=16,
    )
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    coords = get_grid(16, 16).reshape(-1, 2)
    target = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    acts, grads = capture_layer_stats(mdef, mcfg, params, coords, target)
    assert len(acts) == len(params) == len(grads)
    n_lf_px = mcfg.lf_shape[0] * mcfg.lf_shape[1]
    n_hf_px = mcfg.hf_shape[0] * mcfg.hf_shape[1]
    assert acts[0].shape[0] == n_lf_px
    assert acts[mcfg.n_lf_layers].shape[0] == n_hf_px
    assert n_lf_px != 256  # genuinely its own grid, not the train grid

    def loss(p):
        return jnp.mean((mdef.apply_flat(p, coords, mcfg) - target) ** 2)

    g_auto = jax.grad(loss)(params)
    for i in range(len(params)):
        np.testing.assert_allclose(
            np.asarray(grads[i].sum(0)), np.asarray(g_auto[i]["b"]),
            rtol=1e-3, atol=1e-7, err_msg=f"layer {i}",
        )

    state = ekfac_init(params)
    state = ekfac_update_stats(state, acts, grads)
    pre = ekfac_precondition(state, g_auto)
    for layer, orig in zip(pre, g_auto):
        for k in layer:
            assert layer[k].shape == orig[k].shape


def test_ekfac_fit_wavelet_converges():
    """preconditioner='ekfac' runs end-to-end on wavelet_siren."""
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit

    img = synthetic_image(16, 16, seed=0)
    grid = get_grid(16, 16)
    mdef, mcfg = build_model(
        "wavelet_siren", depth=3, hidden_size=16, height=16, width=16,
    )
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=60, log_steps=30),
        OptimConfig(lr=1e-3, preconditioner="ekfac", precond_interval=10),
    )
    p = np.asarray(res.metrics["psnr"])
    p = p[np.isfinite(p)]
    assert p.size and p[-1] > 10.0, p


def test_ekfac_capture_hashgrid():
    """EKFAC for hashgrid (r3 weak #7: the second model family could not
    use the one live second-order feature): the feature TABLE is skipped
    (model_skip_indices — an embedding has no Kronecker structure and its
    A factor would be table_size²) and passes through unpreconditioned;
    the ReLU MLP ladder gets the standard capture whose per-sample grads
    sum to the bias grads."""
    from implicit_image_tpu.optim.ekfac import (
        capture_layer_stats,
        ekfac_init,
        ekfac_precondition,
        ekfac_update_stats,
        model_skip_indices,
    )

    mdef, mcfg = build_model(
        "hashgrid", levels=4, table_size=128, features=2,
        mlp_hidden=16, mlp_depth=3,
    )
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    skip = model_skip_indices(mdef.name, params)
    assert skip == frozenset({0})
    coords = get_grid(8, 8).reshape(-1, 2)
    target = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    acts, grads = capture_layer_stats(mdef, mcfg, params, coords, target)
    assert len(acts) == len(params) - 1  # table not captured

    def loss(p):
        return jnp.mean((mdef.apply_flat(p, coords, mcfg) - target) ** 2)

    g_auto = jax.grad(loss)(params)
    for j in range(len(acts)):
        np.testing.assert_allclose(
            np.asarray(grads[j].sum(0)), np.asarray(g_auto[j + 1]["b"]),
            rtol=1e-3, atol=1e-7, err_msg=f"mlp layer {j}",
        )

    state = ekfac_init(params, skip)
    assert len(state.ua) == len(params) - 1
    state = ekfac_update_stats(state, acts, grads)
    pre = ekfac_precondition(state, g_auto, skip=skip)
    # table grads pass through untouched
    np.testing.assert_array_equal(
        np.asarray(pre[0]["w"]), np.asarray(g_auto[0]["w"])
    )
    for layer, orig in zip(pre, g_auto):
        for k in layer:
            assert layer[k].shape == orig[k].shape


def test_ekfac_fit_hashgrid_converges():
    """preconditioner='ekfac' runs end-to-end on hashgrid (table on
    plain Adam, MLP preconditioned)."""
    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit

    img = synthetic_image(16, 16, seed=0)
    grid = get_grid(16, 16)
    mdef, mcfg = build_model(
        "hashgrid", levels=4, table_size=128, features=2,
        mlp_hidden=16, mlp_depth=3,
    )
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=60, log_steps=30),
        OptimConfig(lr=1e-3, preconditioner="ekfac", precond_interval=10),
    )
    p = np.asarray(res.metrics["psnr"])
    p = p[np.isfinite(p)]
    assert p.size and p[-1] > 10.0, p


def test_ekfac_chunked_stats_match_unchunked():
    """ekfac_update_stats_chunked == ekfac_update_stats on the same
    batch (both refresh modes) — the chunked Gram accumulation is the
    same math with bounded activation memory, removing the r3
    pixel_chunks>1 exclusion."""
    from implicit_image_tpu.optim.ekfac import (
        capture_layer_stats,
        ekfac_init,
        ekfac_update_stats,
        ekfac_update_stats_chunked,
    )

    mdef, mcfg = build_model("siren", depth=3, hidden_size=8,
                             fast_sine=False)
    params = mdef.init(jax.random.PRNGKey(0), mcfg)
    coords = get_grid(8, 8).reshape(-1, 2)
    target = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))

    acts, grads = capture_layer_stats(mdef, mcfg, params, coords, target)
    st0 = ekfac_init(params)
    # desynchronize m2 so the EMA blend is actually exercised
    st0 = st0._replace(m2=tuple(m * 1.7 for m in st0.m2))

    from implicit_image_tpu.optim.ekfac import ekfac_precondition

    def loss(p):
        from implicit_image_tpu.models.siren import siren_apply_flat

        return jnp.mean((siren_apply_flat(p, coords, mcfg) - target) ** 2)

    g_auto = jax.grad(loss)(params)
    for recompute in (True, False):
        ref = ekfac_update_stats(st0, acts, grads,
                                 recompute_eigs=recompute)
        chk = ekfac_update_stats_chunked(
            st0, mdef, mcfg, params, coords, target, chunks=4,
            recompute_eigs=recompute,
        )
        # raw eigvecs/m2 are basis-ORDER dependent (near-degenerate
        # eigenvalues permute under chunk-sum fp reassociation); the
        # functionally meaningful equality is the PRECONDITIONED grad,
        # which is basis-invariant
        pre_ref = ekfac_precondition(ref, g_auto)
        pre_chk = ekfac_precondition(chk, g_auto)
        for la, lb in zip(pre_ref, pre_chk):
            for k in la:
                np.testing.assert_allclose(
                    np.asarray(la[k]), np.asarray(lb[k]),
                    rtol=1e-3, atol=1e-5,
                )


def test_ekfac_fit_with_pixel_chunks():
    """preconditioner='ekfac' + pixel_chunks>1 now compose (per-pixel
    models); wavelet_siren still refuses (full-grid render)."""
    import pytest as _pytest

    from implicit_image_tpu.training.fit import OptimConfig, TrainConfig, fit

    img = synthetic_image(16, 16, seed=0)
    grid = get_grid(16, 16)
    mdef, mcfg = build_model("siren", depth=3, hidden_size=16)
    res = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=60, log_steps=30, pixel_chunks=4),
        OptimConfig(lr=1e-3, preconditioner="ekfac", precond_interval=10),
    )
    p = np.asarray(res.metrics["psnr"])
    p = p[np.isfinite(p)]
    assert p.size and p[-1] > 10.0, p

    # numerics: chunked ekfac fit == unchunked ekfac fit (both exact)
    res1 = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=30, log_steps=30),
        OptimConfig(lr=1e-3, preconditioner="ekfac", precond_interval=10),
    )
    res4 = fit(
        jax.random.PRNGKey(0), mdef, mcfg, grid, img,
        TrainConfig(num_steps=30, log_steps=30, pixel_chunks=4),
        OptimConfig(lr=1e-3, preconditioner="ekfac", precond_interval=10),
    )
    for la, lb in zip(res1.params, res4.params):
        for k in la:
            np.testing.assert_allclose(
                np.asarray(la[k]), np.asarray(lb[k]), atol=5e-5
            )

    wdef, wcfg = build_model(
        "wavelet_siren", depth=3, hidden_size=8, height=16, width=16,
    )
    with _pytest.raises(ValueError, match="full-grid"):
        fit(
            jax.random.PRNGKey(0), wdef, wcfg, grid, img,
            TrainConfig(num_steps=4, log_steps=4, pixel_chunks=4),
            OptimConfig(preconditioner="ekfac"),
        )
