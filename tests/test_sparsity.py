import numpy as np
import pytest

import jax
import jax.numpy as jnp

from implicit_image_tpu.models import build_model
from implicit_image_tpu.optim import adam_init
from implicit_image_tpu.sparsity import (
    MaskingConfig,
    apply_masks,
    create_mask_state,
    total_density,
    update_connections,
)
from implicit_image_tpu.sparsity.decay import (
    cosine_decay,
    cumulative_sparsity,
    linear_decay,
    magnitude_prune_decay,
)
from implicit_image_tpu.sparsity.init_scheme import erdos_renyi_probs, init_masks
from implicit_image_tpu.sparsity.prune import (
    global_magnitude_prune,
    magnitude_prune,
    ranks_ascending,
)
from implicit_image_tpu.sparsity.grow import abs_grad_growth, momentum_growth


def _params(key, depth=4, hidden=32):
    mdef, cfg = build_model("siren", depth=depth, hidden_size=hidden)
    return mdef.init(key, cfg)


# ---------- decay schedules ----------


def test_cosine_decay():
    fn = cosine_decay(0.3, T_max=100)
    np.testing.assert_allclose(float(fn(0)), 0.3, atol=1e-6)
    np.testing.assert_allclose(float(fn(50)), 0.15, atol=1e-6)
    np.testing.assert_allclose(float(fn(100)), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(fn(500)), 0.0, atol=1e-6)  # clamped


def test_linear_decay():
    fn = linear_decay(0.4, T_max=100)
    np.testing.assert_allclose(float(fn(25)), 0.3, atol=1e-6)
    np.testing.assert_allclose(float(fn(200)), 0.0, atol=1e-6)


def test_zhu_gupta_cumulative():
    # endpoints of the cubic schedule (reference decay.py:134-145)
    s0 = float(cumulative_sparsity(0, 0.0, 0.8, T_start=100, T_max=1000))
    s_start = float(cumulative_sparsity(100, 0.0, 0.8, T_start=100, T_max=1000))
    s_end = float(cumulative_sparsity(1000, 0.0, 0.8, T_start=100, T_max=1000))
    s_mid = float(cumulative_sparsity(550, 0.0, 0.8, T_start=100, T_max=1000))
    assert s0 == 0.0 and s_start == 0.0
    np.testing.assert_allclose(s_end, 0.8, atol=1e-6)
    np.testing.assert_allclose(s_mid, 0.8 * (1 - 0.5**3), atol=1e-6)
    # prune rate vs actual current sparsity
    fn = magnitude_prune_decay(0.8, T_max=1000, T_start=100, interval=100)
    assert float(fn(550, 0.5)) == pytest.approx(s_mid - 0.5, abs=1e-6)
    assert float(fn(550, 0.9)) == 0.0  # thresholded at 0


# ---------- init schemes ----------


def test_erk_epsilon_solver_hits_target_density():
    shapes = [(2, 64), (64, 64), (64, 64), (64, 3)]
    for density in [0.1, 0.5]:
        probs = erdos_renyi_probs(shapes, density, is_kernel=True)
        total = sum(np.prod(s) for s in shapes)
        expect_nnz = sum(p * np.prod(s) for p, s in zip(probs, shapes))
        np.testing.assert_allclose(expect_nnz / total, density, rtol=0.02)
        assert all(0 < p <= 1.0 for p in probs)


def test_erk_small_layers_denser():
    """ERK allocates higher density to layers with larger (sum/prod)."""
    shapes = [(2, 64), (64, 64), (64, 3)]
    probs = erdos_renyi_probs(shapes, 0.3)
    assert probs[0] > probs[1] and probs[2] > probs[1]


def test_random_init_keeps_first_layer_dense():
    masks = init_masks(
        jax.random.PRNGKey(0), [(2, 8), (8, 8), (8, 3)], 0.5, scheme="random"
    )
    assert masks[0] is None
    assert masks[1] is not None


def test_resume_init():
    w = jnp.asarray([[0.0, 1.0], [2.0, 0.0]])
    masks = init_masks(
        jax.random.PRNGKey(0), [w.shape], 0.5, scheme="resume", weights=[w]
    )
    np.testing.assert_array_equal(np.asarray(masks[0]), [[0, 1], [1, 0]])


def test_lottery_dist_preserves_density():
    m = np.zeros((8, 8), np.float32)
    m[:2] = 1.0
    masks = init_masks(
        jax.random.PRNGKey(0),
        [(8, 8)],
        0.5,
        scheme="lottery-ticket-dist",
        lottery_masks=[m],
    )
    assert float(masks[0].sum()) == 16.0


# ---------- prune / grow primitives ----------


def test_ranks_ascending():
    x = jnp.asarray([3.0, 1.0, 2.0])
    np.testing.assert_array_equal(np.asarray(ranks_ascending(x)), [2, 0, 1])


def test_magnitude_prune_counts():
    w = jnp.arange(1, 17, dtype=jnp.float32).reshape(4, 4)
    mask = jnp.ones_like(w)
    # prune 25% of 16 nonzeros -> remove 4 smallest (1..4)
    new = magnitude_prune(mask, w, jnp.asarray(0.25), jnp.asarray(16.0))
    assert float(new.sum()) == 12.0
    np.testing.assert_array_equal(np.asarray(new.reshape(-1)[:4]), [0, 0, 0, 0])


def test_magnitude_prune_ignores_masked():
    w = jnp.asarray([[0.0, 5.0], [1.0, 2.0]])
    mask = jnp.asarray([[0.0, 1.0], [1.0, 1.0]])  # 3 nonzero
    # rate 1/3 -> remove ceil(1) = weight 1.0
    new = magnitude_prune(mask, w, jnp.asarray(1 / 3), jnp.asarray(3.0))
    np.testing.assert_array_equal(np.asarray(new), [[0, 1], [0, 1]])


def test_global_magnitude_prune_exact():
    w1 = jnp.asarray([[1.0, 10.0]])
    w2 = jnp.asarray([[2.0, 20.0]])
    masks = [jnp.ones_like(w1), jnp.ones_like(w2)]
    # baseline 4 nonzeros, rate 0.5 -> kill 2 globally smallest (1.0, 2.0)
    new, removed = global_magnitude_prune(masks, [w1, w2], jnp.asarray(0.5), jnp.asarray(4.0))
    assert float(removed) == 2.0
    np.testing.assert_array_equal(np.asarray(new[0]), [[0, 1]])
    np.testing.assert_array_equal(np.asarray(new[1]), [[0, 1]])


def test_abs_grad_growth():
    mask = jnp.asarray([[1.0, 0.0], [0.0, 0.0]])
    w = jnp.asarray([[5.0, 0.0], [0.0, 0.0]])
    grad = jnp.asarray([[9.0, 3.0], [7.0, 1.0]])
    new_mask, new_w = abs_grad_growth(mask, w, grad, jnp.asarray(2.0))
    # grows the two largest-|grad| holes: (1,0) grad 7 and (0,1) grad 3
    np.testing.assert_array_equal(np.asarray(new_mask), [[1, 1], [1, 0]])
    # regrown weights start at exactly 0; existing weight untouched
    np.testing.assert_array_equal(np.asarray(new_w), [[5, 0], [0, 0]])


def test_growth_never_exceeds_holes():
    mask = jnp.ones((2, 2))
    new_mask, _ = abs_grad_growth(mask, mask, mask, jnp.asarray(4.0))
    assert float(new_mask.sum()) == 4.0


# ---------- end-to-end mask update ----------


def _mask_setup(cfg, key=0, depth=4, hidden=32):
    params = _params(jax.random.PRNGKey(key), depth=depth, hidden=hidden)
    state = create_mask_state(jax.random.PRNGKey(key + 1), params, cfg)
    params = apply_masks(params, state.masks)
    return params, state


def _fake_grads(params, key):
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(
        treedef, [jax.random.normal(k, l.shape) for k, l in zip(keys, leaves)]
    )


@pytest.mark.slow
def test_rigl_update_preserves_density():
    cfg = MaskingConfig()  # RigL defaults: magnitude prune + abs-grad growth
    params, state = _mask_setup(cfg)
    d0 = float(total_density(state))
    grads = _fake_grads(params, jax.random.PRNGKey(7))
    momenta = [None] * len(params)
    new_params, new_state = update_connections(
        params, grads, momenta, state, jnp.asarray(0.3), jax.random.PRNGKey(8), cfg
    )
    d1 = float(total_density(new_state))
    # deterministic prune+grow: density preserved exactly
    np.testing.assert_allclose(d1, d0, atol=1e-6)
    # masks actually changed topology
    changed = sum(
        float(jnp.sum(jnp.abs(m0 - m1)))
        for m0, m1 in zip(state.masks, new_state.masks)
        if m0 is not None
    )
    assert changed > 0
    # weights respect the new masks
    for layer, m in zip(new_params, new_state.masks):
        if m is not None:
            assert float(jnp.sum(jnp.abs(layer["w"] * (1 - m)))) == 0.0


def test_gmp_update_reduces_density():
    cfg = MaskingConfig(
        name="Pruning",
        density=1.0,
        sparse_init="random",
        prune_mode="global-magnitude",
        growth_mode="none",
        redistribution_mode="none",
        decay_schedule="magnitude-prune",
        final_density=0.5,
        start_when=5,
        end_when=100,
        interval=10,
    )
    params, state = _mask_setup(cfg)
    d0 = float(total_density(state))
    assert d0 == 1.0
    grads = _fake_grads(params, jax.random.PRNGKey(9))
    momenta = [None] * len(params)
    new_params, new_state = update_connections(
        params, grads, momenta, state, jnp.asarray(0.2), jax.random.PRNGKey(10), cfg
    )
    d1 = float(total_density(new_state))
    np.testing.assert_allclose(d1, 0.8, atol=0.01)


def test_snfs_update_with_redistribution():
    cfg = MaskingConfig(
        name="SNFS",
        density=0.2,
        growth_mode="momentum",
        redistribution_mode="momentum",
    )
    params, state = _mask_setup(cfg)
    d0 = float(total_density(state))
    grads = _fake_grads(params, jax.random.PRNGKey(11))
    momenta = [
        jax.random.normal(jax.random.PRNGKey(12 + i), layer["w"].shape)
        if m is not None
        else None
        for i, (layer, m) in enumerate(zip(params, state.masks))
    ]
    new_params, new_state = update_connections(
        params, grads, momenta, state, jnp.asarray(0.3), jax.random.PRNGKey(13), cfg
    )
    d1 = float(total_density(new_state))
    # redistribution keeps total roughly constant (residual solver caps at 99%)
    assert abs(d1 - d0) < 0.05


def test_update_connections_jittable():
    cfg = MaskingConfig()
    params, state = _mask_setup(cfg)
    grads = _fake_grads(params, jax.random.PRNGKey(14))
    momenta = [None] * len(params)

    @jax.jit
    def run(params, grads, state, rate, key):
        return update_connections(params, grads, momenta, state, rate, key, cfg)

    new_params, new_state = run(
        params, grads, state, jnp.asarray(0.3), jax.random.PRNGKey(15)
    )
    d0, d1 = float(total_density(state)), float(total_density(new_state))
    np.testing.assert_allclose(d1, d0, atol=1e-6)
