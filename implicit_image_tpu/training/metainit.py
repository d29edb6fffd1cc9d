"""Meta-learned initialization — amortize fit steps across images.

Learned initializations for coordinate networks (Tancik et al.,
arXiv:2012.02189) cut the per-image optimization budget by starting every
fit from weights meta-trained over an image distribution instead of the
random SIREN/CoordX init. The reference framework has no counterpart —
every reference run pays its full step budget from scratch
(/root/reference/implicit_image/compress.py:108-147 always constructs a
fresh model) — so this is a beyond-reference capability measured in
BASELINE.md ("Meta-learned initialization").

TPU-first design: we use first-order REPTILE (Nichol et al.,
arXiv:1803.02999) rather than MAML — the inner loop is a `lax.scan` of
ordinary Adam steps (identical math to the production fit step), the
meta-batch is a `vmap` over images, and a whole block of meta-steps
compiles to ONE XLA program. MAML's second-order unroll would hold the
full K-step graph for the backward pass; REPTILE's update
(θ ← θ + ε·mean(adapted − θ)) needs no meta-gradient, so memory stays at
one fit's footprint per vmapped lane and the MXU sees exactly the
production matmul shapes.

The artifact is a small .npz (the INR weights themselves) committed or
shipped with the framework like a codec's fixed probability tables: it is
shared encoder/decoder state, costs ZERO bits in any bitstream, and
`train.init_path` starts any fit from it.

Leakage discipline: `meta_pool` draws training images from the same
synthetic family as the benchmark stand-ins but from disjoint,
name-salted seeds, and refuses seeds colliding with any evaluation image.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from implicit_image_tpu.models import ModelDef, build_model
from implicit_image_tpu.ops.metrics import mse
from implicit_image_tpu.optim import opt_init, opt_update
from implicit_image_tpu.training.fit import OptimConfig

__all__ = [
    "MetaConfig",
    "meta_pool",
    "make_meta_chunk",
    "meta_train",
    "save_meta_init",
    "load_meta_init",
    "resolve_auto_init",
    "meta_precision",
    "WARM_BUDGET_MAX_STEPS",
]

# The measured warm-win budget regime. Under the bf16-era recipe warm
# starts SATURATED past ~1200 effective steps (BASELINE.md "Meta-learned
# initialization"); the round-5 tf32 re-measurement found NO saturation
# in-distribution through b3000 — warm+delta beats cold on BOTH axes at
# b2000 (flower +2.57 dB / −10.5% bytes, big_building +2.31 / −8.2%)
# and b3000 (flower 62.85 @ 80.7 KB vs cold 61.47 @ 89.9 KB). The gate
# is set at the largest MEASURED win; beyond it is unmeasured, not
# known-bad. (The content-axis caveat in resolve_auto_init is
# independent of this budget gate.)
WARM_BUDGET_MAX_STEPS = 3000

# evaluation images (bench.py / benchmarks/time_to_quality.py) — the meta
# pool must never contain them
_EVAL_NAMES = ("flower", "flower_foveon", "big_building", "bridge", "synthetic")


@dataclass(frozen=True)
class MetaConfig:
    """Defaults are the v5e-measured operating point (BASELINE.md
    "Meta-learned initialization"): K=50 inner steps, 300 outer steps,
    outer_lr 0.2. Measured negative regimes to avoid: outer_lr=1.0
    (full jump to the adapted mean) makes the post-adapt loss DIVERGE
    (8.9e-5 -> 1.3e-4 over 100 steps) and the resulting init lands the
    downstream fit in a ~45 dB basin 10 dB below a cold fit; K=16 is
    too short for 512² INRs (warm-b400 42.7 dB vs cold 47.5)."""

    pool_size: int = 16
    inner_steps: int = 50
    inner_lr: float = 3e-4
    outer_steps: int = 300
    outer_lr: float = 0.2  # REPTILE interpolation rate, annealed linearly to 0
    meta_batch: int = 4  # images per meta-step (vmapped lanes)
    # meta-steps per device execution (runtime wall-time budget ~60 s);
    # each meta-step costs meta_batch * inner_steps production train steps
    chunk: int = 25
    seed: int = 0


def meta_pool(
    height: int, width: int, n: int, extra_exclude: Tuple[str, ...] = ()
) -> np.ndarray:
    """(n, H, W, 3) float32 pool of synthetic meta-training images.

    Seeds are `stable_seed(f"metatrain_{i}")` — disjoint by construction
    from the evaluation stand-ins (seed 0 and `stable_seed(name)` for the
    protocol names); any collision is refused loudly rather than silently
    training on an eval image.
    """
    from implicit_image_tpu.data import stable_seed, synthetic_image

    banned = {0} | {stable_seed(nm) for nm in _EVAL_NAMES + tuple(extra_exclude)}
    imgs = []
    i = 0
    while len(imgs) < n:
        s = stable_seed(f"metatrain_{i}")
        i += 1
        if s in banned:
            continue
        imgs.append(synthetic_image(height, width, seed=s))
    return np.stack(imgs).astype(np.float32)


def _make_loss(mdef: ModelDef, mcfg, grid):
    h, w, c = grid.shape
    coords = grid.reshape(h * w, c)
    if mdef.separable:

        def loss_fn(params, target_flat):
            pred = mdef.apply(params, grid, mcfg, None)
            return mse(pred.reshape(h * w, -1), target_flat)

    else:

        def loss_fn(params, target_flat):
            return mse(mdef.apply_flat(params, coords, mcfg, None), target_flat)

    return loss_fn


def make_meta_chunk(mdef: ModelDef, mcfg, grid, meta_cfg: MetaConfig):
    """Build the jitted meta-block: `chunk` REPTILE steps as ONE program.

    (meta_params, pool(N,HW,C), key, start) ->
        (meta_params, key, losses(chunk,)) where losses[j] is the mean
    post-adaptation loss of meta-step start+j (the meta-training curve).
    `start` is traced so every block reuses one compiled program.
    """
    loss_fn = _make_loss(mdef, mcfg, grid)
    inner_optim = OptimConfig(lr=meta_cfg.inner_lr, lr_step_size=10**9)
    k_inner = meta_cfg.inner_steps
    b = meta_cfg.meta_batch
    total = meta_cfg.outer_steps

    def inner_adapt(meta_params, target_flat):
        opt_state = opt_init(meta_params, inner_optim)

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, target_flat)
            params, opt_state = opt_update(
                grads, opt_state, params, meta_cfg.inner_lr, inner_optim
            )
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(
            step, (meta_params, opt_state), None, length=k_inner
        )
        # post-adaptation loss (not losses[-1], which precedes the last
        # update) — the meta-curve should reflect the adapted weights
        return params, loss_fn(params, target_flat)

    def chunk_fn(meta_params, pool, key, start):
        n = pool.shape[0]

        def body(carry, j):
            meta_params, key = carry
            key, skey = jax.random.split(key)
            idx = jax.random.choice(skey, n, shape=(b,), replace=False)
            targets = pool[idx]  # (B, HW, C)
            adapted, post_loss = jax.vmap(inner_adapt, in_axes=(None, 0))(
                meta_params, targets
            )
            # linear outer-lr anneal (REPTILE §5): eps_j = eps0 * (1 - j/T)
            eps = meta_cfg.outer_lr * (
                1.0 - jnp.asarray(j, jnp.float32) / total
            )
            meta_params = jax.tree_util.tree_map(
                lambda m, a: m + eps * (a.mean(axis=0) - m),
                meta_params,
                adapted,
            )
            return (meta_params, key), post_loss.mean()

        steps = jnp.asarray(start, jnp.int32) + jnp.arange(meta_cfg.chunk)
        (meta_params, key), losses = jax.lax.scan(
            body, (meta_params, key), steps
        )
        return meta_params, key, losses

    return jax.jit(chunk_fn)


def meta_train(
    mdef: ModelDef,
    mcfg,
    grid,
    pool: np.ndarray,
    meta_cfg: MetaConfig,
    log=None,
):
    """Run REPTILE meta-training; returns (meta_params, losses, wall_s).

    The outer loop is chained `chunk`-sized compiled executions of one
    program (same runtime-watchdog discipline as training/fit.py's
    run_segment_chain).
    """
    n, h, w, c = pool.shape
    if grid.shape[:2] != (h, w):
        raise ValueError(f"grid {grid.shape} does not match pool {pool.shape}")
    if meta_cfg.outer_steps % meta_cfg.chunk:
        raise ValueError(
            f"chunk={meta_cfg.chunk} must divide outer_steps={meta_cfg.outer_steps}"
        )
    if meta_cfg.meta_batch > n:
        raise ValueError(
            f"meta_batch={meta_cfg.meta_batch} exceeds pool size {n}"
        )
    key = jax.random.PRNGKey(meta_cfg.seed)
    key, init_key = jax.random.split(key)
    meta_params = mdef.init(init_key, mcfg)
    pool_flat = jnp.asarray(pool.reshape(n, h * w, c))

    chunk_fn = make_meta_chunk(mdef, mcfg, grid, meta_cfg)
    chunk_fn.lower(
        meta_params, pool_flat, key, jnp.int32(0)
    ).compile()  # warm-compile outside the timed region

    t0 = time.perf_counter()
    losses = []
    for start in range(0, meta_cfg.outer_steps, meta_cfg.chunk):
        meta_params, key, chunk_losses = chunk_fn(
            meta_params, pool_flat, key, jnp.int32(start)
        )
        losses.append(chunk_losses)
        if log is not None:
            log(start + meta_cfg.chunk, float(chunk_losses[-1]))
    loss_curve = jnp.concatenate(losses)
    np.asarray(loss_curve[-1])  # force completion before reading the clock
    return meta_params, loss_curve, time.perf_counter() - t0


def save_meta_init(path, params, model_name: str, mcfg,
                   matmul_precision=None) -> None:
    """Persist a meta-init as a flat .npz (checkpoint.py conventions) with
    the architecture recorded so a mismatched load fails loudly.

    `matmul_precision` records the MXU pass precision the artifact was
    meta-trained under (train.matmul_precision): warm starts are basin
    state, and a basin tuned under 1-pass bf16 dynamics LOSES ~1 dB when
    consumed by a tensorfloat32 fit (measured, BASELINE.md "Matmul pass
    precision") — resolve_auto_init matches it against the run's."""
    import dataclasses

    from implicit_image_tpu.training.checkpoint import _flat_layers

    out = {
        "meta.n_layers": np.asarray(len(params)),
        "meta.model": np.asarray(model_name),
        "meta.matmul_precision": np.asarray(str(matmul_precision or "")),
    }
    for f in dataclasses.fields(mcfg):
        v = getattr(mcfg, f.name)
        if isinstance(v, (int, float, bool)):
            out[f"mcfg.{f.name}"] = np.asarray(v)
    _flat_layers("params", params, out)
    np.savez(path, **out)


def load_meta_init(path, expect_model: Optional[str] = None, expect_mcfg=None):
    """Load a meta-init .npz -> params pytree (tuple of layer dicts).

    With expect_model/expect_mcfg the recorded architecture is checked
    against the run's, so a w96 init can never silently enter a w128 fit
    (the jit error that would otherwise surface is unreadable).
    """
    import dataclasses

    from implicit_image_tpu.training.checkpoint import _unflat_layers

    data = np.load(path, allow_pickle=False)
    model = str(data["meta.model"])
    if expect_model is not None and model != expect_model:
        raise ValueError(
            f"meta-init {path} was trained for model {model!r}, "
            f"run configures {expect_model!r}"
        )
    if expect_mcfg is not None:
        for f in dataclasses.fields(expect_mcfg):
            k = f"mcfg.{f.name}"
            if k not in data:
                continue
            have, want = data[k].item(), getattr(expect_mcfg, f.name)
            if isinstance(want, (int, float, bool)) and have != want:
                raise ValueError(
                    f"meta-init {path} architecture mismatch: "
                    f"{f.name}={have} but run configures {f.name}={want}"
                )
    n = int(data["meta.n_layers"])
    return _unflat_layers("params", data, n)


def build_meta_model(model_name: str, **mlp_kwargs):
    """Convenience: (mdef, mcfg) for CLI/benchmark use."""
    return build_model(model_name, **mlp_kwargs)


def default_meta_dir():
    """The committed artifact store: <repo>/assets/meta."""
    from pathlib import Path

    return Path(__file__).resolve().parents[2] / "assets" / "meta"


def meta_precision(path) -> Optional[str]:
    """The matmul_precision an artifact was meta-trained under (None for
    pre-field artifacts = the 1-pass bf16 default era)."""
    data = np.load(path, allow_pickle=False)
    if "meta.matmul_precision" not in data:
        return None
    v = str(data["meta.matmul_precision"])
    return v or None


def resolve_auto_init(model_name: str, mcfg, num_steps: int, meta_dir=None,
                      matmul_precision=None):
    """`train.init_path=auto` warm/cold arbitration (VERDICT r3 item 4).

    Returns (params_or_None, path_or_None, reason). Warm is selected ONLY
    when both hold:
      * the effective budget (num_steps x multiplier, as passed) is inside
        the measured warm-win regime (<= WARM_BUDGET_MAX_STEPS — past it
        the warm asymptote loses decoded quality, BASELINE.md), and
      * a committed artifact in assets/meta/ matches the run's
        architecture (load_meta_init's model+mcfg validation).
    Otherwise (None, None, why) — the fit cold-starts, and the reason is
    logged so a user can see WHY auto declined the warm arm.

    Content-axis caveat (round 5, measured): the budget gate is
    necessary but NOT sufficient off-distribution. Under the tf32
    recipe the cold arm recovers its full strength on far-OOD
    structured content and the warm basin can CAP the fit — measured
    −5.1 dB on text-like glyphs at b1000 (the bf16-era "+4.8 dB warm
    win" there was an era artifact; BASELINE.md "OOD stress A/B —
    round-5"). For corpora far from the meta pool's statistics, prefer
    cold or A/B per corpus; auto cannot detect content cheaply and
    does not try.
    """
    from pathlib import Path

    if num_steps > WARM_BUDGET_MAX_STEPS:
        return None, None, (
            f"budget {num_steps} steps > warm-win regime "
            f"(<= {WARM_BUDGET_MAX_STEPS}, the largest measured warm "
            "win — beyond it is unmeasured; BASELINE.md), cold-starting"
        )
    root = Path(meta_dir) if meta_dir is not None else default_meta_dir()
    if not root.is_dir():
        return None, None, f"no artifact store at {root}"
    rejected = []
    for p in sorted(root.glob("*.npz")):
        try:
            art_prec = meta_precision(p)
            if art_prec != (matmul_precision or None):
                # basin state is precision-specific: a bf16-era artifact
                # consumed by a tf32 fit loses ~1 dB (BASELINE.md)
                rejected.append(
                    f"{p.name}: meta-trained under matmul_precision="
                    f"{art_prec}, run uses {matmul_precision or None}"
                )
                continue
            params = load_meta_init(
                p, expect_model=model_name, expect_mcfg=mcfg
            )
            return params, p, f"matched artifact {p.name}"
        except Exception as e:  # noqa: BLE001 - mismatches are expected
            rejected.append(f"{p.name}: {e}")
    return None, None, (
        "no matching artifact in "
        f"{root} ({'; '.join(rejected) if rejected else 'empty'})"
    )
