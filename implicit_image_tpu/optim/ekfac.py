"""EKFAC natural-gradient preconditioner (George et al. 2018).

Capability parity with reference `implicit_image/optim/ekfac.py` (EKFAC
:7-310) — NOTE: the reference's EKFAC is orphaned code: it is plumbed as a
`preconditioner` kwarg into train_epoch (train_helper.py:163-164) but never
constructed by the orchestrator. It is reimplemented here functionally and
actually wired (training/fit.py accepts precondition="ekfac" via
OptimConfig) so the capability is live.

Math (per Linear layer, batch of N samples):
  A = E[a aᵀ]   (layer inputs, bias column appended)   — eigvecs Ua
  G = E[g gᵀ]   (per-sample grads of the pre-activation) — eigvecs Ug
  KFE scaling  m2 = E[(Ugᵀ g a ᵀ Ua)²]  (running, EKFAC's re-scaling)
  precond(grad) = Ug · ((Ugᵀ grad Ua) / (m2 + eps)) · Uaᵀ

The torch original captures (a, g) with forward/backward hooks
(ekfac.py:247-279). Hooks don't exist functionally; instead per-sample
pre-activation gradients are obtained by differentiating w.r.t. explicit
zero "perturbations" added to each layer's pre-activation — one extra
backward pass, fully jittable. Eigendecompositions run at a configurable
interval (reference ra/update_freq semantics).
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["EkfacState", "ekfac_init", "ekfac_update_stats", "ekfac_precondition",
           "capture_layer_stats", "model_skip_indices",
           "ekfac_update_stats_chunked"]


class EkfacState(NamedTuple):
    ua: Tuple[jnp.ndarray, ...]  # (fan_in+1, fan_in+1) eigvecs per layer
    ug: Tuple[jnp.ndarray, ...]  # (fan_out, fan_out) eigvecs per layer
    m2: Tuple[jnp.ndarray, ...]  # (fan_out, fan_in+1) KFE second moments


def _perturbed_forward(params, coords, cfg, model_name: str):
    """Forward returning (out, per-layer inputs a), with explicit
    pre-activation perturbation inputs for per-sample grad capture."""
    from implicit_image_tpu.ops.fast_math import fast_sin

    def fwd(perturbs):
        acts = []
        if model_name == "siren":
            x = (coords - 0.5) * 2.0
            n = len(params)
            for i, layer in enumerate(params):
                acts.append(x)
                z = x @ layer["w"] + layer["b"] + perturbs[i]
                if not (i == n - 1 and cfg.outermost_linear):
                    sin_fn = fast_sin if getattr(cfg, "fast_sine", True) else jnp.sin
                    x = sin_fn(cfg.omegas[i] * z)
                else:
                    x = z
            out = x / 2.0 + 0.5
        elif model_name == "fourier":
            enc = params[0]["B"]
            xp = (2.0 * jnp.pi * coords) @ enc
            x = jnp.concatenate([jnp.sin(xp), jnp.cos(xp)], axis=-1)
            layers = params[1:]
            n = len(layers)
            for i, layer in enumerate(layers):
                acts.append(x)
                z = x @ layer["w"] + layer["b"] + perturbs[i]
                x = jnp.maximum(z, 0.0) if i < n - 1 else jax.nn.sigmoid(z)
            out = x
        elif model_name == "coordx":
            # mirror coordx_apply_flat (models/coordx.py): branches run per
            # point here, so every layer captures N per-pixel samples.
            # params order is [x-branch × s, y-branch × s, fused...] and
            # acts/grads must align with it (ekfac_init iterates params),
            # so the x-branch is traced first even though the apply fuses
            # (fy, fx).
            import math as _math

            sin_fn = fast_sin if getattr(cfg, "fast_sine", True) else jnp.sin
            s = cfg.split_depth
            px, py, pf = params[:s], params[s : 2 * s], params[2 * s :]
            pert_x, pert_y, pert_f = (
                perturbs[:s],
                perturbs[s : 2 * s],
                perturbs[2 * s :],
            )
            acts_x, acts_y, acts_f = [], [], []

            def branch(pslice, pert, x, acc):
                for i, layer in enumerate(pslice):
                    acc.append(x)
                    omega = cfg.first_omega_0 if i == 0 else cfg.hidden_omega_0
                    if layer["w"].shape[0] == 1:
                        z = x * layer["w"][0] + layer["b"] + pert[i]
                    else:
                        z = x @ layer["w"] + layer["b"] + pert[i]
                    x = sin_fn(omega * z)
                return x

            xs = (coords[:, 1:2] - 0.5) * 2.0
            ys = (coords[:, 0:1] - 0.5) * 2.0
            fx = branch(px, pert_x, xs, acts_x)
            fy = branch(py, pert_y, ys, acts_y)
            if cfg.fusion == "product":
                x = (fy * fx) * _math.sqrt(2.0)
            else:
                x = (fy + fx) * (1.0 / _math.sqrt(2.0))
            n = len(pf)
            for i, layer in enumerate(pf):
                acts_f.append(x)
                z = x @ layer["w"] + layer["b"] + pert_f[i]
                if not (i == n - 1 and cfg.outermost_linear):
                    x = sin_fn(cfg.hidden_omega_0 * z)
                else:
                    x = z
            out = x / 2.0 + 0.5
            acts.extend(acts_x + acts_y + acts_f)
        elif model_name == "wavelet_siren":
            # mirror wavelet_siren_apply (models/wavelet_siren.py:139-178):
            # TWO SIREN stacks on their OWN grids (LF at the DWT-LL
            # resolution, HF at the detail-band resolution — each layer
            # therefore captures its stack's sample count, not N), then
            # idwt + chroma upsample + color transform; the loss sees the
            # full-res flat output against the training target
            from implicit_image_tpu.models.wavelet_siren import (
                _grid_flat,
                ycbcr_to_rgb,
            )
            from implicit_image_tpu.ops.wavelet import idwt2

            def stack(pslice, pert, scfg, x):
                n_l = len(pslice)
                sf = fast_sin if getattr(scfg, "fast_sine", True) else jnp.sin
                for i, layer in enumerate(pslice):
                    acts.append(x)
                    z = x @ layer["w"] + layer["b"] + pert[i]
                    if not (i == n_l - 1 and scfg.outermost_linear):
                        x = sf(scfg.omegas[i] * z)
                    else:
                        x = z
                return x / 2.0 + 0.5

            n_lf = cfg.n_lf_layers
            lf_h, lf_w = cfg.lf_shape
            hf_h, hf_w = cfg.hf_shape
            lf_img = stack(
                params[:n_lf], perturbs[:n_lf], cfg.lf_config,
                (_grid_flat(lf_h, lf_w) - 0.5) * 2.0,
            ).reshape(lf_h, lf_w, cfg.output_size)
            hf_img = stack(
                params[n_lf:], perturbs[n_lf:], cfg.hf_config,
                (_grid_flat(hf_h, hf_w) - 0.5) * 2.0,
            ).reshape(hf_h, hf_w, 3)
            h, w = cfg.height, cfg.width
            y = idwt2(
                lf_img[:, :, 0], hf_img[:, :, 0], hf_img[:, :, 1],
                hf_img[:, :, 2], (h, w),
            )
            cbcr = jax.image.resize(
                lf_img[:, :, 1:], (h, w, 2), method="bilinear"
            )
            ycbcr = jnp.concatenate([y[:, :, None], cbcr], axis=-1)
            out = ycbcr_to_rgb(ycbcr).reshape(h * w, 3)
        elif model_name == "hashgrid":
            # params[0] is the fused feature table (models/hashgrid.py:38)
            # — an embedding, not a Linear layer: EKFAC's Kronecker factors
            # have no meaning for it (and A would be table_size²), so the
            # table is NOT captured (model_skip_indices) and its grads
            # pass through unpreconditioned; the ReLU MLP ladder gets the
            # standard capture on the pyramid features
            from implicit_image_tpu.models.hashgrid import _pyramid_features

            x = _pyramid_features(params[0]["w"], coords, cfg, None)
            layers = params[1:]
            n = len(layers)
            for i, layer in enumerate(layers):
                acts.append(x)
                z = x @ layer["w"] + layer["b"] + perturbs[i]
                # _mlp_ladder: ReLU hidden, LINEAR output (hashgrid.py:215)
                x = jnp.maximum(z, 0.0) if i < n - 1 else z
            out = x
        else:
            raise NotImplementedError(
                "EKFAC capture supports siren/fourier/coordx/wavelet_siren/"
                f"hashgrid, got {model_name}"
            )
        return out, acts

    return fwd


def model_skip_indices(model_name: str, params) -> frozenset:
    """Layer indices EKFAC must leave alone for this family (embedding
    tables etc. — no Kronecker structure). Shared by ekfac_init,
    ekfac_precondition and capture_layer_stats so factor order aligns."""
    if model_name == "hashgrid":
        return frozenset({0})
    return frozenset()


def capture_layer_stats(
    mdef, mcfg, params, coords, target
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Per-layer (a, g): layer inputs and per-sample pre-activation grads
    of the MSE loss — the functional analogue of the reference's
    save_input/save_grad_output hooks (ekfac.py:247-279)."""
    skip = model_skip_indices(mdef.name, params)
    lin_layers = [
        layer for i, layer in enumerate(params)
        if "w" in layer and i not in skip
    ]
    n = coords.shape[0]
    if mdef.name == "wavelet_siren":
        # each sub-SIREN runs on its OWN grid: LF layers see lf_h*lf_w
        # samples, HF layers hf_h*hf_w — per-layer sample counts differ
        # (the EKFAC math is per-layer; mismatched N across layers is fine)
        n_lf_px = mcfg.lf_shape[0] * mcfg.lf_shape[1]
        n_hf_px = mcfg.hf_shape[0] * mcfg.hf_shape[1]
        counts = [n_lf_px] * mcfg.n_lf_layers + [n_hf_px] * (
            len(lin_layers) - mcfg.n_lf_layers
        )
    else:
        counts = [n] * len(lin_layers)
    perturbs = [
        jnp.zeros((c, layer["w"].shape[1]), jnp.float32)
        for c, layer in zip(counts, lin_layers)
    ]
    fwd = _perturbed_forward([l for l in params], coords, mcfg, mdef.name)

    def loss_fn(perturbs):
        out, acts = fwd(perturbs)
        return jnp.mean((out - target) ** 2), acts

    grads, acts = jax.grad(loss_fn, has_aux=True)(perturbs)
    return acts, grads


def ekfac_init(params, skip: frozenset = frozenset()) -> EkfacState:
    """Factors for every Linear layer; `skip` (model_skip_indices) leaves
    non-Linear leaves like the hashgrid table without factors."""
    ua, ug, m2 = [], [], []
    for i, layer in enumerate(params):
        if "w" not in layer or i in skip:
            continue
        fi, fo = layer["w"].shape
        ua.append(jnp.eye(fi + 1))
        ug.append(jnp.eye(fo))
        m2.append(jnp.ones((fo, fi + 1)))
    return EkfacState(ua=tuple(ua), ug=tuple(ug), m2=tuple(m2))


def ekfac_update_stats(
    state: EkfacState,
    acts: List[jnp.ndarray],
    grads: List[jnp.ndarray],
    alpha: float = 0.75,
    recompute_eigs: bool = True,
) -> EkfacState:
    """Update Kronecker factors + KFE scalings from a fresh (a, g) capture."""
    ua_new, ug_new, m2_new = [], [], []
    for ua, ug, m2, a, g in zip(state.ua, state.ug, state.m2, acts, grads):
        n = a.shape[0]
        a1 = jnp.concatenate([a, jnp.ones((n, 1), a.dtype)], axis=1)
        # the captured per-sample grads carry the mean-loss 1/n factor;
        # true per-sample grads are n x larger (torch hooks see grad_output
        # of the SUM; the reference rescales the same way) — without this
        # m2 is ~n^2 too small and eps swamps it, degenerating the
        # preconditioner to uniform grads/eps scaling
        gs = g * n
        A = (a1.T @ a1) / n
        G = (gs.T @ gs) / n
        if recompute_eigs:
            _, ua = jnp.linalg.eigh(A)
            _, ug = jnp.linalg.eigh(G)
        # project per-sample stats into the KFE: m2 = E[(ugᵀ g)(a ᵀ ua)²]
        ga = (gs @ ug).T  # (fo, n)
        aa = (a1 @ ua).T  # (fi+1, n)
        m2_batch = (ga**2) @ (aa**2).T / n
        m2 = alpha * m2 + (1 - alpha) * m2_batch
        ua_new.append(ua)
        ug_new.append(ug)
        m2_new.append(m2)
    return EkfacState(ua=tuple(ua_new), ug=tuple(ug_new), m2=tuple(m2_new))


def ekfac_update_stats_chunked(
    state: EkfacState,
    mdef,
    mcfg,
    params,
    coords,
    target,
    chunks: int,
    alpha: float = 0.75,
    recompute_eigs: bool = True,
) -> EkfacState:
    """ekfac_update_stats with activation memory bounded at ONE pixel
    chunk — the capture+Gram accumulation runs as a `lax.scan` over
    `chunks` equal coordinate chunks, so preconditioner='ekfac' composes
    with train.pixel_chunks>1 (the r3 guard refused the combination
    because the full-grid capture re-materialized what pixel_chunks
    bounds). Per-pixel models only: wavelet_siren renders on its own
    full grids and cannot chunk (training/fit.py keeps its guard).

    Numerics match the unchunked path exactly (up to chunk-sum fp
    reassociation): A and G are plain Gram sums over chunks; m2 needs
    the eigenbasis, so a recompute step runs TWO chunk passes (pass 1
    accumulates A/G, eigh, pass 2 projects m2 in the NEW basis — the
    same order the unchunked update applies), while plain steps project
    in the carried basis in the single pass."""
    if mdef.name == "wavelet_siren":
        raise ValueError(
            "chunked EKFAC capture is undefined for full-grid models "
            "(wavelet_siren renders on its own DWT grids)"
        )
    n_total = coords.shape[0]
    assert n_total % chunks == 0, (n_total, chunks)
    n_c = n_total // chunks
    coords_c = coords.reshape(chunks, n_c, -1)
    target_c = target.reshape(chunks, n_c, -1)

    lin_shapes = [
        layer["w"].shape
        for i, layer in enumerate(params)
        if "w" in layer and i not in model_skip_indices(mdef.name, params)
    ]

    def chunk_stats(c_coords, c_target):
        """Per-chunk (a1ᵀa1, gsᵀgs, acts, gs) with global-mean loss
        scaling, so chunk Gram sums equal the full-batch Grams."""
        perturbs = [
            jnp.zeros((n_c, fo), jnp.float32) for _, fo in lin_shapes
        ]
        fwd = _perturbed_forward(
            [l for l in params], c_coords, mcfg, mdef.name
        )

        def loss_fn(perturbs):
            out, acts = fwd(perturbs)
            # SUM over the chunk / (n_total*C) == this chunk's share of
            # the global mean -> per-sample grads carry the same scaling
            # the unchunked capture's jnp.mean loss produces
            return jnp.sum((out - c_target) ** 2) / (
                n_total * out.shape[-1]
            ), acts

        grads, acts = jax.grad(loss_fn, has_aux=True)(perturbs)
        out = []
        for a, g in zip(acts, grads):
            a1 = jnp.concatenate([a, jnp.ones((n_c, 1), a.dtype)], axis=1)
            gs = g * n_total
            out.append((a1.T @ a1, gs.T @ gs, a1, gs))
        return out

    def gram_pass():
        def body(carry, xs):
            c_coords, c_target = xs
            stats = chunk_stats(c_coords, c_target)
            return (
                tuple(ca + s[0] for ca, s in zip(carry[0], stats)),
                tuple(cg + s[1] for cg, s in zip(carry[1], stats)),
            ), None

        init = (
            tuple(jnp.zeros((fi + 1, fi + 1)) for fi, _ in lin_shapes),
            tuple(jnp.zeros((fo, fo)) for _, fo in lin_shapes),
        )
        (a_sums, g_sums), _ = jax.lax.scan(
            body, init, (coords_c, target_c)
        )
        return a_sums, g_sums

    def m2_pass(ua_t, ug_t):
        def body(carry, xs):
            c_coords, c_target = xs
            stats = chunk_stats(c_coords, c_target)
            new = []
            for m2c, ua, ug, (_, _, a1, gs) in zip(
                carry, ua_t, ug_t, stats
            ):
                ga = (gs @ ug).T
                aa = (a1 @ ua).T
                new.append(m2c + (ga**2) @ (aa**2).T)
            return tuple(new), None

        init = tuple(
            jnp.zeros((fo, fi + 1)) for fi, fo in lin_shapes
        )
        m2_sums, _ = jax.lax.scan(body, init, (coords_c, target_c))
        return m2_sums

    if recompute_eigs:
        a_sums, g_sums = gram_pass()
        ua_t = tuple(jnp.linalg.eigh(a / n_total)[1] for a in a_sums)
        ug_t = tuple(jnp.linalg.eigh(g / n_total)[1] for g in g_sums)
    else:
        ua_t, ug_t = state.ua, state.ug
    m2_sums = m2_pass(ua_t, ug_t)
    m2_new = tuple(
        alpha * m2 + (1 - alpha) * (m2s / n_total)
        for m2, m2s in zip(state.m2, m2_sums)
    )
    return EkfacState(ua=ua_t, ug=ug_t, m2=m2_new)


def ekfac_precondition(
    state: EkfacState, grads, eps: float = 0.1,
    skip: frozenset = frozenset(),
):
    """Precondition a grads pytree (w/b leaves) in the KFE basis
    (reference _precond :96-162). `skip` layers (no factors — e.g. the
    hashgrid table) pass through unpreconditioned."""
    out = []
    j = 0
    for i, layer in enumerate(grads):
        if "w" not in layer or i in skip:
            out.append(layer)
            continue
        gw, gb = layer["w"], layer.get("b")
        ua, ug, m2 = state.ua[j], state.ug[j], state.m2[j]
        j += 1
        # combined (fan_out, fan_in+1) grad matrix, torch layout
        gmat = jnp.concatenate(
            [gw.T, (gb if gb is not None else jnp.zeros(gw.shape[1]))[:, None]],
            axis=1,
        )
        kfe = ug.T @ gmat @ ua
        kfe = kfe / (m2 + eps)
        pre = ug @ kfe @ ua.T
        new_layer = dict(layer)
        new_layer["w"] = pre[:, :-1].T
        if gb is not None:
            new_layer["b"] = pre[:, -1]
        out.append(new_layer)
    return tuple(out)
