"""Fused SIREN forward/backward as Pallas TPU kernels.

The fused kernel tiles the PIXEL axis: for each tile of rows, ALL layers
run back-to-back in VMEM (the weight stack is kept bf16-resident across
grid steps), so HBM activation traffic collapses to coords in + prediction
out. Sines use the polynomial approximations from ops/fast_math.py.

Backward rematerializes: each tile re-runs the forward stashing only the
f32 pre-activations z in VMEM scratch (activations a = sin(ω·z) are
recomputed on the VPU where needed), then backpropagates with single bf16
matmuls (f32 accumulation), accumulating weight/bias gradients across
sequential grid steps into VMEM-resident output blocks (initialized at
program_id 0).

MEASURED REALITY (TPU v5e, 512² pixels, width 128 / depth 8): XLA's own
lowering of the same chain is ALREADY MXU-bound at the ~25 TFLOPS rate a
K=N=128 dot can sustain on one MXU, and XLA overlaps the activation HBM
traffic behind the matmul chain — so this fused kernel matches but does
not beat XLA at the reference operating point, and `TrainConfig.use_pallas`
defaults to False. The kernel remains as the masked/fused building block
and for shapes where XLA scheduling falls behind; benchmarks/fit_speed.py
re-measures both paths.

Layout notes (guide: /opt/skills/guides/pallas_guide.md):
  * coords/outputs are padded to 8 lanes (f32 sublane tile) so HBM traffic
    stays ~N×8×4 B instead of N×128; hidden width is padded to a multiple
    of 128 lanes (zero-padded weights keep padded units exactly 0 through
    sin(0)=0).
  * matmuls take bf16 inputs with f32 accumulation
    (preferred_element_type), the MXU-native mode.

Equivalent reference computation: the SineLayer chain of
models/siren.py:56-68 / 123-134 (full-grid forward at compress.py:138).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from implicit_image_tpu.ops.fast_math import fast_cos, fast_sin

__all__ = ["siren_apply_flat_pallas"]

LANE = 128
PAD_IO = 8  # lanes for coords / output blocks


class _Spec(NamedTuple):
    depth: int
    hidden: int  # padded hidden width (multiple of 128)
    omega0: float
    omega_h: float
    tile: int
    n_tiles: int


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tile(h: int, n: int) -> int:
    # VMEM budget: bwd scratch is (depth-1)·tile·h·4B (f32 z) plus the bf16
    # weight stack and f32 grad accumulators; tile chosen to stay <~12 MB.
    if h <= 128:
        tile = 1024
    elif h <= 256:
        tile = 512
    else:
        tile = 256
    return min(tile, _round_up(n, 8))


# ------------------------------------------------------------------ forward


def _fwd_kernel(spec: _Spec, x_ref, w0_ref, wm_ref, wl_ref, bs_ref, bl_ref, out_ref):
    bf = jnp.bfloat16
    x = x_ref[:].astype(bf)
    z = jnp.dot(x, w0_ref[:], preferred_element_type=jnp.float32) + bs_ref[
        pl.ds(0, 1), :
    ]
    a = fast_sin(spec.omega0 * z).astype(bf)
    for i in range(spec.depth - 2):
        z = jnp.dot(a, wm_ref[i], preferred_element_type=jnp.float32) + bs_ref[
            pl.ds(i + 1, 1), :
        ]
        a = fast_sin(spec.omega_h * z).astype(bf)
    out_ref[:] = jnp.dot(a, wl_ref[:], preferred_element_type=jnp.float32) + bl_ref[:]


def _fwd_call(spec: _Spec, coords8, w0, wm, wl, bs, bl):
    n = coords8.shape[0]
    h = spec.hidden
    grid = (spec.n_tiles,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        out_shape=jax.ShapeDtypeStruct((n, PAD_IO), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((spec.tile, PAD_IO), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAD_IO, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (spec.depth - 2, h, h), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((h, PAD_IO), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.depth - 1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PAD_IO), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (spec.tile, PAD_IO), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * (PAD_IO * 2 + h * (spec.depth - 2)),
            bytes_accessed=n * PAD_IO * 8 + (spec.depth - 2) * h * h * 2,
            transcendentals=n * h * (spec.depth - 1),
        ),
    )(coords8, w0, wm, wl, bs, bl)


# ----------------------------------------------------------------- backward


def _bwd_kernel(
    spec: _Spec,
    x_ref,
    g_ref,
    w0_ref,
    wm_ref,
    wl_ref,
    bs_ref,
    dx_ref,
    dw0_ref,
    dwm_ref,
    dwl_ref,
    dbs_ref,
    dbl_ref,
    z_scr,
):
    bf = jnp.bfloat16
    f32 = jnp.float32
    depth, h = spec.depth, spec.hidden
    n_sine = depth - 1

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw0_ref[:] = jnp.zeros(dw0_ref.shape, dw0_ref.dtype)
        dwm_ref[:] = jnp.zeros(dwm_ref.shape, dwm_ref.dtype)
        dwl_ref[:] = jnp.zeros(dwl_ref.shape, dwl_ref.dtype)
        dbs_ref[:] = jnp.zeros(dbs_ref.shape, dbs_ref.dtype)
        dbl_ref[:] = jnp.zeros(dbl_ref.shape, dbl_ref.dtype)

    # --- recompute forward, stashing pre-activations z (f32) only ---
    x = x_ref[:].astype(bf)
    z = jnp.dot(x, w0_ref[:], preferred_element_type=f32) + bs_ref[pl.ds(0, 1), :]
    z_scr[0] = z
    a = fast_sin(spec.omega0 * z).astype(bf)
    for i in range(depth - 2):
        z = jnp.dot(a, wm_ref[i], preferred_element_type=f32) + bs_ref[
            pl.ds(i + 1, 1), :
        ]
        z_scr[i + 1] = z
        a = fast_sin(spec.omega_h * z).astype(bf)

    def sine_of(i):
        omega = spec.omega0 if i == 0 else spec.omega_h
        return fast_sin(omega * z_scr[i]).astype(bf)

    dT = (((0,), (0,)), ((), ()))  # contract rows: a^T @ g
    dN = (((1,), (1,)), ((), ()))  # g @ W^T

    g = g_ref[:]  # (T, PAD_IO) f32 cotangent of the last linear output
    gb = g.astype(bf)
    # last linear: out = a_{n_sine-1} @ wl + bl
    dwl_ref[:] += jax.lax.dot_general(
        sine_of(n_sine - 1), gb, dT, preferred_element_type=f32
    )
    dbl_ref[:] += jnp.sum(g, axis=0, keepdims=True)
    ga = jax.lax.dot_general(gb, wl_ref[:], dN, preferred_element_type=f32)
    for i in range(n_sine - 1, 0, -1):
        gz = ga * (spec.omega_h * fast_cos(spec.omega_h * z_scr[i]))
        gzb = gz.astype(bf)
        dwm_ref[i - 1] += jax.lax.dot_general(
            sine_of(i - 1), gzb, dT, preferred_element_type=f32
        )
        dbs_ref[pl.ds(i, 1), :] += jnp.sum(gz, axis=0, keepdims=True)
        ga = jax.lax.dot_general(gzb, wm_ref[i - 1], dN, preferred_element_type=f32)
    # first sine layer
    gz = ga * (spec.omega0 * fast_cos(spec.omega0 * z_scr[0]))
    gzb = gz.astype(bf)
    dw0_ref[:] += jax.lax.dot_general(x, gzb, dT, preferred_element_type=f32)
    dbs_ref[pl.ds(0, 1), :] += jnp.sum(gz, axis=0, keepdims=True)
    # coordinate cotangent: dx = gz @ w0^T (the XLA path returns this too;
    # zeros here would silently break coord-gradient uses like SDF normals)
    dx_ref[:] = jax.lax.dot_general(gzb, w0_ref[:], dN, preferred_element_type=f32)


def _bwd_call(spec: _Spec, coords8, g8, w0, wm, wl, bs):
    h = spec.hidden
    depth = spec.depth
    const2 = lambda i: (0, 0)  # noqa: E731
    const3 = lambda i: (0, 0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_bwd_kernel, spec),
        out_shape=(
            jax.ShapeDtypeStruct((coords8.shape[0], PAD_IO), jnp.float32),  # dx
            jax.ShapeDtypeStruct((PAD_IO, h), jnp.float32),  # dw0
            jax.ShapeDtypeStruct((depth - 2, h, h), jnp.float32),  # dwm
            jax.ShapeDtypeStruct((h, PAD_IO), jnp.float32),  # dwl
            jax.ShapeDtypeStruct((depth - 1, h), jnp.float32),  # dbs
            jax.ShapeDtypeStruct((1, PAD_IO), jnp.float32),  # dbl
        ),
        grid=(spec.n_tiles,),
        in_specs=[
            pl.BlockSpec((spec.tile, PAD_IO), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.tile, PAD_IO), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAD_IO, h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((depth - 2, h, h), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, PAD_IO), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((depth - 1, h), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((spec.tile, PAD_IO), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PAD_IO, h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((depth - 2, h, h), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, PAD_IO), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((depth - 1, h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PAD_IO), const2, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((depth - 1, spec.tile, h), jnp.float32),  # z_scr
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * spec.n_tiles * spec.tile * h * h * (depth - 2),
            bytes_accessed=spec.n_tiles * spec.tile * PAD_IO * 12,
            transcendentals=3 * spec.n_tiles * spec.tile * h * (depth - 1),
        ),
    )(coords8, g8, w0, wm, wl, bs)


# ------------------------------------------------------------- custom vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_siren(spec: _Spec, coords8, w0, wm, wl, bs, bl):
    return _fwd_call(spec, coords8, w0, wm, wl, bs, bl)


def _fused_fwd(spec, coords8, w0, wm, wl, bs, bl):
    out = _fwd_call(spec, coords8, w0, wm, wl, bs, bl)
    return out, (coords8, w0, wm, wl, bs)


def _fused_bwd(spec, res, g):
    coords8, w0, wm, wl, bs = res
    dx, dw0, dwm, dwl, dbs, dbl = _bwd_call(spec, coords8, g, w0, wm, wl, bs)
    return (dx, dw0, dwm, dwl, dbs, dbl)


_fused_siren.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------- public


def siren_apply_flat_pallas(params, coords: jnp.ndarray, cfg) -> jnp.ndarray:
    """Drop-in fused replacement for models.siren.siren_apply_flat.

    Requires outermost_linear=True (the reference's only configuration,
    conf/mlp/siren.yaml) and input_size<=PAD_IO, output_size<=PAD_IO.
    Weights enter VMEM as bf16 (the MXU input type); gradients flow back
    to the original f32 leaves through the bf16 cast.
    """
    assert cfg.outermost_linear, "fused kernel assumes a linear last layer"
    depth = cfg.depth
    in_sz = cfg.input_size
    out_sz = cfg.output_size
    hidden = params[0]["w"].shape[1]
    h = _round_up(hidden, LANE)
    n = coords.shape[0]
    tile = _pick_tile(h, n)
    n_pad = _round_up(n, tile)
    spec = _Spec(
        depth=depth,
        hidden=h,
        omega0=float(cfg.first_omega_0),
        omega_h=float(cfg.hidden_omega_0),
        tile=tile,
        n_tiles=n_pad // tile,
    )

    x = (coords - 0.5) * 2.0
    coords8 = jnp.zeros((n_pad, PAD_IO), jnp.float32)
    coords8 = coords8.at[:n, :in_sz].set(x)

    bf = jnp.bfloat16

    def pad2(a, r, c):
        return jnp.pad(a, ((0, r - a.shape[0]), (0, c - a.shape[1])))

    w0 = pad2(params[0]["w"], PAD_IO, h).astype(bf)
    wm = jnp.stack(
        [pad2(params[i]["w"], h, h) for i in range(1, depth - 1)]
    ).astype(bf)
    wl = pad2(params[depth - 1]["w"], h, PAD_IO).astype(bf)
    bs = jnp.stack(
        [jnp.pad(params[i]["b"], (0, h - params[i]["b"].shape[0])) for i in range(depth - 1)]
    )
    bl = jnp.pad(params[depth - 1]["b"], (0, PAD_IO - out_sz))[None, :]

    out = _fused_siren(spec, coords8, w0, wm, wl, bs, bl)
    return out[:n, :out_sz] / 2.0 + 0.5
