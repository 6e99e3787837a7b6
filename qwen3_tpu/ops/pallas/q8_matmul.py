"""Fused Q8_0 dequant + matmul Pallas kernel.

The hot op of the engine (the reference's src/forward.c:79-101 matvec): read
group-quantized int8 weights directly from HBM, dequantize tiles in VMEM, and
feed the MXU — weights never exist in HBM at more than 1 byte/param, so
bandwidth-bound decode runs ~2x faster than a bf16-dequantized weight copy.

Layout (produced by models.init_params in "pallas" mode):
  w_q [n, d] int8  — transposed so the contraction is the leading axis
  w_s [n/G, d] f32 — per-(group, out-column) scales
  x   [B, n]       — activations (f32 or bf16)
  out [B, d] f32

Grid: (d/TD, n/TK) with the contraction minor so each output tile stays
resident in VMEM while k accumulates into it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, ws_ref, out_ref, *, group_size: int,
            compute_dtype, postscale: bool):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tk, td = wq_ref.shape
    # f32 "dots" inside Mosaic default to bf16 passes; be explicit
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    if postscale:
        # scale applied per group AFTER the dot: fewer VPU ops (B*TD per
        # group instead of TK*TD) and exact int8 weights on the MXU
        xb = x_ref[:].astype(compute_dtype)
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        g = group_size
        for i in range(tk // g):
            dot = jnp.dot(xb[:, i * g:(i + 1) * g],
                          wq_ref[i * g:(i + 1) * g, :].astype(compute_dtype),
                          preferred_element_type=jnp.float32, precision=prec)
            acc = acc + dot * ws_ref[i, :][None, :]
        out_ref[:] += acc
    else:
        # dequantize the int8 tile: [TK, TD] grouped [TK/G, G, TD] * scales
        w = wq_ref[:].astype(jnp.float32).reshape(
            tk // group_size, group_size, td)
        w = (w * ws_ref[:][:, None, :]).reshape(tk, td).astype(compute_dtype)
        out_ref[:] += jnp.dot(x_ref[:].astype(compute_dtype), w,
                              preferred_element_type=jnp.float32,
                              precision=prec)


def _kernel_q8q8(xq_ref, xst_ref, wq_ref, ws_ref, out_ref, *,
                 group_size: int):
    """int8 x int8 kernel with reference-exact math (src/forward.c:88-97):
    exact int32 dot per quantization group on the MXU int8 path, then fp32
    scaling by x_scale * w_scale. VPU work is O(B * TD) per group (vs.
    O(TK * TD) for dequant-cast kernels), so HBM streaming is the limit.

    xst_ref holds this k-tile's activation scales TRANSPOSED to [gpt, B]:
    the per-tile slice must advance along a sublane (8-aligned) axis — Mosaic
    rejects non-128-aligned dynamic offsets in the lane (minor) axis."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tk, td = wq_ref.shape
    g = group_size
    gpt = tk // g                       # groups in this k tile

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i in range(gpt):
        dot = jnp.dot(xq_ref[:, i * g:(i + 1) * g],
                      wq_ref[i * g:(i + 1) * g, :],
                      preferred_element_type=jnp.int32)       # exact int32
        acc = acc + dot.astype(jnp.float32) * (
            xst_ref[i, :][:, None] * ws_ref[i, :][None, :])
    out_ref[:] += acc


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_k", "block_d", "interpret"),
)
def q8_q8_matmul_pallas(x_q: jnp.ndarray, x_s: jnp.ndarray,
                        w_q: jnp.ndarray, w_s: jnp.ndarray,
                        group_size: int, block_k: int = 512,
                        block_d: int = 1024,
                        interpret: bool = False) -> jnp.ndarray:
    """Fully quantized matmul: int8 activations (+ per-group scales) x Q8_0
    weights -> fp32. Group dot products are exact int32 (reference math,
    src/forward.c:88-97); the fp32 scale application can differ from
    ops.quant_matmul.q8_matmul_exact by reduction order (~1 ulp) on hardware,
    bitwise-equal under CPU interpret.

    x_q: int8 [..., n]; x_s: f32 [..., n/G]
    w_q: int8 [n, d];   w_s: f32 [n/G, d]
    """
    *lead, n = x_q.shape
    d = w_q.shape[1]
    xb = x_q.reshape(-1, n)
    # scales transposed to [n/G, b]: the k-tile slice advances on the sublane
    # axis (8-aligned), which Mosaic accepts — lane-axis offsets must be
    # 128-aligned and gpt-sized steps are not
    sbt = x_s.reshape(-1, n // group_size).T
    b = xb.shape[0]

    tk = _pick_tile(n, 8 * group_size, block_k)
    td = _pick_tile(d, 128, block_d)
    assert n % tk == 0 and d % td == 0, (n, tk, d, td)
    gpt = tk // group_size

    grid = (d // td, n // tk)
    out = pl.pallas_call(
        functools.partial(_kernel_q8q8, group_size=group_size),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        in_specs=[
            pl.BlockSpec((b, tk), lambda j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, b), lambda j, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, td), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // group_size, td), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, td), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d + 4 * (n // group_size) * d + b * n + 4 * b * d,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xb, sbt, w_q, w_s)
    return out.reshape(*lead, d)


def _pick_tile(n: int, quantum: int, cap: int) -> int:
    """Largest multiple of `quantum` dividing n, <= cap; falls back to the
    whole axis when no such divisor exists (Mosaic pads sub-tile blocks).
    The result ALWAYS divides n — a non-divisor tile would make the grid
    silently drop the axis tail."""
    t = min(cap, n)
    t -= t % quantum
    while t >= quantum:
        if n % t == 0:
            return t
        t -= quantum
    return n


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_k", "block_d", "interpret",
                     "compute_dtype", "postscale"),
)
def q8_matmul_pallas(x: jnp.ndarray, w_q: jnp.ndarray, w_s: jnp.ndarray,
                     group_size: int, block_k: int = 512, block_d: int = 512,
                     compute_dtype=jnp.float32, postscale: bool = False,
                     interpret: bool = False) -> jnp.ndarray:
    """x [..., n] @ dequant(w_q [n, d], w_s [n/G, d]) -> [..., d] fp32."""
    *lead, n = x.shape
    d = w_q.shape[1]
    xb = x.reshape(-1, n)
    b = xb.shape[0]

    # the scales block is (tk // G, td): Mosaic requires its sublane dim be a
    # multiple of 8 (or the full dimension), so tk must be a multiple of 8*G
    # unless it covers all of n
    tk = _pick_tile(n, 8 * group_size, block_k)
    td = _pick_tile(d, 128, block_d)
    assert n % tk == 0 and d % td == 0, (n, tk, d, td)

    grid = (d // td, n // tk)
    out = pl.pallas_call(
        functools.partial(_kernel, group_size=group_size,
                          compute_dtype=compute_dtype, postscale=postscale),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        in_specs=[
            pl.BlockSpec((b, tk), lambda j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, td), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // group_size, td), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, td), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d + 4 * (n // group_size) * d + 4 * b * (n + d),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xb, w_q, w_s)
    return out.reshape(*lead, d)
