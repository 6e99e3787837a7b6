"""Dense batched decode-attention Pallas kernel over the STACKED KV cache.

The continuous-batching decode step's attention previously ran as an XLA
einsum whose K/V operand was `cache[l]` extracted per layer — a bucket-switch
operand XLA materializes as a full contiguous slab copy (5.7 ms of the
21.5 ms B=64 step, 27%, PROFILE.md round 4) — with the dots themselves
consuming the slab at only ~210 GB/s. This kernel removes both terms: it
DMAs K/V tiles of layer `l` directly from the stacked [L, B, S, KV*D] HBM
array via a scalar-prefetched layer index (only the host-chosen bucket's
rows), overlapping tile fetch with the batched dots — no slab copy exists.

Dot structure — why this is NOT the per-slot flash grid (which loses at
these shapes: 64 slots x tiles x 36 layers of [4, 128] dots hit a ~0.5 us
per-dot launch floor, PROFILE.md): per slot, the GQA score dots
[M, D] x [D, ts] for all KV heads are embedded block-diagonally into ONE
MXU contraction

  scores[kv*M + m, s] = sum_{kv', d} q_bd[kv*M+m, kv'*D+d] * k[s, kv'*D+d]

with q_bd zero off-block, so the K tile is consumed in its NATIVE
[ts, KV*D] row layout — no transpose, no reshape, no per-head slicing.
The KV-fold FLOP inflation is irrelevant (the MXU is idle in decode);
what matters is that the tile streams at DMA rate. The value pass runs
the same trick in reverse: probs [R, ts] x v [ts, KV*D] produces every
(row, kv') block; off-diagonal garbage is masked and folded by
lane-aligned static slices (rows of v feed the MXU in native layout too).

int8 KV is handled WITHOUT dequantizing the tiles: int8->bf16 conversion
is exact, K scales multiply the SCORES (scale[s, kv] is constant over d),
and V scales fold into the probs before the value dot — both via a
[KV, S]-transposed scale operand the serving loop pre-transposes ONCE per
chunk (loop-invariant; runtime/batched.py).

The kernel returns UNNORMALIZED flash-style partials (acc, m, l) for the
main segment; the chunk side buffer (C ~ 32 rows) is folded in afterwards
by plain XLA ops under the same online softmax
(ops.attention.fused_batched_attention), so the result matches
gqa_attention_two_segment up to fp32 reduction order.

Reference semantics anchor: src/forward.c:141-195 (per-head scores over
0..pos, softmax, value accumulation); this kernel is its TPU-first form
for B concurrent streams at distinct positions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(layer_ref, limit_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
            acc_out, m_out, l_out, acc_ref, m_ref, l_ref,
            *, bb: int, ts: int, n_s: int, n_kv: int, m_per: int, d: int,
            fast: bool):
    ib, isx = pl.program_id(0), pl.program_id(1)
    R = n_kv * m_per
    KVD = n_kv * d
    dot_t = jnp.bfloat16 if fast else jnp.float32
    prec = (lax.Precision.DEFAULT if fast else lax.Precision.HIGHEST)
    inv = 1.0 / (d ** 0.5)

    @pl.when(isx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    base = isx * ts
    # block-diagonal q embedding / value-diagonal selection mask:
    # row r belongs to kv head r // M; column block kv' = col // D
    rowkv = lax.broadcasted_iota(jnp.int32, (R, KVD), 0) // m_per
    colkv = lax.broadcasted_iota(jnp.int32, (R, KVD), 1) // d
    qmask = rowkv == colkv
    span = lax.broadcasted_iota(jnp.int32, (1, ts), 1) + base

    for b in range(bb):
        limit = limit_ref[ib * bb + b]
        kt = k_ref[0, b].astype(dot_t)                    # [ts, KVD]
        qr = q_ref[b].astype(dot_t)                       # [R, D]
        qbd = jnp.where(qmask, jnp.concatenate([qr] * n_kv, axis=1),
                        jnp.zeros((), dot_t))             # [R, KVD]
        scores = lax.dot_general(
            qbd, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec) * inv
        if ks_ref is not None:
            kst = ks_ref[0, b]                            # [KV, ts] f32
            fac = jnp.broadcast_to(
                kst[:, None, :], (n_kv, m_per, ts)).reshape(R, ts)
            scores = scores * fac
        mask = span < limit                               # [1, ts]
        scores = jnp.where(mask, scores, _NEG_INF)

        m_prev = m_ref[b, :, :1]                          # [R, 1]
        l_prev = l_ref[b, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new) * mask.astype(jnp.float32)  # [R, ts]
        if vs_ref is not None:
            vst = vs_ref[0, b]
            vfac = jnp.broadcast_to(
                vst[:, None, :], (n_kv, m_per, ts)).reshape(R, ts)
            pv_in = (p * vfac).astype(dot_t)
        else:
            pv_in = p.astype(dot_t)
        full = lax.dot_general(
            pv_in, v_ref[0, b].astype(dot_t), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # [R, KVD]
        fullm = jnp.where(qmask, full, 0.0)
        contrib = fullm[:, 0:d]
        for k2 in range(1, n_kv):
            contrib = contrib + fullm[:, k2 * d:(k2 + 1) * d]
        acc_ref[b] = acc_ref[b] * alpha + contrib
        l_ref[b] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=1, keepdims=True),
            (R, l_ref.shape[2]))
        m_ref[b] = jnp.broadcast_to(m_new, (R, m_ref.shape[2]))

    @pl.when(isx == n_s - 1)
    def _():
        acc_out[:] = acc_ref[:]
        m_out[:] = m_ref[:]
        l_out[:] = l_ref[:]


def _pick_bb(B: int, ts: int, kvd: int, esize: int) -> int:
    """Largest slot-tile (<= 8, dividing B) whose double-buffered K+V tile
    blocks stay inside a ~9 MB VMEM budget (of ~16 MB/core)."""
    budget = 9 << 20
    cap = max(1, budget // max(ts * kvd * esize * 4, 1))
    for c in (8, 4, 2, 1):
        if c <= cap and B % c == 0:
            return c
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("bucket", "fast", "block_s", "interpret"))
def batched_decode_partial(q: jnp.ndarray, k_stk: jnp.ndarray,
                           v_stk: jnp.ndarray, layer, row_limit: jnp.ndarray,
                           k_sct=None, v_sct=None, *, bucket: int | None,
                           fast: bool = True, block_s: int = 256,
                           interpret: bool = False):
    """Flash-style PARTIALS of batched decode attention over the main cache.

    q         [B, H, D] (query heads in head order — row r is query head r,
              kv head r // M, so q IS the block-diagonal row layout)
    k/v_stk   [L, B, S, KV, D] int8/bf16/f32 (the full stacked cache)
    layer     traced i32 — which layer's slab to read (scalar-prefetched)
    row_limit [B] i32 — slot b attends cache rows idx < row_limit[b]
    k/v_sct   optional [L, B, KV, S] f32 int8 scales, PRE-TRANSPOSED
              (loop-invariant per serving chunk; see runtime/batched.py)
    bucket    static: rows to read (must be >= max(row_limit) and a
              multiple of the S-tile; None = full S)

    Returns (acc [B, KV, M, D] f32 unnormalized, m [B, KV, M],
    l [B, KV, M]): softmax-combine with other segments outside, or
    normalize as acc / l[..., None].
    """
    B, H, D = q.shape
    L, _, S, KV, _ = k_stk.shape
    M = H // KV
    R = H
    KVD = KV * D
    bucket = S if bucket is None else min(bucket, S)
    ts = min(block_s, bucket)
    while bucket % ts:
        ts //= 2
    n_s = bucket // ts
    bb = _pick_bb(B, ts, KVD, k_stk.dtype.itemsize)
    n_b = B // bb

    # free metadata reshape: [ts, KV, D] rows are contiguous [ts, KV*D]
    kr = k_stk.reshape(L, B, S, KVD)
    vr = v_stk.reshape(L, B, S, KVD)

    kmap = lambda ib, isx, lr, _: (lr[0], ib, isx, 0)
    smap = lambda ib, isx, lr, _: (lr[0], ib, 0, isx)
    qmap = lambda ib, isx, *_: (ib, 0, 0)

    in_specs = [
        pl.BlockSpec((bb, R, D), qmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bb, ts, KVD), kmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bb, ts, KVD), kmap, memory_space=pltpu.VMEM),
    ]
    args = [q.astype(jnp.float32), kr, vr]
    if k_sct is not None:
        in_specs += [
            pl.BlockSpec((1, bb, KV, ts), smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, KV, ts), smap, memory_space=pltpu.VMEM),
        ]
        args += [k_sct, v_sct]
        kernel = functools.partial(_kernel, bb=bb, ts=ts, n_s=n_s, n_kv=KV,
                                   m_per=M, d=D, fast=fast)
    else:
        def kernel(layer_ref, limit_ref, q_ref, k_ref, v_ref,
                   acc_out, m_out, l_out, acc_ref, m_ref, l_ref):
            _kernel(layer_ref, limit_ref, q_ref, k_ref, v_ref, None, None,
                    acc_out, m_out, l_out, acc_ref, m_ref, l_ref,
                    bb=bb, ts=ts, n_s=n_s, n_kv=KV, m_per=M, d=D, fast=fast)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_b, n_s),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bb, R, D), qmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, R, 128), qmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, R, 128), qmap, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, R, D), jnp.float32),
            pltpu.VMEM((bb, R, 128), jnp.float32),
            pltpu.VMEM((bb, R, 128), jnp.float32),
        ],
    )
    acc, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, R, D), jnp.float32),
            jax.ShapeDtypeStruct((B, R, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, R, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32),
      row_limit.astype(jnp.int32), *args)
    return (acc.reshape(B, KV, M, D),
            m[:, :, 0].reshape(B, KV, M),
            l[:, :, 0].reshape(B, KV, M))
