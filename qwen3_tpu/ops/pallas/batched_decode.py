"""Dense batched decode-attention Pallas kernel over the STACKED KV cache.

The continuous-batching decode step's attention previously ran as an XLA
einsum whose K/V operand was `cache[l]` extracted per layer — a bucket-switch
operand XLA materializes as a full contiguous slab copy (5.7 ms of the
21.5 ms B=64 step, 27%, PROFILE.md round 4) — with the dots themselves
consuming the slab at only ~210 GB/s. This kernel removes both terms: it
DMAs K/V tiles of layer `l` directly from the stacked [L, B, S, KV, D] HBM
array via a scalar-prefetched layer index (only the host-chosen bucket's
rows), overlapping tile fetch with the batched dots — no slab copy exists.

Dot structure — the "expanded-column" GQA formulation. Per slot, the tile
[ts, KV, D] is viewed as k2 [ts*KV, D] (a sublane-merge reshape, free on
TPU — unlike a lane-level flatten, which round 5 measured at 11.7 ms/step
as in-kernel VPU copies and 13.5 ms/step as an XLA reshape of the cache).
ONE MXU pass computes every (query row, kv head) score:

  scores_full[r, s*KV + kv'] = sum_d q[r, d] * k[s, kv', d]

and a broadcasted-iota column mask keeps only kv' == r // M (each query
row's own kv head) with s < row_limit. The online softmax runs over the
masked expanded axis (masked columns contribute exact zeros), and the
value pass needs NO un-expansion: p [R, ts*KV] @ v2 [ts*KV, D] contracts
the expanded axis directly into [R, D]. The KV-fold FLOP inflation is
irrelevant (the MXU is idle in decode); what matters is that tiles stream
at DMA rate. This is NOT the per-slot flash grid (which loses at these
shapes: 64 slots x tiles x 36 layers of [4, 128] dots hit a ~0.5 us
per-dot floor, PROFILE.md): one grid step serves `bb` slots with 2 large
dots each.

int8 KV needs no tile dequant multiply: int8->bf16 conversion is exact,
K scales multiply the SCORES (scale is constant over d) and V scales fold
into the probs — both via flat [L, B, S*KV] scale operands the serving
loop reshapes ONCE per chunk (loop-invariant; runtime/batched.py).

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
    E = ts * n_kv                         # expanded column count
    dot_t = jnp.bfloat16 if fast else jnp.float32
    prec = (lax.Precision.DEFAULT if fast else lax.Precision.HIGHEST)
    inv = 1.0 / (d ** 0.5)

    @pl.when(isx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    base = isx * ts
    # expanded column c = s*KV + kv'; query row r owns kv head r // M
    rowkv = lax.broadcasted_iota(jnp.int32, (R, E), 0) // m_per
    col = lax.broadcasted_iota(jnp.int32, (R, E), 1)
    colkv = col % n_kv
    cols = col // n_kv + base             # absolute cache row of column c
    head_ok = colkv == rowkv              # limit-independent part

    for b in range(bb):
        limit = limit_ref[ib * bb + b]
        k2 = k_ref[0, b].astype(dot_t).reshape(E, d)   # sublane merge: free
        v2 = v_ref[0, b].astype(dot_t).reshape(E, d)
        qr = q_ref[b].astype(dot_t)                    # [R, D]
        scores = lax.dot_general(
            qr, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec) * inv
        if ks_ref is not None:
            scores = scores * ks_ref[0, b:b + 1, :]    # [1, E] broadcast
        mask = head_ok & (cols < limit)                # [R, E]
        scores = jnp.where(mask, scores, _NEG_INF)

        m_prev = m_ref[b, :, :1]                       # [R, 1]
        l_prev = l_ref[b, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new) * mask.astype(jnp.float32)  # [R, E]
        # V scales fold into the value-dot operand only — the softmax
        # denominator `l` sums the UNscaled probabilities
        pv = p if vs_ref is None else p * vs_ref[0, b:b + 1, :]
        contrib = lax.dot_general(
            pv.astype(dot_t), v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # [R, D]
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
                           k_sflat=None, v_sflat=None, *, bucket: int | None,
                           fast: bool = True, block_s: int = 256,
                           interpret: bool = False):
    """Flash-style PARTIALS of batched decode attention over the main cache.

    q          [B, H, D] (query heads in head order — row r is query head r,
               kv head r // M)
    k/v_stk    [L, B, S, KV, D] int8/bf16/f32 (the full stacked cache)
    layer      traced i32 — which layer's slab to read (scalar-prefetched)
    row_limit  [B] i32 — slot b attends cache rows idx < row_limit[b]
    k/v_sflat  optional [L, B, S*KV] f32 int8 scales, FLATTENED so scale of
               expanded column s*KV+kv sits at flat index s*KV+kv
               (= the natural [S, KV] reshape; loop-invariant per serving
               chunk — see runtime/batched.py)
    bucket     static: rows to read (must be >= max(row_limit) and a
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

    kmap = lambda ib, isx, lr, _: (lr[0], ib, isx, 0, 0)
    smap = lambda ib, isx, lr, _: (lr[0], ib, isx)
    qmap = lambda ib, isx, *_: (ib, 0, 0)

    in_specs = [
        pl.BlockSpec((bb, R, D), qmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bb, ts, KV, D), kmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bb, ts, KV, D), kmap, memory_space=pltpu.VMEM),
    ]
    args = [q.astype(jnp.float32), k_stk, v_stk]
    if k_sflat is not None:
        in_specs += [
            pl.BlockSpec((1, bb, ts * KV), smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, ts * KV), smap, memory_space=pltpu.VMEM),
        ]
        args += [k_sflat, v_sflat]
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
