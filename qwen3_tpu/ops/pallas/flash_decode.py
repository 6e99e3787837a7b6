"""Flash-decode GQA attention Pallas kernel.

Replaces the dense masked-softmax decode attention (ops/attention.py,
reference math src/forward.c:141-195) with a single fused kernel per layer:
per batch slot it streams the KV cache S-tile by S-tile — each tile is one
fully contiguous [ts, KV*D] HBM read — keeps an online-softmax accumulator
per head in VMEM, and never materializes the [H, S] score matrix. int8 KV
tiles are handled by post-dot column scaling (scores) and pre-dot probability
scaling (values), so dequantized cache values are never written anywhere.

Tiles past a slot's position are skipped: the scalar-prefetched positions
clamp the S block index (Mosaic skips the re-DMA of an unchanged block) and
`pl.when` skips the compute — a decode step at position p reads ~p cache
rows, like the reference's O(pos) loop bound (src/forward.c:156).

Layouts:
  q     [B, KV, M, D] fp32  (M = H // KV query heads per kv head)
  k, v  [B, S, KV, D] fp32/bf16/int8  (block = one contiguous [ts,KV,D] read)
  k_s   [B, KV, S]    fp32 or None    (int8 scales, transposed)
  out   [B, KV, M, D] fp32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref,
            acc_ref, m_ref, l_ref, *, ts: int, n_kv: int, head_dim: int):
    b, s = pl.program_id(0), pl.program_id(1)
    pos = pos_ref[b]
    D = head_dim

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(s * ts <= pos)
    def _():
        kt = k_ref[0].astype(jnp.float32)      # [ts, KV, D]
        vt = v_ref[0].astype(jnp.float32)
        span = (jax.lax.broadcasted_iota(jnp.int32, (1, ts), 1) + s * ts)
        mask = span <= pos                                     # [1, ts]
        maskf = mask.astype(jnp.float32)

        for h in range(n_kv):
            q = q_ref[0, h].astype(jnp.float32)                # [M, D]
            scores = jax.lax.dot_general(
                q, kt[:, h, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) * (1.0 / (D ** 0.5))                             # [M, ts]
            if ks_ref is not None:
                scores = scores * ks_ref[0, h, :][None, :]
            scores = jnp.where(mask, scores, _NEG_INF)

            r = slice(h * q.shape[0], (h + 1) * q.shape[0])
            m_prev = m_ref[r, :1]
            l_prev = l_ref[r, :1]
            m_new = jnp.maximum(
                m_prev, jnp.max(scores, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(scores - m_new) * maskf                # [M, ts]
            pv = p if vs_ref is None else p * vs_ref[0, h, :][None, :]
            acc_ref[r, :] = acc_ref[r, :] * alpha + jnp.dot(
                pv, vt[:, h, :], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            l_ref[r, :] = jnp.broadcast_to(
                l_prev * alpha + jnp.sum(p, axis=1, keepdims=True), (q.shape[0], l_ref.shape[1]))
            m_ref[r, :] = jnp.broadcast_to(m_new, (q.shape[0], m_ref.shape[1]))

    out_ref[0] = (acc_ref[:] / l_ref[:, :1]).reshape(out_ref.shape[1:])


@functools.partial(
    jax.jit, static_argnames=("block_s", "interpret"))
def flash_decode_gqa(q: jnp.ndarray, k_cache: jnp.ndarray,
                     v_cache: jnp.ndarray, positions: jnp.ndarray,
                     k_s=None, v_s=None, block_s: int = 256,
                     interpret: bool = False) -> jnp.ndarray:
    """Single-token GQA attention; mirrors
    ops.attention.gqa_attention_per_slot (same masked-softmax values up to
    online-softmax fp32 reduction order).

    q [B, H, D]; k/v_cache [B, S, KV, D]; positions [B] i32;
    k_s/v_s optional [B, S, KV] f32. Returns [B, H, D] fp32.
    """
    B, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    M = H // KV
    ts = min(block_s, S)
    while S % ts:
        ts //= 2
    n_s = S // ts

    qr = q.astype(jnp.float32).reshape(B, KV, M, D)
    kf = k_cache
    vf = v_cache
    kst = None if k_s is None else jnp.swapaxes(k_s, 1, 2)  # [B, KV, S]
    vst = None if v_s is None else jnp.swapaxes(v_s, 1, 2)

    def cache_map(b, s, pos_ref):
        # clamp past-position tiles to the last needed tile: same block
        # index => Mosaic skips the copy. lax.div, not //: floor-division's
        # negative-operand fixup lowers to a select jaxpr the scalar core
        # rejects (positions are non-negative, so truncation == floor).
        return (b, jnp.minimum(s, jax.lax.div(pos_ref[b], ts)), 0, 0)

    def scale_map(b, s, pos_ref):
        return (b, 0, jnp.minimum(s, jax.lax.div(pos_ref[b], ts)))

    in_specs = [
        pl.BlockSpec((1, KV, M, D), lambda b, s, p: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, KV, D), cache_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, KV, D), cache_map, memory_space=pltpu.VMEM),
    ]
    args = [qr, kf, vf]
    if kst is not None:
        in_specs += [
            pl.BlockSpec((1, KV, ts), scale_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, ts), scale_map, memory_space=pltpu.VMEM),
        ]
        args += [kst, vst]
        kernel = functools.partial(_kernel, ts=ts, n_kv=KV, head_dim=D)
    else:
        def kernel(pos_ref, q_ref, k_ref, v_ref, out_ref,
                   acc_ref, m_ref, l_ref):
            _kernel(pos_ref, q_ref, k_ref, v_ref, None, None, out_ref,
                    acc_ref, m_ref, l_ref, ts=ts, n_kv=KV, head_dim=D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_s),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, KV, M, D), lambda b, s, p: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((KV * M, D), jnp.float32),
            pltpu.VMEM((KV * M, 128), jnp.float32),
            pltpu.VMEM((KV * M, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, M, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(positions.astype(jnp.int32), *args)
    return out.reshape(B, H, D)
