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


def _pick_ts(S: int, block_s: int, has_scales: bool) -> int:
    """Largest power-of-two S-tile <= block_s dividing S. With int8 scales
    the transposed scale blocks [KV, ts] hit Mosaic's lane-axis rule
    (ts % 128 == 0 unless ts == S) — fail early with guidance instead of a
    cryptic lowering error. Engines avoid this by allocating cache rows via
    runtime.kvcache.pad_rows."""
    ts = min(block_s, S)
    while S % ts:
        ts //= 2
    if has_scales and ts != S and ts % 128:
        raise ValueError(
            f"int8-KV flash attention: cache row count {S} admits no "
            f"128-multiple S-tile (best divisor {ts}); allocate the cache "
            f"with runtime.kvcache.pad_rows(rows) (multiples of 256)")
    return ts


def _accum_tile(q_ref, kt, vt, mask, ks_row, vs_row,
                acc_ref, m_ref, l_ref, *, n_kv: int, head_dim: int):
    """One online-softmax update over a [tile, KV, D] fp32 KV block.

    mask: [1, tile] bool (rows allowed to attend); ks_row/vs_row: optional
    per-kv-head [tile] int8 scale rows ([KV, tile] views indexed at h).
    """
    D = head_dim
    maskf = mask.astype(jnp.float32)
    for h in range(n_kv):
        q = q_ref[0, h].astype(jnp.float32)                # [M, D]
        scores = jax.lax.dot_general(
            q, kt[:, h, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * (1.0 / (D ** 0.5))                             # [M, tile]
        if ks_row is not None:
            scores = scores * ks_row[h, :][None, :]
        scores = jnp.where(mask, scores, _NEG_INF)

        r = slice(h * q.shape[0], (h + 1) * q.shape[0])
        m_prev = m_ref[r, :1]
        l_prev = l_ref[r, :1]
        m_new = jnp.maximum(
            m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new) * maskf                # [M, tile]
        pv = p if vs_row is None else p * vs_row[h, :][None, :]
        acc_ref[r, :] = acc_ref[r, :] * alpha + jnp.dot(
            pv, vt[:, h, :], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        l_ref[r, :] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=1, keepdims=True),
            (q.shape[0], l_ref.shape[1]))
        m_ref[r, :] = jnp.broadcast_to(m_new, (q.shape[0], m_ref.shape[1]))


def _kernel(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref,
            acc_ref, m_ref, l_ref, *, ts: int, n_kv: int, head_dim: int):
    b, s = pl.program_id(0), pl.program_id(1)
    pos = pos_ref[b]

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
        _accum_tile(q_ref, kt, vt, span <= pos,
                    None if ks_ref is None else ks_ref[0],
                    None if vs_ref is None else vs_ref[0],
                    acc_ref, m_ref, l_ref, n_kv=n_kv, head_dim=head_dim)

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
    ts = _pick_ts(S, block_s, k_s is not None)
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


def _kernel2(base_ref, off_ref, q_ref, k_ref, v_ref, sk_ref, sv_ref,
             ks_ref, vs_ref, sks_ref, svs_ref, out_ref,
             acc_ref, m_ref, l_ref, *, ts: int, n_s: int, side_c: int,
             n_kv: int, head_dim: int):
    """Two-segment flash decode: grid steps 0..n_s-1 stream the main cache
    tiles (rows idx < base_pos[b]); the final step n_s folds the chunk side
    buffer (rows j <= offsets[b]) into the same online softmax."""
    b, s = pl.program_id(0), pl.program_id(1)
    base = base_ref[b]

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when((s < n_s) & (s * ts < base))
    def _():
        kt = k_ref[0].astype(jnp.float32)      # [ts, KV, D]
        vt = v_ref[0].astype(jnp.float32)
        span = (jax.lax.broadcasted_iota(jnp.int32, (1, ts), 1) + s * ts)
        _accum_tile(q_ref, kt, vt, span < base,
                    None if ks_ref is None else ks_ref[0],
                    None if vs_ref is None else vs_ref[0],
                    acc_ref, m_ref, l_ref, n_kv=n_kv, head_dim=head_dim)

    @pl.when(s == n_s)
    def _():
        kt = sk_ref[0].astype(jnp.float32)     # [C, KV, D]
        vt = sv_ref[0].astype(jnp.float32)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, side_c), 1)
        _accum_tile(q_ref, kt, vt, j <= off_ref[b],
                    None if sks_ref is None else sks_ref[0],
                    None if svs_ref is None else svs_ref[0],
                    acc_ref, m_ref, l_ref, n_kv=n_kv, head_dim=head_dim)

    out_ref[0] = (acc_ref[:] / l_ref[:, :1]).reshape(out_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def flash_decode_gqa_two_segment(q: jnp.ndarray, k_main: jnp.ndarray,
                                 v_main: jnp.ndarray, k_side: jnp.ndarray,
                                 v_side: jnp.ndarray, base_pos: jnp.ndarray,
                                 offsets: jnp.ndarray, k_ms=None, v_ms=None,
                                 k_ss=None, v_ss=None, block_s: int = 256,
                                 interpret: bool = False) -> jnp.ndarray:
    """Flash decode over the continuous-batching side-buffer layout
    (ops.attention.gqa_attention_two_segment semantics): slot b attends main
    cache rows idx < base_pos[b] plus side-buffer rows j <= offsets[b],
    under one online softmax. Main tiles past base_pos are skipped like
    flash_decode_gqa (scalar-prefetch block clamp + pl.when).

    q [B, H, D]; k/v_main [B, S, KV, D]; k/v_side [B, C, KV, D];
    base_pos/offsets [B] i32; scales optional [B, S|C, KV] f32.
    Returns [B, H, D] fp32.
    """
    B, H, D = q.shape
    S, KV = k_main.shape[1], k_main.shape[2]
    C = k_side.shape[1]
    M = H // KV
    ts = _pick_ts(S, block_s, k_ms is not None)
    n_s = S // ts

    qr = q.astype(jnp.float32).reshape(B, KV, M, D)
    kmt = None if k_ms is None else jnp.swapaxes(k_ms, 1, 2)   # [B, KV, S]
    vmt = None if v_ms is None else jnp.swapaxes(v_ms, 1, 2)
    kst = None if k_ss is None else jnp.swapaxes(k_ss, 1, 2)   # [B, KV, C]
    vst = None if v_ss is None else jnp.swapaxes(v_ss, 1, 2)

    def cache_map(b, s, base_ref, off_ref):
        # clamp: tiles past the last needed main tile — and the side step
        # s == n_s — re-map to an already-fetched block (Mosaic skips the
        # DMA). base == 0 gives div(-1, ts) == 0 (trunc), i.e. tile 0.
        last = jax.lax.div(base_ref[b] - 1, ts)
        return (b, jnp.clip(jnp.minimum(s, last), 0, n_s - 1), 0, 0)

    def scale_map(b, s, base_ref, off_ref):
        last = jax.lax.div(base_ref[b] - 1, ts)
        return (b, 0, jnp.clip(jnp.minimum(s, last), 0, n_s - 1))

    whole = lambda *a: (a[0], 0, 0, 0)
    whole3 = lambda *a: (a[0], 0, 0)

    in_specs = [
        pl.BlockSpec((1, KV, M, D), lambda b, s, p0, p1: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, KV, D), cache_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, KV, D), cache_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C, KV, D), whole, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C, KV, D), whole, memory_space=pltpu.VMEM),
    ]
    args = [qr, k_main, v_main, k_side, v_side]
    if kmt is not None:
        in_specs += [
            pl.BlockSpec((1, KV, ts), scale_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, ts), scale_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, C), whole3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, C), whole3, memory_space=pltpu.VMEM),
        ]
        args += [kmt, vmt, kst, vst]
        kernel = functools.partial(_kernel2, ts=ts, n_s=n_s, side_c=C,
                                   n_kv=KV, head_dim=D)
    else:
        def kernel(base_ref, off_ref, q_ref, k_ref, v_ref, sk_ref, sv_ref,
                   out_ref, acc_ref, m_ref, l_ref):
            _kernel2(base_ref, off_ref, q_ref, k_ref, v_ref, sk_ref, sv_ref,
                     None, None, None, None, out_ref, acc_ref, m_ref, l_ref,
                     ts=ts, n_s=n_s, side_c=C, n_kv=KV, head_dim=D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_s + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, KV, M, D),
                               lambda b, s, p0, p1: (b, 0, 0, 0),
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
    )(base_pos.astype(jnp.int32), offsets.astype(jnp.int32), *args)
    return out.reshape(B, H, D)


def _kernel_prefill(pos_ref, q_ref, posv_ref, k_ref, v_ref, ks_ref, vs_ref,
                    out_ref, acc_ref, m_ref, l_ref, *, ts: int, tq: int,
                    n_kv: int, m_per_kv: int, head_dim: int):
    """Block-causal flash prefill: grid (B, n_t, n_s); query tile t attends
    cache rows s <= pos[t_row]. Positions ride twice: scalar-prefetched
    (index maps + tile-skip scalar) and as a [tq, 1] VMEM block (the per-row
    vector mask — scalar-core refs can't feed vector ops)."""
    b, t, s = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    D, M = head_dim, m_per_kv
    T = pos_ref.shape[0]

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    tile_last = pos_ref[jnp.minimum((t + 1) * tq - 1, T - 1)]

    @pl.when(s * ts <= tile_last)
    def _():
        kt = k_ref[0].astype(jnp.float32)      # [ts, KV, D]
        vt = v_ref[0].astype(jnp.float32)
        row_pos = posv_ref[:, :1]                              # [tq, 1]
        span = (jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1) + s * ts)
        mask = span <= row_pos                                 # [tq, ts]
        # expand per-query-row mask to per-score-row (row r <-> query r//M):
        # broadcast+reshape splits the SUBLANE axis only (Mosaic-legal,
        # unlike a lane-splitting reshape or jnp.repeat)
        rmask = jnp.broadcast_to(mask[:, None, :],
                                 (tq, M, ts)).reshape(tq * M, ts)
        rmaskf = rmask.astype(jnp.float32)

        for h in range(n_kv):
            q = q_ref[0, :, h].astype(jnp.float32).reshape(tq * M, D)
            scores = jax.lax.dot_general(
                q, kt[:, h, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) * (1.0 / (D ** 0.5))                             # [tq*M, ts]
            if ks_ref is not None:
                scores = scores * ks_ref[0, h, :][None, :]
            scores = jnp.where(rmask, scores, _NEG_INF)

            r = slice(h * tq * M, (h + 1) * tq * M)
            m_prev = m_ref[r, :1]
            l_prev = l_ref[r, :1]
            m_new = jnp.maximum(
                m_prev, jnp.max(scores, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(scores - m_new) * rmaskf
            pv = p if vs_ref is None else p * vs_ref[0, h, :][None, :]
            acc_ref[r, :] = acc_ref[r, :] * alpha + jnp.dot(
                pv, vt[:, h, :], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            l_ref[r, :] = jnp.broadcast_to(
                l_prev * alpha + jnp.sum(p, axis=1, keepdims=True),
                (tq * M, l_ref.shape[1]))
            m_ref[r, :] = jnp.broadcast_to(m_new, (tq * M, m_ref.shape[1]))

    # acc rows are [KV, tq, M] flattened; out block carries that layout
    # (the wrapper transposes once outside the kernel)
    out_ref[0] = (acc_ref[:] / l_ref[:, :1]).reshape(out_ref.shape[1:])


@functools.partial(
    jax.jit, static_argnames=("block_s", "block_t", "interpret"))
def flash_prefill_gqa(q: jnp.ndarray, k_cache: jnp.ndarray,
                      v_cache: jnp.ndarray, q_positions: jnp.ndarray,
                      k_s=None, v_s=None, block_s: int = 256,
                      block_t: int = 64,
                      interpret: bool = False) -> jnp.ndarray:
    """Block-causal GQA prefill attention; mirrors ops.attention.gqa_attention
    (cache row s attends iff s <= q_positions[t]) without materializing the
    [T, S] score matrix, streaming the cache tile by tile per query tile.

    q [B, T, H, D]; k/v_cache [B, S, KV, D]; q_positions [T] i32 (absolute,
    monotone); k_s/v_s optional [B, S, KV] f32. Returns [B, T, H, D] fp32.
    """
    B, T, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    M = H // KV
    ts = _pick_ts(S, block_s, k_s is not None)
    tq = min(block_t, T)
    while T % tq:
        tq //= 2
    n_s, n_t = S // ts, T // tq

    # queries blocked over T as [B, T, KV, M, D]; positions ride twice (see
    # _kernel_prefill)
    qr = q.astype(jnp.float32).reshape(B, T, KV, M, D)
    posv = q_positions.astype(jnp.int32).reshape(T, 1)
    kst = None if k_s is None else jnp.swapaxes(k_s, 1, 2)  # [B, KV, S]
    vst = None if v_s is None else jnp.swapaxes(v_s, 1, 2)

    def cache_map(b, t, s, pos_ref):
        last = pos_ref[jnp.minimum((t + 1) * tq - 1, T - 1)]
        return (b, jnp.minimum(s, jax.lax.div(last, ts)), 0, 0)

    def scale_map(b, t, s, pos_ref):
        last = pos_ref[jnp.minimum((t + 1) * tq - 1, T - 1)]
        return (b, 0, jnp.minimum(s, jax.lax.div(last, ts)))

    in_specs = [
        pl.BlockSpec((1, tq, KV, M, D), lambda b, t, s, p: (b, t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tq, 1), lambda b, t, s, p: (t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, KV, D), cache_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, KV, D), cache_map, memory_space=pltpu.VMEM),
    ]
    args = [qr, posv, k_cache, v_cache]
    if kst is not None:
        in_specs += [
            pl.BlockSpec((1, KV, ts), scale_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, ts), scale_map, memory_space=pltpu.VMEM),
        ]
        args += [kst, vst]
        kernel = functools.partial(_kernel_prefill, ts=ts, tq=tq, n_kv=KV,
                                   m_per_kv=M, head_dim=D)
    else:
        def kernel(pos_ref, q_ref, posv_ref, k_ref, v_ref, out_ref,
                   acc_ref, m_ref, l_ref):
            _kernel_prefill(pos_ref, q_ref, posv_ref, k_ref, v_ref, None,
                            None, out_ref, acc_ref, m_ref, l_ref, ts=ts,
                            tq=tq, n_kv=KV, m_per_kv=M, head_dim=D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_t, n_s),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, KV, tq, M, D),
                               lambda b, t, s, p: (b, 0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((KV * M * tq, D), jnp.float32),
            pltpu.VMEM((KV * M * tq, 128), jnp.float32),
            pltpu.VMEM((KV * M * tq, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, T, M, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(q_positions.astype(jnp.int32), *args)
    return jnp.swapaxes(out, 1, 2).reshape(B, T, H, D)
