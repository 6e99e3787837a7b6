"""GQA attention (reference-semantics path, fp32 softmax).

The reference computes, per head, scores q.k/sqrt(head_dim) over positions
0..pos from an fp32 KV cache, softmax, then a weighted value sum
(src/forward.c:141-195). Here the same math is expressed batched over heads
and positions as masked dense attention — later replaced by Pallas flash
kernels on the hot path.

Layouts:
  q        [B, T, n_heads, head_dim]
  kv cache [B, S, n_kv_heads, head_dim]
GQA maps query head h to kv head h // (n_heads // n_kv_heads)
(src/forward.c:146,158).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the last axis restricted to `mask` (bool)."""
    neg = jnp.finfo(jnp.float32).min
    s = jnp.where(mask, scores, neg)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m) * mask.astype(jnp.float32)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _deq(cache: jnp.ndarray, scales, dtype=jnp.float32) -> jnp.ndarray:
    """Dequantized view of the cache; int8 caches carry per-(pos, head)
    scales. `dtype=bfloat16` halves the materialized-temp HBM traffic for
    the bf16-quality serving mode (scale multiply still in fp32)."""
    f = cache.astype(jnp.float32)
    if scales is not None:
        f = f * scales[..., None]
    return f.astype(dtype)


def _bucket_sizes(s: int, smallest: int = 256) -> list[int]:
    """Power-of-two prefix lengths up to S (always including S)."""
    sizes = []
    b = smallest
    while b < s:
        sizes.append(b)
        b *= 2
    sizes.append(s)
    return sizes


def _bucketed(attend, max_pos: jnp.ndarray, s: int, caches, layer=None,
              static_bucket: int | None = None):
    """Dispatch `attend(sliced caches...)` over the smallest power-of-two
    cache prefix covering `max_pos`.

    Cache rows past the mask contribute exactly 0.0 to the masked softmax and
    the value sum, so each branch is bit-identical to the full-S computation —
    this only cuts HBM traffic (a decode step at position p reads ~p rows
    instead of the full padded seq_len; the reference's O(pos) scan,
    src/forward.c:156-165, gets the same effect for free from its loop bound).

    `layer`: when given, `caches` are the LAYER-STACKED [L, B, S, ...]
    arrays and each branch extracts layer `layer` itself. Either way XLA
    materializes a per-layer slab copy as the dot operand
    (`dynamic-slice_bitcast` in the B=64 ledger, PROFILE.md) — but the
    full-slab extract is CONTIGUOUS and runs at ~550 GB/s (2.46 ms per
    K/V at B=64, 576 rows).

    `static_bucket`: when given, skip the runtime switch entirely and read
    exactly the first `static_bucket` rows (the serving engine can pick
    the bucket on the host between chunks — it knows every slot's
    position — and dispatch a per-bucket compiled program). Measured and
    REJECTED as the default on chip (round 4): the static 256-row prefix
    of the [B, S, ...] cache is a B-STRIDED copy that XLA's emitter runs
    at ~110 GB/s (5.6 ms per K/V — 2.3x the full contiguous slab it
    replaces), so the B=64 step goes 20.9 -> 27.2 ms and aggregate drops
    2313 -> 1961 tok/s (interleaved A/B, tools/ab_static_bucket.py).
    Forcing materialization via optimization_barrier does not recover it.
    The switch's full-slab operand is the fast layout; a prefix slice
    only becomes contiguous under an [S, B, ...] cache order. Kept for
    probes (engine env QWEN3_TPU_STATIC_BUCKET=1, LEDGER_BUCKET).
    """
    take = (lambda c: c) if layer is None else (
        lambda c: jax.lax.dynamic_index_in_dim(c, layer, 0, keepdims=False))
    if static_bucket is not None:
        n = min(static_bucket, s)
        return attend(*(None if c is None else take(c)[:, :n]
                        for c in caches))
    sizes = _bucket_sizes(s)
    if len(sizes) == 1:
        return attend(*(None if c is None else take(c) for c in caches))

    def branch(n):
        def run():
            return attend(*(None if c is None else take(c)[:, :n]
                            for c in caches))
        return run

    idx = jnp.searchsorted(jnp.asarray(sizes, jnp.int32), max_pos + 1)
    return jax.lax.switch(idx, [branch(n) for n in sizes])


def gqa_attention_per_slot(q: jnp.ndarray, k_cache: jnp.ndarray,
                           v_cache: jnp.ndarray, positions: jnp.ndarray,
                           k_s=None, v_s=None,
                           fast: bool = False, layer=None,
                           static_bucket: int | None = None) -> jnp.ndarray:
    """Single-token GQA attention with a distinct position per batch slot.

    q: [B, H, D]; k/v_cache: [B, S, KV, D] — or the layer-stacked
    [L, B, S, KV, D] with `layer` set (see _bucketed); positions: [B] int32.
    Slot b attends cache slots 0..positions[b]. Returns [B, H, D] fp32.

    `fast`: bf16 score/value MXU passes + bf16 dequant temps (fp32 softmax
    and accumulation) — the pallas-fast serving mode's quality class. The
    default path keeps fp32-HIGHEST reference numerics. (Two block-diagonal
    restructurings of the GQA dots — flattening the cache to [B, S, KV*D],
    and a 4-D (kv, d) contraction — both measured SLOWER on chip than this
    plain batched einsum: 47.6 / 29.1 vs 27.4 ms per B=64 serving step; the
    flat reshape materializes layout copies, and the 8x FLOP inflation of
    block-diagonal loses to XLA's own handling of the small dots. See
    PROFILE.md.)
    """
    B, H, D = q.shape
    cshape = k_cache.shape[1:] if layer is not None else k_cache.shape
    S, KV = cshape[1], cshape[2]
    M = H // KV

    dot_t = jnp.bfloat16 if fast else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    qf = q.astype(dot_t).reshape(B, KV, M, D)

    def attend(kc, vc, ks, vs):
        s = kc.shape[1]
        kf = _deq(kc, ks, dot_t)
        vf = _deq(vc, vs, dot_t)
        scores = jnp.einsum(
            "bkmd,bskd->bkms", qf, kf, precision=prec,
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(jnp.float32(D))
        mask = (jnp.arange(s, dtype=jnp.int32)[None, :]
                <= positions[:, None])                   # [B, s]
        probs = _masked_softmax(scores, mask[:, None, None, :])
        out = jnp.einsum(
            "bkms,bskd->bkmd", probs.astype(dot_t), vf, precision=prec,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(B, H, D)

    return _bucketed(attend, jnp.max(positions), S,
                     (k_cache, v_cache, k_s, v_s), layer=layer,
                     static_bucket=static_bucket)


def gqa_attention_two_segment(q: jnp.ndarray, k_main: jnp.ndarray,
                              v_main: jnp.ndarray, k_side: jnp.ndarray,
                              v_side: jnp.ndarray, base_pos: jnp.ndarray,
                              offsets: jnp.ndarray,
                              k_ms=None, v_ms=None, k_ss=None, v_ss=None,
                              fast: bool = False, layer=None,
                              static_bucket: int | None = None
                              ) -> jnp.ndarray:
    """Per-slot decode attention over a main cache prefix plus a chunk side
    buffer (the continuous-batching decode layout: rows < base_pos[b] live in
    the main cache, rows written during the current chunk live in the side
    buffer at offsets 0..offsets[b]).

    q [B, H, D]; k/v_main [B, S, KV, D]; k/v_side [B, C, KV, D];
    base_pos [B] i32 (main rows idx < base_pos[b] attend);
    offsets [B] i32 (side rows j <= offsets[b] attend).
    Scores from both segments share one masked softmax, so the math equals
    single-buffer attention over the same rows (up to fp32 reduction order of
    the concatenated score axis). Returns [B, H, D] fp32.

    `fast`: bf16 score/value MXU passes + bf16 dequant temps (fp32 softmax
    and accumulation) — the pallas-fast serving mode's quality class; see
    gqa_attention_per_slot. This is the B=64 serving flagship's attention:
    the fp32-HIGHEST dots + fp32 dequant temps here were the single largest
    device term of the batched step (trace-attributed, round 4: 18.8 of
    34.7 ms; bf16 passes cut the step to 27.4 ms).
    """
    B, H, D = q.shape
    mshape = k_main.shape[1:] if layer is not None else k_main.shape
    S, KV = mshape[1], mshape[2]
    C = k_side.shape[1]
    M = H // KV
    inv = 1.0 / jnp.sqrt(jnp.float32(D))
    mask_s = (jnp.arange(C, dtype=jnp.int32)[None, :]
              <= offsets[:, None])                       # [B, C]

    dot_t = jnp.bfloat16 if fast else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    qf = q.astype(dot_t).reshape(B, KV, M, D)

    ksf = _deq(k_side, k_ss, dot_t)
    vsf = _deq(v_side, v_ss, dot_t)
    scores_s = jnp.einsum(
        "bkmd,bckd->bkmc", qf, ksf, precision=prec,
        preferred_element_type=jnp.float32,
    ) * inv

    def attend(kc, vc, ks, vs):
        s = kc.shape[1]
        kf = _deq(kc, ks, dot_t)
        scores_m = jnp.einsum(
            "bkmd,bskd->bkms", qf, kf, precision=prec,
            preferred_element_type=jnp.float32,
        ) * inv
        mask_m = (jnp.arange(s, dtype=jnp.int32)[None, :]
                  < base_pos[:, None])                    # [B, s]
        scores = jnp.concatenate([scores_m, scores_s], axis=-1)
        mask = jnp.concatenate([mask_m, mask_s], axis=-1)[:, None, None, :]
        probs = _masked_softmax(scores, mask)
        out = jnp.einsum(
            "bkms,bskd->bkmd", probs[..., :s].astype(dot_t),
            _deq(vc, vs, dot_t),
            precision=prec, preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "bkmc,bckd->bkmd", probs[..., s:].astype(dot_t), vsf,
            precision=prec, preferred_element_type=jnp.float32,
        )
        return out.reshape(B, H, D)

    # main rows needed: idx < max(base_pos) -> highest index max(base)-1
    return _bucketed(attend, jnp.max(base_pos) - 1, S,
                     (k_main, v_main, k_ms, v_ms), layer=layer,
                     static_bucket=static_bucket)


def fused_batched_attention(q: jnp.ndarray, k_main: jnp.ndarray,
                            v_main: jnp.ndarray, k_side: jnp.ndarray,
                            v_side: jnp.ndarray, base_pos: jnp.ndarray,
                            offsets: jnp.ndarray,
                            k_ss=None, v_ss=None, *,
                            scales_flat=None, layer, bucket: int | None,
                            fast: bool = True,
                            interpret: bool = False) -> jnp.ndarray:
    """Two-segment serving decode attention with the MAIN segment computed
    by the in-place Pallas kernel (ops.pallas.batched_decode): K/V tiles of
    layer `layer` stream straight from the stacked [L, B, S, KV, D] cache
    in HBM — no per-layer slab copy, no bucket switch — and only the
    host-chosen `bucket` rows are read. The chunk side buffer (C rows,
    already layer-sliced) folds into the kernel's flash partials here under
    one online softmax, so values match gqa_attention_two_segment up to
    fp32 reduction order.

    q [B, H, D]; k/v_main: STACKED [L, B, S, KV, D]; k/v_side [B, C, KV, D]
    (layer slabs); base_pos/offsets [B] i32; k/v_ss optional [B, C, KV]
    side scales; `scales_flat` optional (k_sf, v_sf) [L, B, S*KV] f32
    FLATTENED main int8 scales (loop-invariant per chunk — see
    runtime/batched.py); `bucket` static >= max(base_pos), a multiple of
    the kernel S-tile. Returns [B, H, D] fp32.
    """
    from qwen3_tpu.ops.pallas.batched_decode import batched_decode_partial

    B, H, D = q.shape
    KV = k_side.shape[2]
    M = H // KV
    C = k_side.shape[1]
    inv = 1.0 / jnp.sqrt(jnp.float32(D))
    k_sf, v_sf = scales_flat if scales_flat is not None else (None, None)

    acc, m, l = batched_decode_partial(
        q, k_main, v_main, layer, base_pos, k_sf, v_sf,
        bucket=bucket, fast=fast, interpret=interpret)

    dot_t = jnp.bfloat16 if fast else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    qf = q.astype(dot_t).reshape(B, KV, M, D)
    ksf = _deq(k_side, k_ss, dot_t)
    vsf = _deq(v_side, v_ss, dot_t)
    neg = jnp.finfo(jnp.float32).min
    scores_s = jnp.einsum(
        "bkmd,bckd->bkmc", qf, ksf, precision=prec,
        preferred_element_type=jnp.float32) * inv
    mask_s = (jnp.arange(C, dtype=jnp.int32)[None, :]
              <= offsets[:, None])                        # [B, C]
    mask4 = mask_s[:, None, None, :]
    scores_s = jnp.where(mask4, scores_s, neg)

    m_all = jnp.maximum(m, jnp.max(scores_s, axis=-1))    # [B, KV, M]
    alpha = jnp.exp(m - m_all)
    p = jnp.exp(scores_s - m_all[..., None]) * mask4.astype(jnp.float32)
    num = acc * alpha[..., None] + jnp.einsum(
        "bkmc,bckd->bkmd", p.astype(dot_t), vsf, precision=prec,
        preferred_element_type=jnp.float32)
    den = l * alpha + jnp.sum(p, axis=-1)
    return (num / den[..., None]).reshape(B, H, D)


def gqa_attention(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                  q_positions: jnp.ndarray, k_s=None, v_s=None,
                  fast: bool = False) -> jnp.ndarray:
    """Dense masked GQA attention against the full cache.

    q:           [B, T, H, D] (any float dtype; math in fp32)
    k/v_cache:   [B, S, KV, D]
    q_positions: [T] int32 — absolute position of each query row; a cache slot
                 s attends iff s <= q_positions[t] (causal over the cache).
    k_s/v_s:     optional [B, S, KV] f32 scales for int8 caches.
    fast:        bf16 MXU passes for the score/value dots (fp32 softmax and
                 accumulation) — the pallas-fast serving mode's quality
                 class. fp32 HIGHEST dots cost 6 MXU passes each; at prefill
                 the attention einsums were ~27% of the device step
                 (trace-attributed, round 3) for ~10% of the FLOPs.

    Returns [B, T, H, D] fp32.
    """
    B, T, H, D = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    M = H // KV  # kv_mul

    dot_t = jnp.bfloat16 if fast else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    qf = q.astype(dot_t).reshape(B, T, KV, M, D)

    def attend(kc, vc, ks, vs):
        s = kc.shape[1]
        kf = _deq(kc, ks).astype(dot_t)
        vf = _deq(vc, vs).astype(dot_t)
        # scores[b, t, k, m, s] — fp32 accumulation either way; without
        # `fast`, force true fp32 MXU passes (TPU einsum defaults to bf16
        # passes at default precision, which breaks reference parity)
        scores = jnp.einsum(
            "btkmd,bskd->btkms", qf, kf, precision=prec,
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(jnp.float32(D))
        mask = (
            jnp.arange(s, dtype=jnp.int32)[None, :]
            <= q_positions[:, None]
        )  # [T, s]
        probs = _masked_softmax(scores, mask[None, :, None, None, :])
        out = jnp.einsum(
            "btkms,bskd->btkmd", probs.astype(dot_t), vf, precision=prec,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(B, T, H, D)

    return _bucketed(attend, jnp.max(q_positions), S,
                     (k_cache, v_cache, k_s, v_s))
