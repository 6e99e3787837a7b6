"""Flash-decode Pallas kernels vs the dense reference attention
(ops/attention.py), in CPU interpret mode (bitwise-stable; the kernels
mirror the masked-softmax math up to online-softmax fp32 reduction order).

Sweeps KV dtypes (fp32 / bf16 / int8-with-scales) and positions at tile
boundaries (0, ts-1, ts, S-1) — the scalar-prefetch block-clamp edge cases.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_tpu.ops.attention import (
    gqa_attention,
    gqa_attention_per_slot,
    gqa_attention_two_segment,
)
from qwen3_tpu.ops.pallas.flash_decode import (
    flash_decode_gqa,
    flash_decode_gqa_two_segment,
    flash_prefill_gqa,
)

B, H, KV, D, S, TS, C = 3, 4, 2, 64, 512, 256, 8


def _mk_cache(rng, dtype):
    """-> (cache_vals, scales_or_None) with fp32 reference values."""
    f = rng.standard_normal((B, S, KV, D)).astype(np.float32)
    if dtype == "int8":
        scales = (np.abs(f).max(axis=-1) / 127.0 + 1e-6).astype(np.float32)
        q = np.clip(np.round(f / scales[..., None]), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(scales)
    return jnp.asarray(f, dtype=jnp.dtype(dtype)), None


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_flash_decode_matches_dense(dtype):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float32))
    k, ks = _mk_cache(rng, dtype)
    v, vs = _mk_cache(np.random.default_rng(1), dtype)
    # tile-boundary edge positions: 0, ts-1, ts, S-1 (B=3 -> sweep in pairs)
    for pos_set in ([0, TS - 1, TS], [TS, S - 1, 5]):
        pos = jnp.asarray(pos_set, jnp.int32)
        want = gqa_attention_per_slot(q, k, v, pos, ks, vs)
        got = flash_decode_gqa(q, k, v, pos, ks, vs, block_s=TS,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_flash_two_segment_matches_dense(dtype):
    """Side-buffer layout: slot b attends main rows < base_pos[b] plus side
    rows j <= offsets[b] — the continuous-batching decode attention."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float32))
    km, kms = _mk_cache(rng, dtype)
    vm, vms = _mk_cache(np.random.default_rng(3), dtype)

    fs = np.random.default_rng(4).standard_normal(
        (B, C, KV, D)).astype(np.float32)
    if dtype == "int8":
        ss = (np.abs(fs).max(axis=-1) / 127.0 + 1e-6).astype(np.float32)
        k_side = jnp.asarray(np.clip(np.round(fs / ss[..., None]),
                                     -127, 127).astype(np.int8))
        v_side, kss, vss = k_side * -1, jnp.asarray(ss), jnp.asarray(ss)
    else:
        k_side = jnp.asarray(fs, dtype=jnp.dtype(dtype))
        v_side = -k_side
        kss = vss = None

    # base at tile boundaries (incl. base=1: first decode after a 1-token
    # prompt); offsets sweep the side window
    for base_set, off_set in (([1, TS, S], [0, 3, C - 1]),
                              ([TS - 1, TS + 1, S - 1], [C - 1, 0, 2])):
        base = jnp.asarray(base_set, jnp.int32)
        off = jnp.asarray(off_set, jnp.int32)
        want = gqa_attention_two_segment(q, km, vm, k_side, v_side, base,
                                         off, kms, vms, kss, vss)
        got = flash_decode_gqa_two_segment(q, km, vm, k_side, v_side, base,
                                           off, kms, vms, kss, vss,
                                           block_s=TS, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
@pytest.mark.parametrize("start", [0, TS - 16, S - 32])
def test_flash_prefill_matches_dense(dtype, start):
    """Block-causal prefill attention over a chunk of T=32 query rows at
    `start` (incl. chunks straddling a tile boundary and the cache end)."""
    T = 32
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    k, ks = _mk_cache(rng, dtype)
    v, vs = _mk_cache(np.random.default_rng(8), dtype)
    pos = jnp.asarray(start + np.arange(T), jnp.int32)
    want = gqa_attention(q, k, v, pos, ks, vs)
    got = flash_prefill_gqa(q, k, v, pos, ks, vs, block_s=TS, block_t=16,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pick_ts_int8_guard():
    """Cache row counts without a 128-multiple S-tile must fail early with
    guidance under int8 KV (Mosaic rejects the transposed scale blocks) and
    still work tile-degraded for float caches. Regression: a seq 8192 + 32
    side-buffer serving cache (8224 = 2^5 * 257 rows) hit the raw Mosaic
    lowering error on hardware."""
    from qwen3_tpu.ops.pallas.flash_decode import _pick_ts

    assert _pick_ts(8448, 256, True) == 256          # padded serving cache
    assert _pick_ts(8224, 256, False) == 32          # degraded but legal
    assert _pick_ts(64, 256, True) == 64             # whole-dim block: legal
    with pytest.raises(ValueError, match="pad_rows"):
        _pick_ts(8224, 256, True)


def test_engine_cache_rows_flash_tileable(tmp_path):
    """Both engines allocate KV buffers in pad_rows quanta so any seq_len /
    side-buffer combination stays flash-tileable with int8 KV."""
    import dataclasses

    from qwen3_tpu.config import PRESETS
    from qwen3_tpu.io.checkpoint import write_checkpoint
    from qwen3_tpu.io.synthetic import synthetic_tokenizer, synthetic_weights
    from qwen3_tpu.io.tokenizer_bin import write_tokenizer_bin
    from qwen3_tpu.runtime.batched import BatchedEngine
    from qwen3_tpu.runtime.kvcache import pad_rows

    assert pad_rows(8224) == 8448 and pad_rows(8192) == 8192
    assert pad_rows(100) == 256

    cfg = dataclasses.replace(PRESETS["tiny"], seq_len=300)
    ckpt = str(tmp_path / "tiny300.bin")
    write_checkpoint(ckpt, synthetic_weights(cfg, seed=2))
    write_tokenizer_bin(ckpt + ".tokenizer",
                        synthetic_tokenizer(cfg.vocab_size))
    # attn="auto" resolves dense here (short context): rows pad to the
    # lane quantum 128 only (the flash quantum's extra rows are slab-copy
    # waste — see runtime/batched.py)
    eng = BatchedEngine(ckpt, max_batch=2, seq_len=300, mode="pallas",
                        kv_dtype="int8", decode_chunk=4, side_buffer=True)
    rows = jax.tree.leaves(eng._kv)[0].shape[2]
    assert rows % 128 == 0 and rows >= 304
    # a flash-pinned engine keeps the 256-row tile quantum (int8-KV
    # lowering requirement)
    engf = BatchedEngine(ckpt, max_batch=2, seq_len=300, mode="pallas",
                         kv_dtype="int8", decode_chunk=4, side_buffer=True,
                         attn="flash")
    rows_f = jax.tree.leaves(engf._kv)[0].shape[2]
    assert rows_f % 256 == 0 and rows_f >= 304
