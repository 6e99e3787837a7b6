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
