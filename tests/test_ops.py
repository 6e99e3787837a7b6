"""Per-op numerics tests against the NumPy oracle."""

import numpy as np
import jax.numpy as jnp

import oracle
from qwen3_tpu.ops import (
    apply_rope,
    dequantize,
    q8_matmul_bf16,
    q8_matmul_exact,
    quantize_act,
    rmsnorm,
    rope_tables,
    swiglu,
)
from qwen3_tpu.ops.attention import gqa_attention
from qwen3_tpu.ops.quant_matmul import dequant_weights_bf16


def test_quantize_act_matches_oracle(rng):
    x = rng.standard_normal((4, 128)).astype(np.float32)
    q, s = quantize_act(jnp.asarray(x), 32)
    for i in range(4):
        oq, os = oracle.quantize(x[i], 32)
        np.testing.assert_array_equal(np.asarray(q)[i], oq)
        np.testing.assert_allclose(np.asarray(s)[i], os, rtol=1e-7)


def test_quantize_zero_group():
    x = jnp.zeros((64,), jnp.float32)
    q, s = quantize_act(x, 32)
    assert np.all(np.asarray(q) == 0)
    np.testing.assert_array_equal(np.asarray(s), np.float32(1e-6))


def test_dequantize_roundtrip(rng):
    x = rng.standard_normal((256,)).astype(np.float32)
    q, s = quantize_act(jnp.asarray(x), 64)
    xd = dequantize(q, s, 64)
    assert np.abs(np.asarray(xd) - x).max() < np.abs(x).max() / 127.0


def test_rmsnorm_matches_oracle(rng):
    x = rng.standard_normal(128).astype(np.float32)
    w = (1 + 0.1 * rng.standard_normal(128)).astype(np.float32)
    ours = np.asarray(rmsnorm(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(ours, oracle.rmsnorm(x, w), rtol=1e-5, atol=1e-6)


def test_rope_matches_oracle(rng):
    hd = 64
    x = rng.standard_normal(hd).astype(np.float32)
    for pos in (0, 1, 17, 1000):
        cos, sin = rope_tables(hd, pos + 1)
        ours = np.asarray(apply_rope(jnp.asarray(x), cos[pos], sin[pos]))
        # fp32 transcendental rounding differs between libm and XLA and is
        # amplified by pos; the C engine itself carries the same error.
        np.testing.assert_allclose(ours, oracle.rotary(x, pos),
                                   rtol=1e-3, atol=1e-3)


def test_q8_matmul_exact_matches_oracle(rng):
    gs, n, d = 32, 128, 96
    x = rng.standard_normal(n).astype(np.float32)
    wq = rng.integers(-127, 128, size=(d, n)).astype(np.int8)
    ws = (0.01 * (0.5 + rng.random((d, n // gs)))).astype(np.float32)

    xq, xs = oracle.quantize(x, gs)
    want = oracle.matmul(xq, xs, wq, ws, gs)
    got = q8_matmul_exact(jnp.asarray(xq), jnp.asarray(xs),
                          jnp.asarray(wq), jnp.asarray(ws), gs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    # batched: [B, T, n]
    xb = rng.standard_normal((2, 3, n)).astype(np.float32)
    qb, sb = quantize_act(jnp.asarray(xb), gs)
    got_b = np.asarray(q8_matmul_exact(qb, sb, jnp.asarray(wq),
                                       jnp.asarray(ws), gs))
    for b in range(2):
        for t in range(3):
            xq2, xs2 = oracle.quantize(xb[b, t], gs)
            want2 = oracle.matmul(xq2, xs2, wq, ws, gs)
            np.testing.assert_allclose(got_b[b, t], want2, rtol=1e-5, atol=1e-6)


def test_q8_matmul_bf16_close_to_exact(rng):
    gs, n, d = 64, 256, 128
    x = rng.standard_normal(n).astype(np.float32) * 0.1
    wq = rng.integers(-127, 128, size=(d, n)).astype(np.int8)
    ws = (0.01 / 127.0 * (0.5 + rng.random((d, n // gs)))).astype(np.float32)

    w_t = dequant_weights_bf16(jnp.asarray(wq), jnp.asarray(ws), gs)
    got = np.asarray(q8_matmul_bf16(jnp.asarray(x), w_t))

    w_deq = (wq.astype(np.float32).reshape(d, -1, gs)
             * ws[..., None]).reshape(d, n)
    want = w_deq @ x
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


def test_swiglu(rng):
    g = rng.standard_normal(64).astype(np.float32)
    u = rng.standard_normal(64).astype(np.float32)
    want = g / (1 + np.exp(-g)) * u
    np.testing.assert_allclose(
        np.asarray(swiglu(jnp.asarray(g), jnp.asarray(u))), want,
        rtol=1e-5, atol=1e-6)


def test_gqa_attention_decode_matches_oracle(rng):
    B, S, H, KV, D = 1, 16, 4, 2, 8
    pos = 9
    q = rng.standard_normal((B, 1, H, D)).astype(np.float32)
    kc = rng.standard_normal((B, S, KV, D)).astype(np.float32)
    vc = rng.standard_normal((B, S, KV, D)).astype(np.float32)

    got = np.asarray(gqa_attention(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray([pos], jnp.int32)))[0, 0]

    kv_mul = H // KV
    for h in range(H):
        keys = kc[0, :pos + 1, h // kv_mul]
        vals = vc[0, :pos + 1, h // kv_mul]
        scores = keys @ q[0, 0, h] / np.sqrt(np.float32(D))
        probs = oracle.softmax(scores)
        np.testing.assert_allclose(got[h], probs @ vals, rtol=1e-5, atol=1e-6)


def test_gqa_attention_causal_prefill(rng):
    """Prefill rows must each see only their causal prefix."""
    B, S, H, KV, D, T = 1, 8, 2, 1, 4, 5
    q = rng.standard_normal((B, T, H, D)).astype(np.float32)
    kc = rng.standard_normal((B, S, KV, D)).astype(np.float32)
    vc = rng.standard_normal((B, S, KV, D)).astype(np.float32)
    positions = np.arange(T, dtype=np.int32)

    got = np.asarray(gqa_attention(jnp.asarray(q), jnp.asarray(kc),
                                   jnp.asarray(vc), jnp.asarray(positions)))
    for t in range(T):
        row = np.asarray(gqa_attention(
            jnp.asarray(q[:, t:t + 1]), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray([t], np.int32)))
        np.testing.assert_allclose(got[:, t], row[:, 0], rtol=1e-6)


def test_bucketed_attention_bit_identical():
    """The power-of-two cache-prefix dispatch computes the same masked sums —
    masked-out rows contribute exactly 0.0 — but XLA's fp32 reduction tree
    depends on the static S, so results agree to ~1 ulp, not bitwise."""
    from qwen3_tpu.ops import attention as att
    rng = np.random.default_rng(7)
    B, S, H, KV, D = 2, 2048, 4, 2, 8  # S large enough for several buckets
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((B, S, KV, D)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((B, S, KV, D)).astype(np.float32))

    def full(kcc, vcc, ks, vs, positions):
        # bypass bucketing by monkey-patched sizes
        return att.gqa_attention_per_slot(q, kcc, vcc, positions, ks, vs)

    for pos in (0, 1, 255, 256, 257, 1023, 1024, 2047):
        positions = jnp.asarray([pos, max(pos - 3, 0)], jnp.int32)
        got = np.asarray(att.gqa_attention_per_slot(q, kc, vc, positions))
        # reference: slice nothing — force the single-bucket path
        orig = att._bucket_sizes
        att._bucket_sizes = lambda s, smallest=256: [s]
        try:
            want = np.asarray(att.gqa_attention_per_slot(q, kc, vc, positions))
        finally:
            att._bucket_sizes = orig
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_bucketed_attention_int8_scales():
    from qwen3_tpu.ops import attention as att
    rng = np.random.default_rng(8)
    B, S, H, KV, D = 1, 1024, 4, 2, 8
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float32))
    kq = jnp.asarray(rng.integers(-127, 128, (B, S, KV, D)).astype(np.int8))
    vq = jnp.asarray(rng.integers(-127, 128, (B, S, KV, D)).astype(np.int8))
    ks = jnp.asarray(rng.random((B, S, KV)).astype(np.float32) + 0.01)
    vs = jnp.asarray(rng.random((B, S, KV)).astype(np.float32) + 0.01)
    for pos in (7, 300, 1023):
        positions = jnp.asarray([pos], jnp.int32)
        got = np.asarray(att.gqa_attention_per_slot(q, kq, vq, positions, ks, vs))
        orig = att._bucket_sizes
        att._bucket_sizes = lambda s, smallest=256: [s]
        try:
            want = np.asarray(att.gqa_attention_per_slot(q, kq, vq, positions, ks, vs))
        finally:
            att._bucket_sizes = orig
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
