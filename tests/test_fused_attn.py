"""Parity tests for the in-place batched decode-attention Pallas kernel
(ops/pallas/batched_decode.py + ops.attention.fused_batched_attention).

The kernel computes the MAIN-segment flash partials by streaming
bucket-limited K/V tiles straight from the stacked [L, B, S, KV, D] cache;
the oracle is the dense two-segment path (ops.attention), which itself is
parity-tested against the reference semantics (src/forward.c:141-195).
Runs in Pallas interpret mode on the CPU mesh like the flash tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_tpu.ops.attention import (
    fused_batched_attention,
    gqa_attention_per_slot,
    gqa_attention_two_segment,
)
from qwen3_tpu.ops.pallas.batched_decode import batched_decode_partial
from qwen3_tpu.runtime import kvcache


def _mk(B=4, L=3, S=512, KV=2, M=2, D=128, C=8, seed=0, int8=False):
    rng = np.random.default_rng(seed)
    H = KV * M
    q = rng.standard_normal((B, H, D), dtype=np.float32)
    k = rng.standard_normal((L, B, S, KV, D), dtype=np.float32)
    v = rng.standard_normal((L, B, S, KV, D), dtype=np.float32)
    ks = vs = None
    if int8:
        kq, ks = kvcache.quantize_heads(jnp.asarray(k))
        vq, vs = kvcache.quantize_heads(jnp.asarray(v))
        k, v = kq, vq
    sk = rng.standard_normal((B, C, KV, D), dtype=np.float32)
    sv = rng.standard_normal((B, C, KV, D), dtype=np.float32)
    sks = svs = None
    if int8:
        skq, sks = kvcache.quantize_heads(jnp.asarray(sk))
        svq, svs = kvcache.quantize_heads(jnp.asarray(sv))
        sk, sv = skq, svq
    base = jnp.asarray(rng.integers(1, S, size=B), jnp.int32)
    off = jnp.asarray(rng.integers(0, C, size=B), jnp.int32)
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), ks, vs,
            jnp.asarray(sk), jnp.asarray(sv), sks, svs, base, off)


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("bucket", [256, 512, None])
def test_partial_matches_dense_per_slot(int8, bucket):
    """acc/l of the kernel partials == masked dense attention over rows
    idx < row_limit (fp32 path, tight tolerance)."""
    q, k, v, ks, vs, *_ = _mk(int8=int8)
    B, S = q.shape[0], k.shape[2]
    limit = jnp.asarray([1, 37, 200, S], jnp.int32)
    if bucket is not None and int(jnp.max(limit)) > bucket:
        limit = jnp.minimum(limit, bucket)
    layer = jnp.int32(1)
    sct = (None, None)
    if int8:
        sct = (ks.reshape(*ks.shape[:2], -1), vs.reshape(*vs.shape[:2], -1))
    acc, m, l = batched_decode_partial(
        q, k, v, layer, limit, sct[0], sct[1], bucket=bucket, fast=False,
        interpret=True)
    got = (acc / l[..., None]).reshape(q.shape)

    # oracle: dense per-slot attention with positions = limit - 1 (attends
    # rows <= pos, i.e. idx < limit) on the layer-1 slab
    want = gqa_attention_per_slot(
        q, k, v, limit - 1,
        None if ks is None else ks, None if vs is None else vs,
        fast=False, layer=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("fast", [False, True])
def test_fused_two_segment_matches_dense(int8, fast):
    (q, k, v, ks, vs, sk, sv, sks, svs, base, off) = _mk(int8=int8, seed=3)
    sct = None
    if int8:
        sct = (ks.reshape(*ks.shape[:2], -1), vs.reshape(*vs.shape[:2], -1))
    got = fused_batched_attention(
        q, k, v, sk[...], sv[...], base, off, k_ss=sks, v_ss=svs,
        scales_flat=sct, layer=2, bucket=None, fast=fast, interpret=True)
    want = gqa_attention_two_segment(
        q, k, v, sk, sv, base, off,
        k_ms=ks, v_ms=vs, k_ss=sks, v_ss=svs, fast=fast, layer=2)
    tol = 3e-2 if fast else 3e-4
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol)


def test_fused_zero_main_rows():
    """A slot with base_pos clamped to the minimum (1 row) plus side rows
    stays finite and correct (NEG_INF bookkeeping)."""
    (q, k, v, ks, vs, sk, sv, sks, svs, _, off) = _mk(int8=False, seed=5)
    base = jnp.asarray([1, 1, 1, 1], jnp.int32)
    got = fused_batched_attention(
        q, k, v, sk, sv, base, off, layer=0, bucket=256, fast=False,
        interpret=True)
    want = gqa_attention_two_segment(
        q, k, v, sk, sv, base, off, fast=False, layer=0)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory, tiny_weights, tiny_tok):
    from qwen3_tpu.io.checkpoint import write_checkpoint
    from qwen3_tpu.io.tokenizer_bin import write_tokenizer_bin

    d = tmp_path_factory.mktemp("fckpt")
    path = str(d / "tiny.bin")
    write_checkpoint(path, tiny_weights)
    write_tokenizer_bin(path + ".tokenizer", tiny_tok)
    return path


@pytest.mark.parametrize("kv_dtype", ["int8", "float32"])
def test_engine_fused_matches_dense_tokens(ckpt, kv_dtype):
    """BatchedEngine attn='fused' serves the same token streams as
    attn='dense' (pallas mode, greedy)."""
    from qwen3_tpu.runtime.batched import BatchedEngine, Request

    prompts = ["the cat sat", "a b c d e f", "hello", "one two three four"]

    def serve(attn):
        eng = BatchedEngine(ckpt, max_batch=4, seq_len=96,
                            mode="pallas", temperature=0.0,
                            kv_dtype=kv_dtype, attn=attn, decode_chunk=8,
                            prefill_bucket=16)
        reqs = [eng.submit(Request(prompt=p, seed=i, max_tokens=12))
                for i, p in enumerate(prompts)]
        eng.run()
        return [r.out_ids for r in reqs]

    assert serve("fused") == serve("dense")
