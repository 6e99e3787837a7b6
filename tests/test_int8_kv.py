"""int8 KV cache: structure, quantization error bounds, end-to-end quality,
and interop with sharding + the serving engine."""

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_tpu.eval import perplexity
from qwen3_tpu.io.checkpoint import write_checkpoint
from qwen3_tpu.io.tokenizer_bin import write_tokenizer_bin
from qwen3_tpu.models import forward, init_kv_cache, init_params
from qwen3_tpu.runtime import kvcache
from qwen3_tpu.runtime.batched import BatchedEngine, Request
from qwen3_tpu.runtime.engine import Engine, EngineConfig


def test_quantize_heads_roundtrip(rng):
    x = rng.standard_normal((4, 7, 2, 32)).astype(np.float32) * 3
    q, s = kvcache.quantize_heads(jnp.asarray(x))
    xd = np.asarray(q).astype(np.float32) * np.asarray(s)[..., None]
    amax = np.abs(x).max(axis=-1, keepdims=True)
    assert np.abs(xd - x).max() <= (amax / 127.0 * 0.5 + 1e-7).max()


def test_int8_cache_structure(tiny_cfg):
    (kq, ks), (vq, vs) = init_kv_cache(tiny_cfg, 2, 16, jnp.int8)
    assert kq.dtype == jnp.int8 and ks.dtype == jnp.float32
    assert kq.shape == (tiny_cfg.n_layers, 2, 16, tiny_cfg.n_kv_heads,
                        tiny_cfg.head_dim)
    assert ks.shape == kq.shape[:-1]


def test_int8_forward_close_to_fp32(tiny_weights, tiny_cfg):
    params = init_params(tiny_weights, mode="exact")
    toks = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)

    k, v = init_kv_cache(tiny_cfg, 1, 32)
    want, _, _ = forward(params, tiny_cfg, toks, k, v, jnp.int32(0),
                         mode="exact", all_logits=True)
    k8, v8 = init_kv_cache(tiny_cfg, 1, 32, jnp.int8)
    got, nk, nv = forward(params, tiny_cfg, toks, k8, v8, jnp.int32(0),
                          mode="exact", all_logits=True)
    assert isinstance(nk, tuple) and nk[0].dtype == jnp.int8
    a, b = np.asarray(got), np.asarray(want)
    # same top-1 everywhere and close logits
    np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))
    assert np.abs(a - b).max() / np.abs(b).max() < 0.05


def test_int8_ppl_within_band(tiny_weights, tiny_cfg, rng):
    tokens = [int(x) for x in rng.integers(0, 512, size=24)]
    params = init_params(tiny_weights, mode="exact")
    fp = perplexity(params, tiny_cfg, tokens, mode="exact")
    q8 = perplexity(params, tiny_cfg, tokens, mode="exact",
                    kv_dtype=jnp.int8)
    assert abs(q8 - fp) / fp <= 0.01, (q8, fp)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory, tiny_weights, tiny_tok):
    d = tmp_path_factory.mktemp("kv8")
    path = str(d / "tiny.bin")
    write_checkpoint(path, tiny_weights)
    write_tokenizer_bin(path + ".tokenizer", tiny_tok)
    return path


def test_engine_with_int8_kv(ckpt):
    eng = Engine(EngineConfig(path=ckpt, seed=5, temperature=0.0, seq_len=96,
                              mode="exact", kv_dtype="int8",
                              prefill_chunk=16, decode_chunk=8))
    r1 = eng.generate("the cat in", max_tokens=10)
    eng2 = Engine(EngineConfig(path=ckpt, seed=5, temperature=0.0, seq_len=96,
                               mode="exact", kv_dtype="float32",
                               prefill_chunk=16, decode_chunk=8))
    r2 = eng2.generate("the cat in", max_tokens=10)
    # greedy streams should agree on a tame synthetic model
    assert r1.ids == r2.ids


def test_batched_with_int8_kv(ckpt):
    eng = BatchedEngine(ckpt, max_batch=2, seq_len=96, mode="exact",
                        temperature=0.0, kv_dtype="int8",
                        prefill_bucket=16, decode_chunk=8)
    reqs = [eng.submit(Request(prompt=p, seed=i, max_tokens=8))
            for i, p in enumerate(["the cat", "in the hat"])]
    eng.run()
    assert all(r.finished and r.out_ids for r in reqs)


def test_sharded_int8_kv(tiny_weights, tiny_cfg):
    from qwen3_tpu.parallel import make_mesh, shard_kv_cache, shard_params

    params = init_params(tiny_weights, mode="exact")
    toks = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    k8, v8 = init_kv_cache(tiny_cfg, 1, 32, jnp.int8)
    want, _, _ = forward(params, tiny_cfg, toks, k8, v8, jnp.int32(0),
                         mode="exact", all_logits=True)

    mesh = make_mesh(dp=1, tp=2)
    sp = shard_params(params, mesh, mode="exact")
    sk, sv = shard_kv_cache(init_kv_cache(tiny_cfg, 1, 32, jnp.int8), mesh)
    got, _, _ = forward(sp, tiny_cfg, toks, sk, sv, jnp.int32(0),
                        mode="exact", all_logits=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
