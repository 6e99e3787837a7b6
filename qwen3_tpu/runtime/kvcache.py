"""KV cache with optional int8 quantization.

The reference keeps a dense fp32 cache `n_layers x seq_len x kv_dim` x2
(src/model.c:360-361). Here each cache side (K or V) is either

- a plain array [L, B, S, KV, HD] in float32/bfloat16, or
- a tuple (values int8 [L, B, S, KV, HD], scales f32 [L, B, S, KV]) with a
  symmetric per-(position, head) absmax scale over head_dim — the Q8_0 recipe
  applied to cache rows, dequantized on the fly at the attention read.

int8 quarters cache bytes vs. the reference's fp32, which directly speeds up
bandwidth-bound long-context decode and quadruples KV capacity per chip. The
tuple representation is an ordinary pytree, so jit/scan/while_loop/donation
and sharding all compose without special cases.
"""

from __future__ import annotations

import jax.numpy as jnp

from qwen3_tpu.config import ModelConfig

Q8_MAX = 127.0


def pad_rows(rows: int, quantum: int = 256) -> int:
    """Round a cache row count up to the flash-kernel tile quantum.

    The flash kernels tile the cache row axis in S-tiles of up to `block_s`
    (256); the tile must divide S exactly, and with int8 KV the transposed
    scale blocks [KV, ts] additionally need ts % 128 == 0 (Mosaic lane-axis
    rule). A row count like seq_len + chunk = 8224 = 2^5 * 257 admits no such
    tile — the kernel would degrade to 32-row tiles for bf16 KV and fail to
    lower at all for int8 KV. Engines allocate padded buffers: the extra
    (< 256) rows are written past every stream's limit and masked out of
    every attention read, so semantics are unchanged.

    Engines whose attention is pinned DENSE pass quantum=128 (lane
    alignment for the final attention bucket — a 224-row cache measured
    ~10% slower than 256 at B=256): the flash quantum would pad the B=64
    serving cache 544 -> 768 rows, inflating the per-layer slab extraction
    — the #3 term of the serving step (PROFILE.md) — by 41% for rows
    nothing reads."""
    return -(-rows // quantum) * quantum


def init_kv_cache(cfg: ModelConfig, batch: int, seq_len: int,
                  dtype=jnp.float32):
    """Returns (k_cache, v_cache); each is an array or an int8 (q, s) tuple."""
    dtype = jnp.dtype(dtype)
    shape = (cfg.n_layers, batch, seq_len, cfg.n_kv_heads, cfg.head_dim)

    def one():
        if dtype == jnp.int8:
            return (jnp.zeros(shape, jnp.int8),
                    jnp.ones(shape[:-1], jnp.float32))
        return jnp.zeros(shape, dtype)

    return one(), one()


def make_side(cache, chunk: int):
    """A chunk side buffer [L, B, chunk, KV, D] in `cache`'s storage repr
    (zeros; unit scales for int8) — the per-chunk staging area decode writes
    at a uniform step index (models.decode_forward_impl `side` mode)."""
    vals, sc = split(cache)
    L, B, _, KV, D = vals.shape
    side = jnp.zeros((L, B, chunk, KV, D), vals.dtype)
    if sc is None:
        return side
    return side, jnp.ones((L, B, chunk, KV), jnp.float32)


def split(cache):
    """-> (values, scales_or_None)."""
    if isinstance(cache, tuple):
        return cache
    return cache, None


def join(values, scales):
    return values if scales is None else (values, scales)


def storage_dtype(cache):
    return split(cache)[0].dtype


def quantize_heads(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization over the last axis (head_dim)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    s = jnp.where(amax == 0.0, jnp.float32(1e-6), amax / Q8_MAX)
    q = jnp.clip(jnp.round(xf / s[..., None]), -Q8_MAX, Q8_MAX).astype(jnp.int8)
    return q, s


def encode_block(cache_values: jnp.ndarray, x: jnp.ndarray):
    """Convert a new K/V block to the cache's storage representation.

    Returns (values, scales_or_None)."""
    if cache_values.dtype == jnp.int8:
        return quantize_heads(x)
    return x.astype(cache_values.dtype), None


def dequant(values: jnp.ndarray, scales) -> jnp.ndarray:
    """fp32 view of (a slice of) the cache."""
    if scales is None:
        return values.astype(jnp.float32)
    return values.astype(jnp.float32) * scales[..., None]
