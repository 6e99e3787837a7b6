"""Fused on-device decode loop.

The reference runs one forward per host-loop iteration; on TPU (especially
through a high-latency runtime tunnel) every device->host synchronization
costs milliseconds, so the whole autoregressive loop — forward, xorshift RNG,
temperature/top-p sampling, stop-token handling — runs inside a single jitted
`lax.while_loop` that emits a chunk of up to K tokens per dispatch. The host
fetches one small int32 buffer per chunk and streams text from it.

Semantics are identical to the host loops (and hence the C engine): each step
emits the current token, runs the forward at the current position, draws
exactly one xorshift coin, and samples the next token; the loop ends when the
sampled token is BOS/EOS (stop token not emitted) or the position limit is
reached. Completion mode stops *before* emitting at the limit
(src/completion.c:57), chat mode emits the final token and only then hits the
overflow check (src/completion.c:279-284) — `emit_at_limit` selects this.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from qwen3_tpu.models.qwen3 import forward_impl
from qwen3_tpu.runtime.sampler import sample_tokens
from qwen3_tpu.runtime.xorshift import xorshift_coin_device


class DecodeCarry(NamedTuple):
    step: jnp.ndarray        # i32, tokens emitted within this chunk
    token: jnp.ndarray       # i32 [B], current (sampled, unemitted) token
    pos: jnp.ndarray         # i32, absolute position of the next forward
    done: jnp.ndarray        # bool
    rng_hi: jnp.ndarray      # u32
    rng_lo: jnp.ndarray      # u32
    k_cache: jnp.ndarray
    v_cache: jnp.ndarray
    out: jnp.ndarray         # i32 [K], emitted tokens (-1 padding)


def decode_chunk_impl(params, k_cache, v_cache, token, pos, limit,
                      rng_hi, rng_lo, *, cfg, mode: str, chunk: int,
                      temperature: float, top_p: float, greedy: bool,
                      bos: int, eos: int, emit_at_limit: bool = False,
                      top_k: int = 0, attn: str = "dense",
                      axis_name: str | None = None,
                      out_vocab: int | None = None):
    """Generate up to `chunk` tokens fully on device (B=1).

    token: i32 [1] — current sampled-but-unemitted token.
    pos:   i32 scalar — position for the next forward.
    limit: i32 scalar — exclusive position bound (seq_len or max-token cap).

    `axis_name`/`out_vocab`: tensor-parallel execution under shard_map
    (parallel/tp.py make_tp_decode_chunk) — `cfg` is then the shard-local
    config; sampling runs on the gathered (replicated) logits, so every
    shard draws the same token.

    Returns (out_tokens [chunk], n_emitted, done, k, v, token, pos,
    rng_hi, rng_lo).
    """

    def cond(c: DecodeCarry):
        return (c.step < chunk) & ~c.done

    def body(c: DecodeCarry):
        is_stop = (c.token[0] == bos) | (c.token[0] == eos)
        at_limit = c.pos >= limit
        if emit_at_limit:
            do_emit = ~is_stop
        else:
            do_emit = ~is_stop & ~at_limit
        do_fwd = ~is_stop & ~at_limit

        out = c.out.at[c.step].set(jnp.where(do_emit, c.token[0], -1))
        step = c.step + do_emit.astype(jnp.int32)
        done = is_stop | at_limit

        # Forward runs unconditionally; scalars are masked with `where` when
        # this is the chunk's final (stop/limit) iteration. A lax.cond here
        # forces XLA to merge the two branches' cache buffers (a full-cache
        # copy per decode step); the wasted forward instead costs at most one
        # extra step per chunk. The position MUST be clamped into the table
        # range: at pos == seq_len the rope gather is out of bounds and
        # jnp.take's fill mode poisons the written row with NaN, which later
        # leaks through masked attention (0 * NaN) after a chat reset. The
        # clamped write lands at a row the stream either never reads or
        # overwrites before reading.
        seq_len = c.k_cache.shape[2] if not isinstance(
            c.k_cache, tuple) else c.k_cache[0].shape[2]
        safe_pos = jnp.minimum(c.pos, seq_len - 1)
        logits, kc, vc = forward_impl(
            params, cfg, c.token[:, None], c.k_cache, c.v_cache,
            safe_pos, mode=mode, attn=attn, axis_name=axis_name,
            out_vocab=out_vocab)
        hi, lo, coin = xorshift_coin_device(c.rng_hi, c.rng_lo)
        nxt = sample_tokens(logits[:, 0], coin[None], temperature,
                            top_p, greedy=greedy, top_k_hint=top_k)

        nxt = jnp.where(do_fwd, nxt, c.token)
        new_pos = jnp.where(do_fwd, c.pos + 1, c.pos)
        hi = jnp.where(do_fwd, hi, c.rng_hi)
        lo = jnp.where(do_fwd, lo, c.rng_lo)
        return DecodeCarry(step=step, token=nxt, pos=new_pos, done=done,
                           rng_hi=hi, rng_lo=lo, k_cache=kc, v_cache=vc,
                           out=out)

    init = DecodeCarry(
        step=jnp.int32(0), token=token, pos=jnp.int32(pos),
        done=jnp.bool_(False), rng_hi=rng_hi, rng_lo=rng_lo,
        k_cache=k_cache, v_cache=v_cache,
        out=jnp.full((chunk,), -1, jnp.int32))
    c = jax.lax.while_loop(cond, body, init)
    # pack (tokens..., n_emitted, done) into one buffer so the host needs a
    # single device->host fetch per chunk
    packed = jnp.concatenate(
        [c.out, c.step[None], c.done.astype(jnp.int32)[None]])
    return (packed, c.k_cache, c.v_cache, c.token, c.pos, c.rng_hi, c.rng_lo)


decode_chunk = functools.partial(
    jax.jit,
    static_argnames=("cfg", "mode", "chunk", "temperature", "top_p",
                     "greedy", "bos", "eos", "emit_at_limit", "top_k",
                     "attn", "axis_name", "out_vocab"),
    donate_argnames=("k_cache", "v_cache"),
)(decode_chunk_impl)


def _prefill_ladder() -> tuple[int, ...]:
    """Graduated block sizes for long prompts, largest first. Prefill
    throughput on a v5e chip scales with block width (4B Q8: 4.3k tok/s at
    64 -> 9.2k at 512 — wider rows amortize the weight streaming), so the
    bulk of a long prompt runs in the widest block that fits and the tail
    falls back to the configured chunk. QWEN3_TPU_PREFILL_LADDER overrides
    (comma-separated, '0' disables grading entirely)."""
    import os

    raw = os.environ.get("QWEN3_TPU_PREFILL_LADDER", "512,256,128")
    if raw.strip() == "0":
        return ()
    return tuple(sorted((int(s) for s in raw.split(",") if s.strip()),
                        reverse=True))


def prefill_plan(n: int, start_pos: int, chunk: int,
                 seq_len: int) -> tuple[tuple[int, int], ...]:
    """The ONE prompt-chunking policy as a shape plan: ((offset, width), ...)
    for an n-token prompt starting at start_pos. Deterministic in
    (n, start_pos, chunk, seq_len), so every engine path that prefills the
    same prompt runs bit-identical forward programs (same block shapes ->
    same fp32 reduction order -> same KV rows).

    Widths come from the graded ladder when the remaining prompt fills them,
    else `chunk` (the floor — short prompts behave exactly as before). A
    block never extends past the cache: dynamic_update_slice CLAMPS an
    out-of-range start index, which would shift the whole write over
    earlier live rows."""
    n = min(n, seq_len - start_pos)
    ladder = _prefill_ladder()
    plan: list[tuple[int, int]] = []
    off = 0
    while off < n:
        rem = n - off
        cap = seq_len - (start_pos + off)
        size = chunk
        for s in ladder:
            if s > chunk and rem >= s and cap >= s:
                size = s
                break
        plan.append((off, min(size, cap)))
        off += size
    return tuple(plan)


def prefill_blocks(ids: list, start_pos: int, chunk: int, seq_len: int):
    """prefill_plan applied to concrete ids: yields (offset, padded_block,
    n_valid) per block, shared by Engine._prefill and
    BatchedEngine._admit_into (see tests/test_batched.py chat parity)."""
    ids = ids[: seq_len - start_pos]
    for off, size in prefill_plan(len(ids), start_pos, chunk, seq_len):
        block = ids[off:off + size]
        yield off, block + [0] * (size - len(block)), len(block)


@functools.partial(jax.jit, static_argnames=("greedy", "top_k"))
def burn_and_sample(logits, rng_hi, rng_lo, n_burn, temperature, top_p, *,
                    greedy: bool, top_k: int = 0):
    """Advance the RNG `n_burn` draws (the reference chat loop burns one draw
    per prompt token, src/completion.c:318-323), then draw once and sample the
    first token from the prefill logits. temperature/top_p are traced scalars
    (pre-clamped) so one compiled program serves every sampler config — and
    the single-stream and batched engines share it, keeping their first-token
    numerics identical. Returns (token [1] i32, hi, lo)."""

    def burn(_, s):
        hi, lo, _c = xorshift_coin_device(s[0], s[1])
        return (hi, lo)

    rng_hi, rng_lo = jax.lax.fori_loop(0, n_burn, burn, (rng_hi, rng_lo))
    hi, lo, coin = xorshift_coin_device(rng_hi, rng_lo)
    g = greedy if greedy else (temperature <= 1e-6)
    tok = sample_tokens(logits[None, :], coin[None], temperature, top_p,
                        greedy=g, top_k_hint=top_k)
    return tok, hi, lo
