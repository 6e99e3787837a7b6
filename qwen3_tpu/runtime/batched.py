"""Continuous-batching serving engine.

The reference serves exactly one stream, one token per forward
(src/completion.c:57-80); this engine serves up to `max_batch` concurrent
streams through one shared [L, B, S, KV, HD] KV cache:

- each slot carries its own position, stop state and xorshift64* RNG state
  (per-request seeds stay reproducible regardless of batch composition —
  done slots keep their RNG frozen);
- decode runs as a fused on-device chunk over all slots (per-slot positions,
  per-slot causal masks — models.decode_forward_impl), K tokens per dispatch,
  one packed host fetch per chunk;
- new requests are admitted between chunks by prefilling into a free slot's
  cache rows (continuous batching at chunk granularity).

Token streams are bit-identical to the single-stream engine for the same
(seed, sampler) request: the only interaction between slots is batching of
identical per-row math.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tpu.config import ModelConfig
from qwen3_tpu.models import forward, init_kv_cache, load_params
from qwen3_tpu.models.qwen3 import decode_forward_impl
from qwen3_tpu.runtime import kvcache
from qwen3_tpu.runtime.decode_loop import (
    burn_and_sample,
    prefill_blocks,
    prefill_plan,
)
from qwen3_tpu.runtime.sampler import (
    Sampler,
    clamp_temperature,
    clamp_top_p,
    sample_tokens,
)
from qwen3_tpu.runtime.xorshift import (
    seed_to_device,
    xorshift_coin_device,
)
from qwen3_tpu.tokenizer import Tokenizer

_GREEDY_EPS = 1e-6


class BatchCarry(NamedTuple):
    step: jnp.ndarray      # i32
    token: jnp.ndarray     # i32 [B]
    pos: jnp.ndarray       # i32 [B]
    done: jnp.ndarray      # bool [B]
    rng_hi: jnp.ndarray    # u32 [B]
    rng_lo: jnp.ndarray    # u32 [B]
    k_cache: jnp.ndarray
    v_cache: jnp.ndarray
    out: jnp.ndarray       # i32 [B, K]


def batched_decode_chunk_impl(params, k_cache, v_cache, token, pos, limit,
                              done, rng_hi, rng_lo, temp, topp, emit_lim,
                              *, cfg, mode: str, chunk: int,
                              attn: str = "dense",
                              greedy: bool, bos: int, eos: int,
                              top_k: int = 0, use_side: bool = False,
                              axis_name: str | None = None,
                              out_vocab: int | None = None,
                              bucket: int | None = None):
    """Up to `chunk` decode steps over all live slots.

    token/pos/limit/done/rng_*: per-slot [B] arrays. A slot stops emitting at
    BOS/EOS or when its position reaches its limit; its RNG and position then
    freeze so per-stream reproducibility is independent of batch-mates.

    temp/topp: per-slot [B] fp32 sampler params (pre-clamped — per-request
    sampling without recompiling per config). `greedy=True` statically
    asserts every slot is greedy (argmax only, sampler sort elided — the
    all-greedy serving fast path); with `greedy=False` rows at the epsilon
    temperature argmax individually.

    emit_lim: per-slot [B] bool — chat-turn semantics: the token sampled at
    the final position is still emitted before the limit stop freezes the
    slot (the reference's chat loop prints it and only then hits the
    overflow check, src/completion.c:327-347; decode_loop's static
    `emit_at_limit` flag, per slot).

    use_side: stage the chunk's K/V rows in side buffers written at a uniform
    step index instead of scattering B rows into the main cache every step
    (which serializes into B x 2 x L tiny slice-updates — the 64-stream
    bottleneck), then merge each slot's rows back once per chunk. Requires a
    cache allocated with `chunk` extra rows (BatchedEngine does this) so a
    slot near seq_len can merge without clamping. Two-segment attention
    matches single-buffer attention up to fp32 reduction order.

    Returns (out [B, K+2] packed with (tokens.., n_live_steps, all_done),
    k, v, token, pos, done, rng_hi, rng_lo).
    """
    B = token.shape[0]
    base_pos = pos  # frozen for the chunk (side mode)

    # attn="fused" + int8 KV: the Pallas kernel consumes main-cache scales
    # flattened [L, B, S*KV] (scale of expanded column s*KV+kv at flat
    # index s*KV+kv). The main cache is read-only for the whole chunk in
    # side mode, so flatten ONCE here — outside the while_loop — instead
    # of per decode step (~34 MB per pass at the 4B flagship shape).
    scales_t = None
    if attn == "fused" and use_side:
        _, k_sc_main = kvcache.split(k_cache)
        _, v_sc_main = kvcache.split(v_cache)
        if k_sc_main is not None:
            Lk, Bk, Sk, KVk = k_sc_main.shape
            scales_t = (k_sc_main.reshape(Lk, Bk, Sk * KVk),
                        v_sc_main.reshape(Lk, Bk, Sk * KVk))

    def cond(c: BatchCarry):
        return (c.step < chunk) & ~jnp.all(c.done)

    def body(c: BatchCarry):
        is_stop = (c.token == bos) | (c.token == eos)
        at_limit = c.pos >= limit
        newly_done = c.done | is_stop | at_limit
        emit = ~c.done & ~is_stop & (emit_lim | ~at_limit)

        out = c.out.at[:, c.step].set(jnp.where(emit, c.token, -1))

        if use_side:
            # c.k_cache/c.v_cache carry the SIDE buffers; the main cache is
            # closed over read-only (a modified scan/while carry would be
            # double-buffered by XLA)
            logits, kc, vc = decode_forward_impl(
                params, cfg, c.token, k_cache, v_cache, c.pos, mode=mode,
                attn=attn, side=(c.k_cache, c.v_cache, base_pos, c.step),
                axis_name=axis_name, out_vocab=out_vocab,
                attn_bucket=bucket, scales_t=scales_t)
        else:
            # done slots still flow through the batched forward (their rows
            # are wasted work but keep shapes static); clamp their write
            # position into range — the overwritten slot belongs to a
            # finished stream and is re-prefilled before any reuse
            S = jax.tree.leaves(c.k_cache)[0].shape[2]
            write_pos = jnp.minimum(c.pos, S - 1)
            logits, kc, vc = decode_forward_impl(
                params, cfg, c.token, c.k_cache, c.v_cache, write_pos,
                mode=mode, attn=attn, axis_name=axis_name,
                out_vocab=out_vocab, attn_bucket=bucket)
        hi, lo, coin = xorshift_coin_device(c.rng_hi, c.rng_lo)
        g = greedy if greedy else (temp <= _GREEDY_EPS)
        nxt = sample_tokens(logits, coin, temp, topp, greedy=g,
                            top_k_hint=top_k)

        # frozen slots keep token/pos/rng; live slots advance
        token_n = jnp.where(newly_done, c.token, nxt)
        pos_n = jnp.where(newly_done, c.pos, c.pos + 1)
        hi_n = jnp.where(newly_done, c.rng_hi, hi)
        lo_n = jnp.where(newly_done, c.rng_lo, lo)
        return BatchCarry(step=c.step + 1, token=token_n, pos=pos_n,
                          done=newly_done, rng_hi=hi_n, rng_lo=lo_n,
                          k_cache=kc, v_cache=vc, out=out)

    if use_side:
        carry_k = kvcache.make_side(k_cache, chunk)
        carry_v = kvcache.make_side(v_cache, chunk)
    else:
        carry_k, carry_v = k_cache, v_cache
    init = BatchCarry(
        step=jnp.int32(0), token=token, pos=pos, done=done,
        rng_hi=rng_hi, rng_lo=rng_lo, k_cache=carry_k, v_cache=carry_v,
        out=jnp.full((B, chunk), -1, jnp.int32))
    c = jax.lax.while_loop(cond, body, init)

    if use_side:
        # merge each slot's chunk rows back into the main cache: one large
        # contiguous slice-update per slot per buffer, once per chunk.
        # Rows past a slot's final position carry garbage but sit at
        # indices >= pos, which nothing reads before they are rewritten.
        def merge(main, side_buf):
            def one(m, s):
                nd = m.ndim
                for b in range(B):
                    slab = jax.lax.dynamic_slice(
                        s, (0, b, 0) + (0,) * (nd - 3),
                        (s.shape[0], 1, chunk) + s.shape[3:])
                    m = jax.lax.dynamic_update_slice(
                        m, slab.astype(m.dtype),
                        (0, b, base_pos[b]) + (0,) * (nd - 3))
                return m

            if isinstance(main, tuple):
                return (one(main[0], side_buf[0]), one(main[1], side_buf[1]))
            return one(main, side_buf)

        new_k = merge(k_cache, c.k_cache)
        new_v = merge(v_cache, c.v_cache)
    else:
        new_k, new_v = c.k_cache, c.v_cache

    packed = jnp.concatenate(
        [c.out, c.pos[:, None],
         c.done.astype(jnp.int32)[:, None]], axis=1)
    return (packed, new_k, new_v, c.token, c.pos, c.done,
            c.rng_hi, c.rng_lo)


batched_decode_chunk = functools.partial(
    jax.jit,
    static_argnames=("cfg", "attn", "mode", "chunk", "greedy", "bos", "eos",
                     "top_k", "use_side", "axis_name", "out_vocab",
                     "bucket"),
    donate_argnames=("k_cache", "v_cache"),
)(batched_decode_chunk_impl)


def prefill_slot_chunk_impl(params, k_cache, v_cache, tokens, slot,
                            start_pos, last_pos, *, cfg, mode: str,
                            axis_name: str | None = None,
                            out_vocab: int | None = None):
    """One prompt chunk into cache slot `slot`: extract the slot's KV rows,
    run the same [1, T] forward program Engine._prefill dispatches, put the
    rows back. tokens: [T] i32 (padded per decode_loop.prefill_blocks —
    padded rows only write cache slots the decode loop overwrites before
    reading). Returns (last-valid-position logits [V], k, v).

    Chunking the slot prefill identically to the single-stream engine (same
    shapes through the same forward_impl) is what makes batched chat streams
    bit-equal to ChatSession: a single differently-shaped prefill reduction
    can flip a top-p near-tie many tokens later."""
    from qwen3_tpu.models.qwen3 import forward_impl

    take_row = lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=1)
    put_row = lambda full, part: jax.lax.dynamic_update_slice_in_dim(
        full, part, slot, axis=1)
    kv_rows = jax.tree.map(take_row, k_cache)
    vv_rows = jax.tree.map(take_row, v_cache)

    logits, kr, vr = forward_impl(params, cfg, tokens[None, :], kv_rows,
                                  vv_rows, start_pos, mode=mode,
                                  last_pos=last_pos, axis_name=axis_name,
                                  out_vocab=out_vocab)
    k_cache = jax.tree.map(put_row, k_cache, kr)
    v_cache = jax.tree.map(put_row, v_cache, vr)
    return logits[0, 0], k_cache, v_cache


prefill_slot_chunk = functools.partial(
    jax.jit, static_argnames=("cfg", "mode", "axis_name", "out_vocab"),
    donate_argnames=("k_cache", "v_cache"),
)(prefill_slot_chunk_impl)


def prefill_slots_chunk_impl(params, k_cache, v_cache, tokens, slots,
                             start_pos, last_pos, *, cfg, mode: str):
    """One prompt chunk for N requests AT ONCE: gather the N slots' KV rows,
    run one [N, C] forward (the same program shape family as the serial
    path — per-row math is batch-size-independent bitwise, so each stream
    equals its serial admission), scatter the rows back.

    tokens: [N, C] i32 padded blocks; slots: [N] i32; start_pos: i32 scalar
    (batched admission serves fresh start_pos=0 requests — chat
    continuations go through the serial path); last_pos: [N] i32 per-row
    last valid index within the chunk. Returns (logits [N, V], k, v).

    The slot gather/scatter is N unrolled dynamic slices / slice-updates,
    NOT jnp.take + .at[:, slots].set: the scatter form defeats XLA's
    donation aliasing of the cache, so the whole donated KV cache
    double-buffers across the masked writes — at B=512 that 4.8 GB copy
    pushed admission ~0.4 GB past the 16 GB chip while decode fit fine
    (round-4 PROFILE boundary note). The slice-update chain aliases in
    place, exactly like the serial prefill_slot_chunk path."""
    from qwen3_tpu.models.qwen3 import forward_impl

    N = tokens.shape[0]

    def take(a):
        return jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(a, slots[i], 1, axis=1)
             for i in range(N)], axis=1)

    def put(full, part):
        part = part.astype(full.dtype)
        for i in range(N):
            row = jax.lax.dynamic_slice_in_dim(part, i, 1, axis=1)
            full = jax.lax.dynamic_update_slice_in_dim(
                full, row, slots[i], axis=1)
        return full

    kv_rows = jax.tree.map(take, k_cache)
    vv_rows = jax.tree.map(take, v_cache)
    logits, kr, vr = forward_impl(params, cfg, tokens, kv_rows, vv_rows,
                                  start_pos, mode=mode, last_pos=last_pos)
    k_cache = jax.tree.map(put, k_cache, kr)
    v_cache = jax.tree.map(put, v_cache, vr)
    return logits[:, 0], k_cache, v_cache


prefill_slots_chunk = functools.partial(
    jax.jit, static_argnames=("cfg", "mode"),
    donate_argnames=("k_cache", "v_cache"),
)(prefill_slots_chunk_impl)


@functools.partial(jax.jit, static_argnames=("top_k",))
def first_tokens_batch(logits, rng_hi, rng_lo, temp, topp, *, top_k: int):
    """First sampled token for N freshly-prefilled requests (the batched
    counterpart of decode_loop.burn_and_sample at n_burn=0; per-row math is
    identical, so streams equal serial admission). All args [N]-rowed."""
    hi, lo, coin = xorshift_coin_device(rng_hi, rng_lo)
    g = temp <= _GREEDY_EPS                       # per-row greedy
    tok = sample_tokens(logits, coin, temp, topp, greedy=g,
                        top_k_hint=top_k)
    return tok, hi, lo


@dataclasses.dataclass
class Request:
    prompt: str | bytes
    seed: int = 0
    max_tokens: Optional[int] = None
    stream_cb: Optional[Callable[[bytes], None]] = None
    # per-request sampler overrides (None = engine defaults); clamped with
    # the reference's sampler_create semantics (src/sampler.c:36-52)
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    # chat-turn plumbing (used by BatchedChat; completion requests leave
    # these at their defaults):
    slot: Optional[int] = None      # pinned slot (conversation KV residency)
    start_pos: int = 0              # cache position of the turn's first id
    rng: Optional[tuple] = None     # (hi, lo) xorshift state to continue
    burn_prompt: bool = False       # burn len(ids)-1 draws (chat RNG parity)
    emit_at_limit: bool = False     # emit the token sampled at the limit
    # filled by the engine:
    rid: int = -1
    prompt_ids: list = dataclasses.field(default_factory=list)
    out_ids: list = dataclasses.field(default_factory=list)
    finished: bool = False
    prompt_ms: float = 0.0      # pp: encode + prefill wall ms
    generate_ms: float = 0.0    # tg: admit-to-finish decode wall ms
    end_pos: int = 0            # slot position after the turn (chat)
    end_rng: Optional[tuple] = None   # xorshift state after the turn (chat)
    _t_admit: float = 0.0

    @property
    def ms_per_token(self) -> float:
        return self.generate_ms / max(len(self.out_ids), 1)


@dataclasses.dataclass
class _Slot:
    req: Optional[Request] = None


class BatchedEngine:
    """Continuous-batching server over a fixed slot pool."""

    def __init__(self, path: str, *, max_batch: int = 8, seq_len: int = 1024,
                 mode: str = "bf16", temperature: float = 1.0,
                 top_p: float = 0.9, kv_dtype: str = "float32",
                 prefill_bucket: int = 128, decode_chunk: int = 32,
                 top_k: int = 64, attn: str = "auto",
                 side_buffer: bool = True, tp: int = 1, dp: int = 1,
                 model_cfg: ModelConfig | None = None, params=None,
                 aot_dir: str | None = None):
        """`model_cfg`/`params` inject an already-on-device parameter pytree
        (e.g. bench.py's device-synthesized params), skipping the checkpoint
        load; `path` is then only read for the `.tokenizer` sidecar.

        `tp`/`dp` > 1 builds a (dp, tp) mesh over jax.devices() and serves
        through the shard_map programs in parallel/tp.py: weights
        tensor-parallel (pallas modes; TP-aware fused packing), the KV cache
        and per-slot state batch-sharded over dp (max_batch % dp == 0).

        `aot_dir` (or env QWEN3_TPU_AOT_DIR) turns on the cross-process
        compiled-executable cache (utils/aotcache) for the single-device
        serving programs: on the tunneled backend a fresh process pays a
        multi-minute server-side compile per program — which a hard-timeout
        bench run or a cold serve restart cannot afford."""
        self.tokenizer = Tokenizer.from_file(path)
        self._aot_dir = aot_dir or os.environ.get("QWEN3_TPU_AOT_DIR")
        self._aot_fns: dict = {}
        self._mesh = None
        if tp > 1 or dp > 1:
            from qwen3_tpu.parallel import make_mesh

            if max_batch % dp:
                raise ValueError(f"max_batch={max_batch} must divide over "
                                 f"dp={dp}")
            if not mode.startswith("pallas"):
                # the shard_map serving programs expect the TP-aware fused
                # pack layout (parallel/tp.py); exact/bf16 shard via the
                # GSPMD specs in parallel/sharding.py instead
                raise ValueError("tp/dp>1 serving requires a pallas mode")
            self._mesh = make_mesh(dp=dp, tp=tp)
        if params is not None:
            assert model_cfg is not None, "params injection needs model_cfg"
            mc, self.params = model_cfg, params
        else:
            mc, self.params = load_params(path, mode=mode,
                                          max_seq_len=seq_len, tp=tp,
                                          mesh=self._mesh)
            from qwen3_tpu.models import materialize_params

            # upload now, not at the first decode dispatch (its docstring;
            # injected params are already device-resident)
            materialize_params(self.params)
        self.cfg: ModelConfig = mc.with_seq_len(seq_len)
        self.mode = mode
        if attn == "auto":
            # chip-measured (4B, int8 KV, side-buffer, round 3): dense wins
            # batched decode over flash at EVERY depth — B=64/seq 512 by
            # ~1.7x, and at full long-context depth B=8@8k 139.6 vs 130.3
            # tok/s, B=4@16k 70.3 vs 66.0, B=2@32k 34.6 vs 33.0 (flash
            # two-segment's per-(slot, tile) grid overhead eats its traffic
            # advantage once the dense path's bucketed reads amortize over
            # slots). Flash only pays off single-stream: 1.8x at depth 8k,
            # 1.4x at 16k — mirror Engine's policy for max_batch=1.
            # Round 5: attn="fused" (the in-place batched-decode Pallas
            # kernel, side-buffer only) replaces dense as the serving
            # default — chip-measured interleaved A/B at B=64/seq 512/int8
            # KV: fused 3313.0 vs dense 2390.3 tok/s best-of-4 (+38.6%,
            # tools/ab_fused_attn.py): it eliminates the per-layer slab
            # copy AND streams bucket tiles at DMA rate instead of the
            # dense dots' ~210 GB/s.
            attn = ("flash" if max_batch == 1 and seq_len >= 8192
                    else "fused" if (side_buffer
                                     and mode.startswith("pallas"))
                    else "dense")
        self.attn = attn
        self.side_buffer = side_buffer
        self.max_batch = max_batch
        self.temperature = clamp_temperature(temperature)
        self.top_p = clamp_top_p(top_p)
        self.greedy = self.temperature <= _GREEDY_EPS
        self.prefill_bucket = prefill_bucket
        self.decode_chunk = decode_chunk
        self.top_k = top_k

        B = max_batch
        # side-buffer mode merges a full chunk window per slot; the extra
        # rows absorb the overhang of a slot finishing right at seq_len.
        # Rounded up to the flash tile quantum (kvcache.pad_rows): a row
        # count like 8192+32 admits no 128-multiple S-tile, which degrades
        # the flash kernels to 32-row tiles and fails int8-KV lowering.
        # Dense-pinned engines pad to 128 only: the final attention bucket
        # (= full row count) must stay lane-aligned — a 224-row cache
        # measured 10% slower than 256 at B=256 — but the flash quantum's
        # extra rows (544 -> 768 at the B=64 flagship) are pure slab-copy
        # waste.
        # dense needs only lane alignment; fused buckets are 128-multiples
        # (the kernel picks a 128-row S-tile when 256 doesn't divide);
        # flash keeps the 256 tile quantum (ops/pallas/flash_decode.py)
        cache_rows = kvcache.pad_rows(
            self.cfg.seq_len + (decode_chunk if side_buffer else 0),
            quantum=128 if self.attn in ("dense", "fused") else 256)
        if self._mesh is not None:
            from qwen3_tpu.parallel.tp import init_sharded_kv

            self._kv = init_sharded_kv(self.cfg, B, cache_rows,
                                       jnp.dtype(kv_dtype), self._mesh)
        else:
            self._kv = init_kv_cache(self.cfg, B, cache_rows,
                                     jnp.dtype(kv_dtype))
        self._tp_fns: dict = {}
        # per-slot sampler params (engine defaults until a request overrides).
        # Device mirrors are refreshed only when admission/finish mutates the
        # host copies: re-uploading four [B] arrays EVERY chunk costs a
        # tunnel round-trip each (~150 ms/chunk at B=64 — measured round 4
        # as the gap between raw AOT dispatch (705 ms) and the engine loop
        # (1282 ms) per chunk).
        self._temp_host = np.full((B,), self.temperature, np.float32)
        self._topp_host = np.full((B,), self.top_p, np.float32)
        self._emit_host = np.zeros((B,), np.bool_)
        self._slot_args_dirty = True
        self._limit_dev = None
        self._temp_dev = None
        self._topp_dev = None
        self._emit_dev = None
        self._pinned: set[int] = set()   # conversation-held slots
        self._token = jnp.zeros((B,), jnp.int32)
        self._pos = jnp.zeros((B,), jnp.int32)
        # Host shadow of `self._pos`, exact (admission sets it; every chunk's
        # packed fetch carries c.pos back). With QWEN3_TPU_STATIC_BUCKET=1,
        # _step picks the dense attention bucket ON THE HOST and dispatches
        # a per-bucket compiled program (`static_bucket`) instead of the
        # in-program lax.switch. Measured and REJECTED as the default
        # (round 4, interleaved A/B at B=64: 1961 vs 2313 tok/s): the
        # static prefix slice of the [B, S, ...] cache is a B-strided copy
        # at ~110 GB/s, slower than the switch's full contiguous slab
        # extract at ~550 GB/s — see ops/attention.py:_bucketed and
        # PROFILE.md. Kept as an env-gated probe path.
        self._pos_host = np.zeros((B,), np.int64)
        self._attn_buckets = None
        if (self.attn == "fused"
                or (self.attn == "dense"
                    and os.environ.get("QWEN3_TPU_STATIC_BUCKET") == "1")):
            from qwen3_tpu.ops.attention import _bucket_sizes

            # fused: the host ALWAYS picks the attention bucket (the Pallas
            # kernel's grid is sized to it — no in-program switch at all);
            # cache_rows is a 256 multiple (pad_rows quantum above), so
            # every bucket divides into the kernel's 256-row S-tiles
            self._attn_buckets = _bucket_sizes(cache_rows)
        self._limit = np.zeros((B,), np.int32)
        self._done = jnp.ones((B,), jnp.bool_)
        self._rng_hi = jnp.zeros((B,), jnp.uint32)
        self._rng_lo = jnp.zeros((B,), jnp.uint32)
        self._slots = [_Slot() for _ in range(B)]
        self._queue: list[Request] = []
        self._next_rid = 0

    # -- API -------------------------------------------------------------

    def submit(self, req: Request) -> Request:
        req.rid = self._next_rid
        self._next_rid += 1
        self._queue.append(req)
        return req

    def run(self) -> list[Request]:
        """Run until every submitted request finishes; returns them."""
        finished: list[Request] = []
        while self._queue or any(s.req for s in self._slots):
            self._admit()
            if self._queue and not any(s.req for s in self._slots):
                # nothing admitted and nothing live: every remaining request
                # needs a slot that conversations hold pinned — spinning
                # would livelock (pins only drop via BatchedChat.close)
                raise RuntimeError(
                    f"{len(self._queue)} queued request(s) cannot be "
                    f"admitted: all free slots are pinned by conversations "
                    f"({sorted(self._pinned)}); close a conversation or "
                    f"raise max_batch")
            finished.extend(self._step())
        return finished

    # -- internals ---------------------------------------------------------

    def _admit(self) -> None:
        # chat turns go to their pinned slot; fresh requests fill free,
        # unpinned slots in FIFO order
        for req in [r for r in self._queue if r.slot is not None]:
            if self._slots[req.slot].req is None:
                self._queue.remove(req)
                self._admit_into(req.slot, req)
        assigned: list[tuple[int, Request]] = []
        for b, slot in enumerate(self._slots):
            if slot.req is not None or b in self._pinned:
                continue
            req = next((r for r in self._queue if r.slot is None), None)
            if req is None:
                break
            self._queue.remove(req)
            assigned.append((b, req))

        # batched admission: prefill same-block-plan fresh prompts in ONE
        # [N, C] forward per block instead of N serial dispatches. Streams
        # stay bit-equal to serial admission (per-row math is batch-size-
        # independent, and both paths share decode_loop.prefill_plan); chat
        # continuations (start_pos/rng/burn) take the serial path. On a
        # (dp, tp) mesh the rows route to the dp shards owning the slots
        # (_prefill_slots_mesh). One compile per distinct (group size N,
        # block width).
        C = self.prefill_bucket
        groups: dict[tuple, list[tuple[int, Request, list]]] = {}
        for b, req in assigned:
            ids = self.tokenizer.encode(req.prompt)[: self.cfg.seq_len]
            if (not req.burn_prompt
                    and req.rng is None and req.start_pos == 0 and ids):
                plan = prefill_plan(len(ids), 0, C, self.cfg.seq_len)
                groups.setdefault(plan, []).append((b, req, ids))
            else:
                self._admit_into(b, req)
        for plan, items in groups.items():
            # cap rows (N x width) per admission program: the [N, C]
            # forward's HBM temporaries scale with N*C (fp32 FFN
            # activations), and an uncapped 64 x 64 admission pushed the 4B
            # preset past the 16 GB chip at compile time. 1024 rows keeps
            # that term under ~1 GB at 4B.
            widest = max(size for _, size in plan)
            cap_n = max(2, int(os.environ.get("QWEN3_TPU_ADMIT_ROWS", "1024"))
                        // max(widest, 1))
            # ...but the gathered program ALSO copies each slot's FULL-depth
            # KV rows (jnp.take + .at[].set of [L, N, S_total, KH, HD] —
            # temps scale with N * cache depth, independent of C). Cap N so
            # those copies stay inside a fixed budget: at 4B / 768 cache
            # rows a 16-row admission put 4.65 G of HLO temps next to
            # 11.1 G of arguments and OOM'd the 16 GB chip at compile time
            # (bf16 KV, B=64 serving). cap_n=1 degrades to serial admission.
            per_row = (sum(x.nbytes for x in jax.tree.leaves(self._kv))
                       // max(self.max_batch, 1))
            budget = int(os.environ.get("QWEN3_TPU_ADMIT_KV_MB",
                                        "1536")) << 20
            cap_n = max(1, min(cap_n, budget // max(2 * per_row, 1)))
            while len(items) > 1:
                part, items = items[:cap_n], items[cap_n:]
                if len(part) == 1:
                    self._admit_into(part[0][0], part[0][1])
                else:
                    self._admit_batch(part, plan)
            if items:
                self._admit_into(items[0][0], items[0][1])

    def _admit_batch(self, items: list, plan: tuple) -> None:
        t0 = time.perf_counter()
        temps, topps = [], []
        for b, req, ids in items:
            r_temp = (self.temperature if req.temperature is None
                      else clamp_temperature(req.temperature))
            r_topp = (self.top_p if req.top_p is None
                      else clamp_top_p(req.top_p))
            self._temp_host[b] = r_temp
            self._topp_host[b] = r_topp
            self._emit_host[b] = req.emit_at_limit
            req.prompt_ids = ids
            temps.append(r_temp)
            topps.append(r_topp)
        temps = jnp.asarray(temps, jnp.float32)
        topps = jnp.asarray(topps, jnp.float32)

        if self._mesh is not None:
            logits = self._prefill_slots_mesh(items, plan)
        else:
            slots = jnp.asarray([b for b, _, _ in items], jnp.int32)
            k, v = self._kv
            logits = None
            for off, size in plan:
                blocks, lasts = [], []
                for _, _, ids in items:
                    blk = ids[off:off + size]
                    lasts.append(len(blk) - 1)
                    blocks.append(blk + [0] * (size - len(blk)))
                chunk_args = (self.params, k, v,
                              jnp.asarray(blocks, jnp.int32), slots,
                              jnp.int32(off), jnp.asarray(lasts, jnp.int32))
                statics = dict(cfg=self.cfg, mode=self.mode)
                if self._aot_dir:
                    logits, k, v = self._aot(
                        f"padmit_n{len(items)}_c{size}", prefill_slots_chunk,
                        chunk_args, statics)
                else:
                    logits, k, v = prefill_slots_chunk(*chunk_args, **statics)
            self._kv = (k, v)

        seeds = [seed_to_device(req.seed) for _, req, _ in items]
        hi0 = jnp.stack([s[0] for s in seeds])
        lo0 = jnp.stack([s[1] for s in seeds])
        tok, hi, lo = first_tokens_batch(logits, hi0, lo0, temps, topps,
                                         top_k=self.top_k)
        now = time.perf_counter()
        # ONE scatter per state array, not one .at[b].set per (item, array):
        # each tiny update is its own dispatch through the tunnel, and a
        # 64-request admission queued ~100 of them — the next chunk's fetch
        # then waited ~2s for the backlog (measured round 4, step debug)
        idxs = jnp.asarray([b for b, _, _ in items], jnp.int32)
        poss = jnp.asarray([len(ids) for _, _, ids in items], jnp.int32)
        self._token = self._token.at[idxs].set(tok)
        self._pos = self._pos.at[idxs].set(poss)
        self._pos_host[[b for b, _, _ in items]] = [
            len(ids) for _, _, ids in items]
        self._done = self._done.at[idxs].set(False)
        self._rng_hi = self._rng_hi.at[idxs].set(hi)
        self._rng_lo = self._rng_lo.at[idxs].set(lo)
        for i, (b, req, ids) in enumerate(items):
            req.prompt_ms = (now - t0) * 1e3
            req._t_admit = now
            pos = len(ids)
            limit = self.cfg.seq_len
            if req.max_tokens is not None:
                limit = min(limit, pos + req.max_tokens)
            self._limit[b] = limit
            self._slots[b].req = req
        self._slot_args_dirty = True

    def _aot(self, name: str, jitfn, args: tuple, statics: dict):
        """Dispatch `jitfn(*args, **statics)` through the cross-process
        compiled-executable cache (only called when `aot_dir` is set; see
        __init__). `name` must encode every static that varies at runtime
        (shapes are covered by the lowered-HLO hash in the cache key, the
        in-process memo here is by name alone)."""
        fn = self._aot_fns.get(name)
        if fn is None:
            from qwen3_tpu.utils.aotcache import aot_cached

            lowered = jitfn.lower(*args, **statics)
            fn = aot_cached(lowered, self._aot_dir, name,
                            log=lambda s: print(f"[Batched] {s}",
                                                file=sys.stderr))
            self._aot_fns[name] = fn
        return fn(*args)

    def _prefill_slots_mesh(self, items: list, plan: tuple):
        """Batched admission on the (dp, tp) mesh: route each request's row
        to the dp shard owning its slot, pad every shard to a common row
        count M with masked rows (whose cache writes are discarded by the
        program — they may alias live/pinned slots safely), and run ONE
        gathered-slots shard_map program per plan block
        (parallel/tp.make_tp_prefill_slots_chunk). Returns [len(items), V]
        last-valid-position logits in items order."""
        dp = self._mesh.shape["dp"]
        bl = self.max_batch // dp
        per: list[list[int]] = [[] for _ in range(dp)]
        for i, (b, _, _) in enumerate(items):
            per[b // bl].append(i)
        M = max(len(g) for g in per)
        rows: list[tuple[int, Optional[list]]] = []   # (slot, ids | None)
        item_row = [0] * len(items)
        for d, g in enumerate(per):
            used = {items[i][0] for i in g}
            free = iter(s for s in range(d * bl, (d + 1) * bl)
                        if s not in used)
            for i in g:
                item_row[i] = len(rows)
                rows.append((items[i][0], items[i][2]))
            for _ in range(M - len(g)):
                rows.append((next(free), None))

        slots = jnp.asarray([s for s, _ in rows], jnp.int32)
        valid = jnp.asarray([ids is not None for _, ids in rows], bool)
        fn = self._tp_fn("prefill_slots")
        k, v = self._kv
        logits = None
        for off, size in plan:
            blocks, lasts = [], []
            for _, ids in rows:
                blk = [] if ids is None else ids[off:off + size]
                lasts.append(max(len(blk) - 1, 0))
                blocks.append(blk + [0] * (size - len(blk)))
            logits, k, v = fn(self.params, k, v,
                              jnp.asarray(blocks, jnp.int32), slots, valid,
                              jnp.int32(off), jnp.asarray(lasts, jnp.int32))
        self._kv = (k, v)
        return jnp.take(logits, jnp.asarray(item_row, jnp.int32), axis=0)

    def _admit_into(self, b: int, req: Request) -> None:
        t0 = time.perf_counter()
        ids = self.tokenizer.encode(req.prompt)
        # never run past the context (reference chat clips the same way)
        ids = ids[: self.cfg.seq_len - req.start_pos]
        if not ids:
            req.finished = True
            return
        r_temp = (self.temperature if req.temperature is None
                  else clamp_temperature(req.temperature))
        r_topp = (self.top_p if req.top_p is None
                  else clamp_top_p(req.top_p))
        self._temp_host[b] = r_temp
        self._topp_host[b] = r_topp
        self._emit_host[b] = req.emit_at_limit
        req.prompt_ids = ids

        # chunked prefill with the SAME policy (and hence the same compiled
        # forward shapes) as Engine._prefill — see prefill_slot_chunk
        k, v = self._kv
        logits = None
        for off, block, n_valid in prefill_blocks(
                ids, req.start_pos, self.prefill_bucket, self.cfg.seq_len):
            if self._mesh is not None:
                logits, k, v = self._tp_fn("prefill")(
                    self.params, k, v, jnp.asarray(block, jnp.int32),
                    jnp.int32(b), jnp.int32(req.start_pos + off),
                    jnp.int32(n_valid - 1))
            else:
                chunk_args = (self.params, k, v,
                              jnp.asarray(block, jnp.int32), jnp.int32(b),
                              jnp.int32(req.start_pos + off),
                              jnp.int32(n_valid - 1))
                statics = dict(cfg=self.cfg, mode=self.mode)
                if self._aot_dir:
                    logits, k, v = self._aot(
                        f"padmit1_c{len(block)}", prefill_slot_chunk,
                        chunk_args, statics)
                else:
                    logits, k, v = prefill_slot_chunk(*chunk_args, **statics)
        self._kv = (k, v)

        if req.rng is not None:
            hi0, lo0 = req.rng
        else:
            hi0, lo0 = seed_to_device(req.seed)
        n_burn = len(ids) - 1 if req.burn_prompt else 0
        tok1, hi, lo = burn_and_sample(
            logits, hi0, lo0, jnp.int32(n_burn), jnp.float32(r_temp),
            jnp.float32(r_topp), greedy=r_temp <= _GREEDY_EPS,
            top_k=self.top_k)
        tok = tok1[0]
        req.prompt_ms = (time.perf_counter() - t0) * 1e3
        req._t_admit = time.perf_counter()
        pos = req.start_pos + len(ids)
        self._token = self._token.at[b].set(tok)
        self._pos = self._pos.at[b].set(pos)
        self._pos_host[b] = pos
        limit = self.cfg.seq_len
        if req.max_tokens is not None:
            limit = min(limit, pos + req.max_tokens)
        self._limit[b] = limit
        self._done = self._done.at[b].set(False)
        self._rng_hi = self._rng_hi.at[b].set(hi)
        self._rng_lo = self._rng_lo.at[b].set(lo)
        self._slots[b].req = req
        self._slot_args_dirty = True

    def _tp_fn(self, kind: str, **statics):
        """Memoized shard_map serving programs (parallel/tp.py)."""
        key = (kind, tuple(sorted(statics.items())))
        if key not in self._tp_fns:
            from qwen3_tpu.parallel import tp as _tp

            if kind == "prefill":
                fn = _tp.make_tp_prefill_slot_chunk(
                    self._mesh, self.cfg, self.params, self._kv,
                    mode=self.mode)
            elif kind == "prefill_slots":
                fn = _tp.make_tp_prefill_slots_chunk(
                    self._mesh, self.cfg, self.params, self._kv,
                    mode=self.mode)
            else:
                fn = _tp.make_tp_batched_chunk(
                    self._mesh, self.cfg, self.params, self._kv, **statics)
            self._tp_fns[key] = fn
        return self._tp_fns[key]

    def _step(self) -> list[Request]:
        """One batched decode chunk; returns requests finished this chunk."""
        if not any(s.req for s in self._slots):
            return []
        all_greedy = bool((self._temp_host <= _GREEDY_EPS).all())
        statics = dict(
            mode=self.mode, chunk=self.decode_chunk,
            greedy=all_greedy, bos=self.tokenizer.special.bos,
            eos=self.tokenizer.special.eos, top_k=self.top_k,
            attn=self.attn, use_side=self.side_buffer)
        bucket = None
        if self._attn_buckets is not None:
            # two-segment attention reads main rows < base_pos (the chunk's
            # rows live in the side buffer); single-buffer attention reads
            # rows <= position, which advances up to chunk-1 inside the loop
            need = int(self._pos_host.max())
            if not self.side_buffer:
                need += self.decode_chunk
            bucket = next((n for n in self._attn_buckets if n >= need),
                          self._attn_buckets[-1])
            statics["bucket"] = bucket
        if self._slot_args_dirty:
            self._limit_dev = jnp.asarray(self._limit)
            self._temp_dev = jnp.asarray(self._temp_host)
            self._topp_dev = jnp.asarray(self._topp_host)
            self._emit_dev = jnp.asarray(self._emit_host)
            self._slot_args_dirty = False
        args = (self.params, self._kv[0], self._kv[1], self._token,
                self._pos, self._limit_dev, self._done,
                self._rng_hi, self._rng_lo, self._temp_dev,
                self._topp_dev, self._emit_dev)
        t0 = time.perf_counter()
        if self._mesh is not None:
            packed, k, v, tok, pos, done, hi, lo = self._tp_fn(
                "chunk", **statics)(*args)
        elif self._aot_dir:
            key = (f"bdec_b{self.max_batch}_c{self.decode_chunk}"
                   + ("_g" if all_greedy else "")
                   + ("" if bucket is None else f"_k{bucket}"))
            packed, k, v, tok, pos, done, hi, lo = self._aot(
                key, batched_decode_chunk, args, dict(cfg=self.cfg,
                                                      **statics))
        else:
            packed, k, v, tok, pos, done, hi, lo = batched_decode_chunk(
                *args, cfg=self.cfg, **statics)
        self._kv = (k, v)
        self._token, self._pos, self._done = tok, pos, done
        self._rng_hi, self._rng_lo = hi, lo

        t1 = time.perf_counter()
        arr = np.asarray(packed)        # single host fetch
        self._pos_host[:] = arr[:, -2]  # exact post-chunk positions
        if os.environ.get("QWEN3_TPU_STEP_DEBUG"):
            print(f"[Batched] chunk: dispatch {1e3*(t1-t0):.0f} ms, "
                  f"fetch {1e3*(time.perf_counter()-t1):.0f} ms",
                  file=sys.stderr, flush=True)
        finished = []
        for b, slot in enumerate(self._slots):
            req = slot.req
            if req is None:
                continue
            toks = [int(t) for t in arr[b, :self.decode_chunk] if t >= 0]
            if toks:
                req.out_ids.extend(toks)
                if req.stream_cb:
                    req.stream_cb(self.tokenizer.decode(toks))
            if bool(arr[b, -1]):
                req.finished = True
                req.generate_ms = (time.perf_counter() - req._t_admit) * 1e3
                if req.slot is not None:
                    # conversation bookkeeping for the next turn
                    req.end_pos = int(arr[b, -2])
                    req.end_rng = (self._rng_hi[b], self._rng_lo[b])
                finished.append(req)
                slot.req = None
                # freed slots fall back to engine defaults so an all-greedy
                # batch recovers the static argmax-only program
                self._temp_host[b] = self.temperature
                self._topp_host[b] = self.top_p
                self._emit_host[b] = False
                self._slot_args_dirty = True
        return finished

    # -- conversation slot pinning (used by BatchedChat) -------------------

    def pin_slot(self) -> int:
        """Reserve a free slot for a conversation's KV residency."""
        for b, slot in enumerate(self._slots):
            if slot.req is None and b not in self._pinned:
                self._pinned.add(b)
                return b
        raise RuntimeError("no free slot to pin (all held by conversations)")

    def unpin_slot(self, b: int) -> None:
        self._pinned.discard(b)
