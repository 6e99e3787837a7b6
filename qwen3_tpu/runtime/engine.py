"""Engine: checkpoint + tokenizer + sampler assembly and generation loops.

Mirrors the reference facade (src/qwen.c:14-49 `qwen_create`) and completion
loop (src/completion.c:24-84) semantics, re-architected for TPU:

- prompt prefill runs as chunked batched forward passes (the reference
  teacher-forces one token per step through the full model);
- decode runs as fused on-device chunks (see runtime/decode_loop.py):
  forward + xorshift RNG + top-p sampling + stop handling inside one jitted
  while_loop, one small device->host fetch per K tokens — device round-trips,
  not FLOPs, dominate per-token latency on a remote TPU runtime;
- the xorshift64* state lives on device and carries across chunks and chat
  turns, so seeded streams reproduce the C engine token-for-token.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from qwen3_tpu.config import MAX_SEQ_LEN, ModelConfig
from qwen3_tpu.models import forward, init_kv_cache, load_params
from qwen3_tpu.runtime.decode_loop import (
    burn_and_sample,
    decode_chunk,
    prefill_blocks,
)
from qwen3_tpu.runtime.sampler import Sampler
from qwen3_tpu.runtime.xorshift import seed_to_device
from qwen3_tpu.tokenizer import Tokenizer

_GREEDY_EPS = 1e-6


@dataclasses.dataclass
class EngineConfig:
    """Mirror of QwenConfig (include/qwen.h:65-72) + TPU knobs."""

    path: str
    think: bool = True
    seed: int = 0
    temperature: float = 1.0
    top_p: float = 0.9
    seq_len: int = 0               # 0 -> min(checkpoint max, 32768) like the CLI
    mode: str = "bf16"             # "exact" | "bf16" | "pallas" | "pallas-fast"
    attn: str = "auto"             # "auto" | "dense" | "flash" (decode attention)
    kv_dtype: str = "float32"
    prefill_chunk: int = 64
    decode_chunk: int = 32         # tokens generated per device dispatch
    top_k: int = 64                # top-k fast path for nucleus sampling (0=off)
    batch: int = 1
    tp: int = 1                    # tensor-parallel shards (pallas modes;
                                   # builds a (1, tp) mesh over jax.devices())
    # decode program:
    #   "slot"  — the serving engine's per-slot program at B=1
    #             (runtime/batched.py, direct KV writes). Streams are
    #             bit-equal to BatchedEngine(side_buffer=False).
    #   "side"  — same program with side-buffer KV staging; bit-equal to
    #             BatchedEngine(side_buffer=True), the serving default.
    #   "fused" — the B=1 fused chunk (runtime/decode_loop.py), also the
    #             tensor-parallel (tp>1) program. Same tokens in practice,
    #             but a different fp32 reduction order, so no bit-parity
    #             guarantee against the batched engine.
    decode_impl: str = "slot"


@dataclasses.dataclass
class GenerationResult:
    ids: list[int]
    text: bytes
    prompt_ms: float = 0.0         # pp: encode + prefill wall ms
    generate_ms: float = 0.0       # tg: decode wall ms
    n_generated: int = 0

    @property
    def ms_per_token(self) -> float:
        return self.generate_ms / max(self.n_generated, 1)


class Engine:
    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.tokenizer = Tokenizer.from_file(cfg.path)
        seq_len = cfg.seq_len if cfg.seq_len > 0 else MAX_SEQ_LEN
        from qwen3_tpu.io.checkpoint import read_header

        self.model_cfg: ModelConfig = read_header(cfg.path).with_seq_len(
            seq_len)
        self._mesh = None
        if cfg.tp > 1:
            from qwen3_tpu.parallel import make_mesh

            self._mesh = make_mesh(dp=1, tp=cfg.tp)
        _, self.params = load_params(cfg.path, mode=cfg.mode,
                                     max_seq_len=self.model_cfg.seq_len,
                                     tp=cfg.tp, mesh=self._mesh)
        from qwen3_tpu.models import materialize_params

        # upload now, not at the first decode dispatch (see its docstring)
        materialize_params(self.params)
        self._tp_fns: dict = {}
        self.sampler = Sampler(self.tokenizer.vocab_size, cfg.temperature,
                               cfg.top_p, cfg.seed)
        # greedy shortcut: at the epsilon temperature the reference's top-p
        # path reduces to argmax (up to exact fp32 logit ties)
        self.greedy = self.sampler.temperature <= _GREEDY_EPS
        self.kv_dtype = jnp.dtype(cfg.kv_dtype)
        self._kv = None
        self._rng = seed_to_device(cfg.seed)

    # -- state ---------------------------------------------------------------

    def reset(self, batch: int = 1):
        if self._mesh is not None:
            from qwen3_tpu.parallel.tp import init_sharded_kv
            from qwen3_tpu.runtime.kvcache import pad_rows

            self._kv = init_sharded_kv(self.model_cfg, batch,
                                       pad_rows(self.model_cfg.seq_len),
                                       self.kv_dtype, self._mesh)
        else:
            from qwen3_tpu.runtime.kvcache import pad_rows

            # side-buffer decode merges a full chunk window; the extra rows
            # absorb the overhang of a stream finishing right at seq_len.
            # pad_rows keeps the row count flash-tileable (odd -c values or
            # the +chunk overhang would otherwise degrade the flash S-tile
            # and break int8-KV lowering)
            rows = pad_rows(self.model_cfg.seq_len + (
                self.cfg.decode_chunk if self.cfg.decode_impl == "side"
                else 0))
            self._kv = init_kv_cache(self.model_cfg, batch, rows,
                                     self.kv_dtype)

    def _tp_fn(self, kind: str, **statics):
        """Memoized shard_map wrappers (parallel/tp.py) for the mesh path."""
        key = (kind, tuple(sorted(statics.items())))
        if key not in self._tp_fns:
            from qwen3_tpu.parallel import tp as _tp

            maker = {"forward": _tp.make_tp_forward,
                     "chunk": _tp.make_tp_decode_chunk}[kind]
            self._tp_fns[key] = maker(self._mesh, self.model_cfg,
                                      self.params, self._kv, **statics)
        return self._tp_fns[key]

    def reset_rng(self):
        self._rng = seed_to_device(self.cfg.seed)

    def _attn_for(self, depth: int) -> str:
        """Resolve attn="auto" per dispatch from the ACTUAL attention depth
        (the cache position the program reads up to), not the configured
        buffer capacity: with the default 32k context a construction-time
        policy would pick flash for every run, including short chats.

        Chip-measured (4B, v5e, int8 KV): flash ~= dense at depth 1k, 1.8x
        dense at 8k, 1.4x at 16k, parity at 32k; dense wins shallow. A
        stream crossing the threshold switches programs between chunks (one
        extra compile, then cached)."""
        if self.cfg.attn != "auto":
            return self.cfg.attn
        return "flash" if depth >= 8192 else "dense"

    # -- forward helpers -----------------------------------------------------

    def _prefill(self, ids: list[int], start_pos: int) -> jnp.ndarray:
        """Chunked batched prefill; returns logits at the last prompt position."""
        cfg, chunk = self.model_cfg, self.cfg.prefill_chunk
        k, v = self._kv
        logits = None
        # chunk policy shared with BatchedEngine._admit_into (bit-parity);
        # padded rows only write cache slots beyond the prompt, which decode
        # overwrites before ever reading them. Only the last valid position's
        # logits are computed (last_pos) — one vocab-matmul row per chunk.
        for off, block, n_valid in prefill_blocks(ids, start_pos, chunk,
                                                  cfg.seq_len):
            attn = self._attn_for(start_pos + off)
            toks = jnp.asarray([block], jnp.int32)
            if self._mesh is not None:
                fwd = self._tp_fn("forward", mode=self.cfg.mode,
                                  attn=attn)
                lg, k, v = fwd(self.params, toks, k, v,
                               jnp.int32(start_pos + off),
                               jnp.int32(n_valid - 1))
            else:
                lg, k, v = forward(self.params, cfg, toks, k, v,
                                   jnp.int32(start_pos + off),
                                   mode=self.cfg.mode, attn=attn,
                                   last_pos=jnp.int32(n_valid - 1))
            logits = lg[:, 0]
        self._kv = (k, v)
        return logits  # [1, V]

    def _first_token(self, logits: jnp.ndarray, n_burn: int):
        """Sample the first generated token on device (after n_burn discarded
        RNG draws — chat burns one per prompt token like the C loop)."""
        hi, lo = self._rng
        tok, hi, lo = burn_and_sample(
            logits[0], hi, lo, jnp.int32(n_burn),
            jnp.float32(self.sampler.temperature),
            jnp.float32(self.sampler.top_p),
            greedy=self.greedy, top_k=self.cfg.top_k)
        self._rng = (hi, lo)
        return tok

    def _decode_chunks(self, token, pos, limit: int, emit_at_limit: bool):
        """Yield (np_tokens, done) per on-device chunk until stop/limit.

        Non-mesh decode dispatches the SAME compiled program the serving
        engine runs (runtime/batched.batched_decode_chunk at B=1; per-row
        math is batch-size-independent bitwise), so single-stream and
        batched streams agree token-for-token. The tp>1 mesh path keeps the
        fused shard_map chunk (cfg.decode_impl "fused")."""
        if self._mesh is None and self.cfg.decode_impl != "fused":
            yield from self._decode_chunks_slot(token, pos, limit,
                                                emit_at_limit)
            return
        k, v = self._kv
        hi, lo = self._rng
        t = self.tokenizer
        cur = int(pos)                 # host-tracked depth for attn="auto"
        pos = jnp.int32(pos)
        done = False
        statics = dict(
            mode=self.cfg.mode, chunk=self.cfg.decode_chunk,
            temperature=self.sampler.temperature, top_p=self.sampler.top_p,
            greedy=self.greedy, bos=t.special.bos, eos=t.special.eos,
            emit_at_limit=emit_at_limit, top_k=self.cfg.top_k)
        while not done:
            statics["attn"] = self._attn_for(cur)
            if self._mesh is not None:
                packed, k, v, token, pos, hi, lo = self._tp_fn(
                    "chunk", **statics)(self.params, k, v, token, pos,
                                        jnp.int32(limit), hi, lo)
            else:
                packed, k, v, token, pos, hi, lo = decode_chunk(
                    self.params, k, v, token, pos, jnp.int32(limit), hi, lo,
                    cfg=self.model_cfg, **statics)
            arr = np.asarray(packed)  # the one host sync per chunk
            n, done = int(arr[-2]), bool(arr[-1])
            cur += n
            self._kv = (k, v)
            self._rng = (hi, lo)
            self._last_pos = pos
            if n:
                yield arr[:n], done
            if n == 0:
                break

    def _decode_chunks_slot(self, token, pos, limit: int,
                            emit_at_limit: bool):
        """B=1 dispatch of the serving decode program (see _decode_chunks)."""
        from qwen3_tpu.runtime.batched import batched_decode_chunk

        k, v = self._kv
        hi, lo = self._rng
        t = self.tokenizer
        chunk = self.cfg.decode_chunk
        token = jnp.reshape(token, (1,)).astype(jnp.int32)
        pos = jnp.reshape(jnp.asarray(pos, jnp.int32), (1,))
        done_a = jnp.zeros((1,), jnp.bool_)
        hi = jnp.reshape(hi, (1,)).astype(jnp.uint32)
        lo = jnp.reshape(lo, (1,)).astype(jnp.uint32)
        temp = jnp.full((1,), self.sampler.temperature, jnp.float32)
        topp = jnp.full((1,), self.sampler.top_p, jnp.float32)
        emit = jnp.full((1,), emit_at_limit, jnp.bool_)
        lim = jnp.full((1,), limit, jnp.int32)
        done = False
        cur = int(np.asarray(pos)[0])  # host-tracked depth for attn="auto"
        while not done:
            packed, k, v, token, pos, done_a, hi, lo = batched_decode_chunk(
                self.params, k, v, token, pos, lim, done_a, hi, lo,
                temp, topp, emit, cfg=self.model_cfg, mode=self.cfg.mode,
                chunk=chunk, greedy=self.greedy, bos=t.special.bos,
                eos=t.special.eos, top_k=self.cfg.top_k,
                attn=self._attn_for(cur),
                use_side=self.cfg.decode_impl == "side")
            row = np.asarray(packed)[0]   # the one host sync per chunk
            cur = int(row[-2])
            toks = row[:chunk]
            toks = toks[toks >= 0]
            done = bool(row[-1])
            self._kv = (k, v)
            self._rng = (hi[0], lo[0])
            self._last_pos = pos[0]
            if len(toks):
                yield toks, done
            else:
                break

    # -- completion (single turn) ---------------------------------------------

    def generate(self, prompt: str | bytes,
                 stream_cb: Optional[Callable[[bytes], None]] = None,
                 max_tokens: Optional[int] = None) -> GenerationResult:
        """Single-turn completion with reference semantics
        (src/completion.c:24-84): teacher-force the prompt, then sample until
        BOS/EOS or the context limit; the stop token itself is not emitted."""
        t = self.tokenizer
        t0 = time.perf_counter()
        ids = t.encode(prompt)
        if not ids:
            raise ValueError("empty prompt")
        seq_len = self.model_cfg.seq_len
        ids = ids[:seq_len]

        self.reset(batch=1)
        logits = self._prefill(ids, 0)
        token = self._first_token(logits, 0)
        t1 = time.perf_counter()

        out_ids = list(ids)
        if stream_cb:
            stream_cb(t.decode(ids))

        limit = seq_len if max_tokens is None else min(
            seq_len, len(ids) + max_tokens)
        n_gen = 0
        for toks, _done in self._decode_chunks(token, len(ids), limit,
                                               emit_at_limit=False):
            out_ids.extend(int(x) for x in toks)
            n_gen += len(toks)
            if stream_cb:
                stream_cb(t.decode(toks))
        t2 = time.perf_counter()

        return GenerationResult(
            ids=out_ids, text=t.decode(out_ids),
            prompt_ms=(t1 - t0) * 1e3, generate_ms=(t2 - t1) * 1e3,
            n_generated=n_gen,
        )
