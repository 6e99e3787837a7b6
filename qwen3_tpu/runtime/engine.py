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
from qwen3_tpu.runtime.decode_loop import burn_and_sample, decode_chunk
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
    attn: str = "dense"            # "dense" | "flash" (decode attention)
    kv_dtype: str = "float32"
    prefill_chunk: int = 64
    decode_chunk: int = 32         # tokens generated per device dispatch
    top_k: int = 64                # top-k fast path for nucleus sampling (0=off)
    batch: int = 1


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
        _, self.params = load_params(cfg.path, mode=cfg.mode,
                                     max_seq_len=self.model_cfg.seq_len)
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
        self._kv = init_kv_cache(self.model_cfg, batch,
                                 self.model_cfg.seq_len, self.kv_dtype)

    def reset_rng(self):
        self._rng = seed_to_device(self.cfg.seed)

    # -- forward helpers -----------------------------------------------------

    def _prefill(self, ids: list[int], start_pos: int) -> jnp.ndarray:
        """Chunked batched prefill; returns logits at the last prompt position."""
        cfg, chunk = self.model_cfg, self.cfg.prefill_chunk
        k, v = self._kv
        logits = None
        for off in range(0, len(ids), chunk):
            block = ids[off:off + chunk]
            n_valid = len(block)
            # pad the tail chunk; padded rows only write cache slots beyond
            # the prompt, which decode overwrites before ever reading them.
            # Only the last valid position's logits are computed (last_pos) —
            # one vocab-matmul row per chunk, not `chunk` of them.
            block = block + [0] * (chunk - n_valid)
            toks = jnp.asarray([block], jnp.int32)
            lg, k, v = forward(self.params, cfg, toks, k, v,
                               jnp.int32(start_pos + off), mode=self.cfg.mode,
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
            temperature=self.sampler.temperature, top_p=self.sampler.top_p,
            greedy=self.greedy, top_k=self.cfg.top_k)
        self._rng = (hi, lo)
        return tok

    def _decode_chunks(self, token, pos, limit: int, emit_at_limit: bool):
        """Yield (np_tokens, done) per on-device chunk until stop/limit."""
        k, v = self._kv
        hi, lo = self._rng
        t = self.tokenizer
        pos = jnp.int32(pos)
        done = False
        while not done:
            packed, k, v, token, pos, hi, lo = decode_chunk(
                self.params, k, v, token, pos, jnp.int32(limit), hi, lo,
                cfg=self.model_cfg, mode=self.cfg.mode,
                chunk=self.cfg.decode_chunk,
                temperature=self.sampler.temperature,
                top_p=self.sampler.top_p, greedy=self.greedy,
                bos=t.special.bos, eos=t.special.eos,
                emit_at_limit=emit_at_limit, top_k=self.cfg.top_k,
                attn=self.cfg.attn)
            arr = np.asarray(packed)  # the one host sync per chunk
            n, done = int(arr[-2]), bool(arr[-1])
            self._kv = (k, v)
            self._rng = (hi, lo)
            self._last_pos = pos
            if n:
                yield arr[:n], done
            if n == 0:
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
