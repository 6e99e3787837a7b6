"""Engine: checkpoint + tokenizer + sampler assembly and generation loops.

Mirrors the reference facade (src/qwen.c:14-49 `qwen_create`) and completion
loop (src/completion.c:24-84) semantics, re-architected for TPU:

- prompt prefill runs as chunked batched forward passes (the reference
  teacher-forces one token per step through the full model);
- decode runs a jitted step (forward T=1 + on-device sampling), with one
  device->host transfer per token (the sampled id) for streaming;
- the xorshift RNG state advances on the host exactly like the C engine, so
  seeded streams reproduce token-for-token.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from qwen3_tpu.config import MAX_SEQ_LEN, ModelConfig
from qwen3_tpu.io.checkpoint import load_checkpoint
from qwen3_tpu.models import forward, init_kv_cache, init_params
from qwen3_tpu.runtime.sampler import Sampler, sample_device
from qwen3_tpu.tokenizer import Tokenizer


@dataclasses.dataclass
class EngineConfig:
    """Mirror of QwenConfig (include/qwen.h:65-72) + TPU knobs."""

    path: str
    think: bool = True
    seed: int = 0
    temperature: float = 1.0
    top_p: float = 0.9
    seq_len: int = 0               # 0 -> min(checkpoint max, 32768) like the CLI
    mode: str = "bf16"             # "exact" | "bf16"
    kv_dtype: str = "float32"
    prefill_chunk: int = 64
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
        weights = load_checkpoint(cfg.path)

        seq_len = cfg.seq_len if cfg.seq_len > 0 else MAX_SEQ_LEN
        self.model_cfg: ModelConfig = weights.config.with_seq_len(seq_len)

        self.params = init_params(weights, mode=cfg.mode,
                                  max_seq_len=self.model_cfg.seq_len)
        self.sampler = Sampler(self.tokenizer.vocab_size, cfg.temperature,
                               cfg.top_p, cfg.seed)
        self.kv_dtype = jnp.dtype(cfg.kv_dtype)
        self._kv = None

    # -- state ---------------------------------------------------------------

    def reset(self, batch: int = 1):
        self._kv = init_kv_cache(self.model_cfg, batch,
                                 self.model_cfg.seq_len, self.kv_dtype)

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
            # the prompt, which decode overwrites before ever reading them
            block = block + [0] * (chunk - n_valid)
            toks = jnp.asarray([block], jnp.int32)
            lg, k, v = forward(self.params, cfg, toks, k, v,
                               jnp.int32(start_pos + off), mode=self.cfg.mode,
                               all_logits=True)
            logits = lg[:, n_valid - 1]
        self._kv = (k, v)
        return logits  # [1, V]

    def _decode_step(self, token: int, pos: int) -> jnp.ndarray:
        k, v = self._kv
        lg, k, v = forward(self.params, self.model_cfg,
                           jnp.asarray([[token]], jnp.int32), k, v,
                           jnp.int32(pos), mode=self.cfg.mode)
        self._kv = (k, v)
        return lg[:, 0]  # [1, V]

    def _sample(self, logits: jnp.ndarray) -> int:
        coin = self.sampler.next_coin()
        tok = sample_device(logits, jnp.asarray([coin], jnp.float32),
                            temperature=self.sampler.temperature,
                            top_p=self.sampler.top_p)
        return int(tok[0])

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
        t1 = time.perf_counter()

        out_ids = list(ids)
        if stream_cb:
            stream_cb(t.decode(ids))

        limit = seq_len if max_tokens is None else min(
            seq_len, len(ids) + max_tokens)
        pos = len(ids)
        n_gen = 0
        next_tok = self._sample(logits)
        while pos < limit:
            if next_tok in (t.special.bos, t.special.eos):
                break
            out_ids.append(next_tok)
            n_gen += 1
            if stream_cb:
                stream_cb(t.id_to_token(next_tok))
            logits = self._decode_step(next_tok, pos)
            pos += 1
            next_tok = self._sample(logits)
        t2 = time.perf_counter()

        return GenerationResult(
            ids=out_ids, text=t.decode(out_ids),
            prompt_ms=(t1 - t0) * 1e3, generate_ms=(t2 - t1) * 1e3,
            n_generated=n_gen,
        )
