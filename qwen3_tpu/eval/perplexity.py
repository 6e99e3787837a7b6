"""Perplexity evaluation.

The quality acceptance criterion for the framework is perplexity parity with
the reference C engine (Δppl <= 0.05 at Q8_0), since bit-exact sampled streams
are unattainable across fp stacks (see tests/test_c_oracle.py). The reference
itself has no evaluator — the oracle is the exact-mode forward, whose logits
match the C integer pipeline.

NLL convention: mean over positions of -log softmax(logits[t])[token[t+1]],
teacher-forced, fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tpu.models import init_kv_cache
from qwen3_tpu.models.qwen3 import forward_impl

# DONATED cache args: the undonated jit double-buffers the KV cache per
# chunk, which pushed the 4B exact-mode (fp32 KV) evaluation at ctx 16384
# past the 16 GB chip (2 x 4.8 GB cache copies beside the weights)
_forward_d = functools.partial(
    jax.jit, static_argnames=("cfg", "mode", "all_logits", "attn"),
    donate_argnames=("k_cache", "v_cache"))(forward_impl)


def sequence_nll(params, cfg, tokens: list[int], *, mode: str = "bf16",
                 kv_dtype=jnp.float32, chunk: int = 256) -> np.ndarray:
    """Per-position negative log-likelihoods for a token sequence.

    Returns an fp32 array of length len(tokens) - 1 (next-token NLLs).
    """
    toks = jnp.asarray([tokens], jnp.int32)
    n = len(tokens)
    k, v = init_kv_cache(cfg, 1, max(n, 1), kv_dtype)

    nlls = []
    for off in range(0, n - 1, chunk):
        t = min(chunk, n - off)          # includes the next-token targets
        block = toks[:, off:off + t]
        logits, k, v = _forward_d(params, cfg, block, k, v, jnp.int32(off),
                                  mode=mode, all_logits=True)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # target for position off+i is tokens[off+i+1]
        upto = min(t, n - 1 - off)
        targets = toks[0, off + 1: off + upto + 1]
        picked = jnp.take_along_axis(
            logp[0, :upto], targets[:, None], axis=-1)[:, 0]
        nlls.append(np.asarray(-picked))
    return np.concatenate(nlls) if nlls else np.zeros((0,), np.float32)


def perplexity(params, cfg, tokens: list[int], **kw) -> float:
    nll = sequence_nll(params, cfg, tokens, **kw)
    return float(np.exp(nll.mean())) if nll.size else float("nan")
