"""Temperature / top-p (nucleus) sampling with reference semantics.

Pipeline per step (src/sampler.c:189-201): scale logits by 1/temperature,
softmax over the full vocab, draw a coin from xorshift64*, then nucleus
sampling (src/sampler.c:165-180): sort probabilities descending, truncate at
the smallest prefix whose cumulative mass exceeds top_p (src/sampler.c:88-112,
including the "mass healing" branch for mass < 1e-3), and pick by inverse CDF
r = coin * mass (src/sampler.c:125-135, with its dist[n-1] fallback).

Parameter clamping matches sampler_create (src/sampler.c:36-52):
top_p -> [1e-6, 1.0] (NaN/+inf -> 1.0), temperature -> [1e-6, inf)
(NaN/+inf -> 1.0). temperature ~ 0 therefore acts as greedy argmax.

Two implementations with identical semantics:
- `sample_host`: numpy, used as the parity oracle and by the simple CLI loop;
- `make_device_sampler`: jitted batched version; sorting/CDF on device so
  only the sampled token ids cross the host boundary.

Tie-breaking note: the reference qsorts with a comparator returning 0 on
equal probabilities; glibc's qsort is a (stable) mergesort in practice, so a
stable descending sort reproduces its order.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tpu.runtime.xorshift import XorshiftRng

_EPS = 1e-6
_HEAL_EPS = 1e-3


def clamp_top_p(top_p: float) -> float:
    if math.isnan(top_p) or top_p > 1.0 or top_p == math.inf:
        return 1.0
    if top_p < _EPS or top_p == -math.inf:
        return _EPS
    return top_p


def clamp_temperature(t: float) -> float:
    if math.isnan(t) or t == math.inf:
        return 1.0
    if t < _EPS or t == -math.inf:
        return _EPS
    return t


def top_p_index(cum: np.ndarray, top_p: float) -> int:
    """Smallest index whose cumulative mass exceeds top_p, else last index."""
    exceeded = np.nonzero(cum > np.float32(top_p))[0]
    return int(exceeded[0]) if exceeded.size else cum.shape[0] - 1


def sample_from_probs_host(probs: np.ndarray, coin: float, top_p: float) -> int:
    """Nucleus-sample a token id from a full softmax distribution."""
    order = np.argsort(-probs, kind="stable")
    sp = probs[order].astype(np.float32)
    cum = np.cumsum(sp, dtype=np.float32)
    idx = top_p_index(cum, top_p)
    mass = float(cum[idx])
    if mass < _HEAL_EPS:  # "heal" the truncated distribution
        mass += float(cum[idx])
    r = np.float32(coin) * np.float32(mass)
    hits = np.nonzero(r < cum[: idx + 1])[0]
    pick = int(hits[0]) if hits.size else idx - 1  # C fallback: dist[n-1]
    return int(order[pick])


class Sampler:
    """Host-side sampler with the reference's stateful RNG."""

    def __init__(self, vocab_size: int, temperature: float, top_p: float,
                 seed: int):
        self.vocab_size = vocab_size
        self.temperature = clamp_temperature(temperature)
        self.top_p = clamp_top_p(top_p)
        self.rng = XorshiftRng(seed)

    def sample_host(self, logits: np.ndarray) -> int:
        x = logits.astype(np.float32) / np.float32(self.temperature)
        x -= x.max()
        e = np.exp(x, dtype=np.float32)
        probs = e / e.sum(dtype=np.float32)
        coin = self.rng.next_float()
        return sample_from_probs_host(probs, coin, self.top_p)

    def next_coin(self) -> float:
        return self.rng.next_float()


def _nucleus_pick(order: jnp.ndarray, sp: jnp.ndarray, coin: jnp.ndarray,
                  top_p, default_idx) -> jnp.ndarray:
    """Shared truncation + inverse-CDF over descending (order, probs).

    `top_p` is a python float (one nucleus bound for every row) or a [B]
    fp32 array (per-row bounds — the per-request sampler path)."""
    cum = jnp.cumsum(sp, axis=-1, dtype=jnp.float32)
    tp = jnp.asarray(top_p, jnp.float32)
    exceeded = cum > (tp[:, None] if tp.ndim else tp)
    has_break = jnp.any(exceeded, axis=-1)
    idx = jnp.where(has_break, jnp.argmax(exceeded, axis=-1), default_idx)
    mass = jnp.take_along_axis(cum, idx[:, None], axis=-1)[:, 0]
    mass = jnp.where(mass < _HEAL_EPS, mass + mass, mass)

    r = coin.astype(jnp.float32) * mass
    n = sp.shape[-1]
    in_prefix = jnp.arange(n, dtype=jnp.int32)[None, :] <= idx[:, None]
    hit = (r[:, None] < cum) & in_prefix
    has_hit = jnp.any(hit, axis=-1)
    pick = jnp.where(has_hit, jnp.argmax(hit, axis=-1), idx - 1)
    return jnp.take_along_axis(order, pick[:, None], axis=-1)[:, 0].astype(
        jnp.int32
    )


def sample_tokens(logits: jnp.ndarray, coin: jnp.ndarray,
                  temperature, top_p,
                  greedy=False, top_k_hint: int = 0) -> jnp.ndarray:
    """Functional batched nucleus sampling (traceable inside loops).

    logits: [B, V] fp32, coin: [B] fp32 in [0,1). Returns [B] int32 token ids.
    `temperature`/`top_p` must already be clamped; each is a python float
    (whole-batch) or a [B] fp32 array (per-request sampling — the math per
    row is bitwise identical to the scalar path with that row's values, so
    batched streams stay bit-equal to single-stream runs). With `greedy=True`
    (static) the full sort is skipped and argmax is returned (equivalent to
    the epsilon-temperature path for non-tied logits; the reference resolves
    exact fp32 ties by coin flip, argmax by lowest id); a [B] bool array
    applies argmax per row.

    `top_k_hint` > 0 enables the fast path: if the top-k prefix already
    exceeds top_p, the nucleus is fully contained in it and sampling over the
    k candidates is *exact*; otherwise fall back to the full-vocab sort
    (lax.cond, paid only when taken). Peaked real-model distributions almost
    always hit the fast path.
    """
    if isinstance(greedy, bool) and greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    B, V = logits.shape
    temp = jnp.asarray(temperature, jnp.float32)
    x = logits.astype(jnp.float32) / (temp[:, None] if temp.ndim else temp)
    probs = jax.nn.softmax(x, axis=-1)

    def full_sort(probs_coin):
        probs, coin = probs_coin
        order = jnp.argsort(-probs, axis=-1, stable=True)
        sp = jnp.take_along_axis(probs, order, axis=-1)
        return _nucleus_pick(order, sp, coin, top_p, V - 1)

    if not top_k_hint or top_k_hint >= V:
        sampled = full_sort((probs, coin))
    else:
        k = top_k_hint
        # descending, ties by lower index
        sp_k, order_k = jax.lax.top_k(probs, k)
        covered = jnp.sum(sp_k, axis=-1) > jnp.maximum(
            jnp.asarray(top_p, jnp.float32), jnp.float32(_HEAL_EPS))

        def fast(probs_coin):
            _, coin = probs_coin
            return _nucleus_pick(order_k, sp_k, coin, top_p, k - 1)

        sampled = jax.lax.cond(jnp.all(covered), fast, full_sort,
                               (probs, coin))
    if isinstance(greedy, bool):
        return sampled
    return jnp.where(greedy, jnp.argmax(logits, axis=-1).astype(jnp.int32),
                     sampled)


@functools.partial(jax.jit, static_argnames=("temperature", "top_p"))
def sample_device(logits: jnp.ndarray, coin: jnp.ndarray, *,
                  temperature: float, top_p: float) -> jnp.ndarray:
    """Jitted wrapper around sample_tokens for standalone use."""
    return sample_tokens(logits, coin, temperature, top_p)
