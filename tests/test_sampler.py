"""Sampler semantics: clamping, xorshift reproducibility, and host/device
agreement against a literal transcription of the C selection loops."""

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_tpu.runtime.sampler import (
    Sampler,
    clamp_temperature,
    clamp_top_p,
    sample_device,
    sample_from_probs_host,
)
from qwen3_tpu.runtime.xorshift import XorshiftRng, xorshift_step


def c_style_top_p(probs: np.ndarray, coin: float, top_p: float) -> int:
    """Literal reimplementation of sampler_top_p/mass_index/cdf_index
    (src/sampler.c:88-180) with sequential fp32 accumulation."""
    v = probs.shape[0]
    order = np.argsort(-probs, kind="stable")
    dist = probs[order].astype(np.float32)

    mass = np.float32(0.0)
    idx = v - 1
    for i in range(v):
        mass = np.float32(mass + dist[i])
        if mass > np.float32(top_p):
            idx = i
            break
    if mass < np.float32(1e-3):
        for i in range(idx + 1):
            mass = np.float32(mass + dist[i])

    r = np.float32(coin) * mass
    cdf = np.float32(0.0)
    for i in range(idx + 1):
        cdf = np.float32(cdf + dist[i])
        if r < cdf:
            return int(order[i])
    return int(order[idx - 1])


def test_xorshift_reproducible():
    a, b = XorshiftRng(1234), XorshiftRng(1234)
    seq_a = [a.next_float() for _ in range(100)]
    seq_b = [b.next_float() for _ in range(100)]
    assert seq_a == seq_b
    assert all(0.0 <= x < 1.0 for x in seq_a)
    # 64-bit state must not collapse
    s, _ = xorshift_step((1 << 63) | 12345)
    assert s > (1 << 32)


def test_clamping_matches_reference():
    assert clamp_temperature(float("nan")) == 1.0
    assert clamp_temperature(float("inf")) == 1.0
    assert clamp_temperature(-5.0) == 1e-6
    assert clamp_temperature(0.0) == 1e-6
    assert clamp_temperature(2.5) == 2.5
    assert clamp_top_p(float("nan")) == 1.0
    assert clamp_top_p(1.5) == 1.0
    assert clamp_top_p(0.0) == 1e-6
    assert clamp_top_p(-float("inf")) == 1e-6
    assert clamp_top_p(0.9) == 0.9


def test_greedy_at_tiny_temperature(rng):
    logits = rng.standard_normal(512).astype(np.float32) * 3
    s = Sampler(512, temperature=0.0, top_p=0.9, seed=7)
    for _ in range(5):
        assert s.sample_host(logits.copy()) == int(np.argmax(logits))


@pytest.mark.parametrize("top_p", [0.1, 0.5, 0.9, 0.999, 1.0])
def test_host_matches_c_loops(rng, top_p):
    for _ in range(20):
        logits = rng.standard_normal(256).astype(np.float32) * 2
        e = np.exp(logits - logits.max(), dtype=np.float32)
        probs = e / e.sum(dtype=np.float32)
        coin = float(rng.random(dtype=np.float32))
        assert sample_from_probs_host(probs, coin, top_p) == \
            c_style_top_p(probs, coin, top_p)


@pytest.mark.parametrize("top_p", [0.5, 0.9, 1.0])
@pytest.mark.parametrize("temp", [0.7, 1.0])
def test_device_matches_host(rng, top_p, temp):
    B, V = 4, 256
    logits = (rng.standard_normal((B, V)) * 2).astype(np.float32)
    coins = rng.random(B, dtype=np.float32)
    got = np.asarray(sample_device(jnp.asarray(logits), jnp.asarray(coins),
                                   temperature=temp, top_p=top_p))
    for b in range(B):
        x = logits[b] / np.float32(temp)
        e = np.exp(x - x.max(), dtype=np.float32)
        probs = e / e.sum(dtype=np.float32)
        want = sample_from_probs_host(probs, float(coins[b]), top_p)
        assert int(got[b]) == want, f"b={b}"


def test_sampled_stream_reproducible(rng):
    logits = (rng.standard_normal((1, 128)) * 2).astype(np.float32)
    s1 = Sampler(128, 0.8, 0.9, seed=42)
    s2 = Sampler(128, 0.8, 0.9, seed=42)
    stream1 = [s1.sample_host(logits[0].copy()) for _ in range(20)]
    stream2 = [s2.sample_host(logits[0].copy()) for _ in range(20)]
    assert stream1 == stream2
