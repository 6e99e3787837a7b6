"""Prologue-fused tiled Q8_0 matmul (ops/pallas/q8_matmul.q8_matmul_fused)
vs the unfused op chains, CPU interpret mode.

The in-kernel prologue reproduces rmsnorm/swiglu/quantize_act EXACTLY (the
quantized int8 values and group scales are bitwise-identical — asserted via
an fp64 oracle of the reference math) — but the fp32 scale application may
differ from the unfused kernel by ~1 ulp (XLA fma contraction varies with
the surrounding graph), the same slack q8_q8_matmul_pallas documents vs.
ops.quant_matmul.q8_matmul_exact. Tests pin both: ulp-tight distance to the
unfused kernel AND fp64-oracle distance no worse than the unfused kernel's.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from qwen3_tpu.ops.activations import swiglu
from qwen3_tpu.ops.norms import rms_inv, rmsnorm
from qwen3_tpu.ops.pallas.q8_matmul import (
    q8_matmul_fused,
    q8_matmul_tiled_fast,
    q8_q8_matmul_tiled,
    repack_tiles,
)
from qwen3_tpu.ops.q8 import quantize_act

G = 64
N, D = 1024, 768   # contraction, output


def _mk_weights(rng, n, d):
    w = rng.standard_normal((n, d)).astype(np.float32) * 0.02
    s = (np.abs(w).reshape(n // G, G, d).max(axis=1) / 127.0 + 1e-6)
    q = np.clip(np.round(w / np.repeat(s, G, axis=0)), -127, 127)
    return q.astype(np.int8), s.astype(np.float32)


_WQ, _WS = _mk_weights(np.random.default_rng(0), N, D)


@pytest.fixture(scope="module")
def wt():
    return repack_tiles(_WQ, _WS, G)


def _oracle64(h):
    """Reference math in int64 dots + fp64 scales: quantize_act(h) @ W."""
    xq, xs = quantize_act(jnp.asarray(h), G)
    xqn = np.asarray(xq).astype(np.int64)
    xsn = np.asarray(xs).astype(np.float64)
    out = np.zeros((h.shape[0], D), np.float64)
    for i in range(N // G):
        dot = xqn[:, i * G:(i + 1) * G] @ _WQ[i * G:(i + 1) * G].astype(
            np.int64)
        out += dot * (xsn[:, i:i + 1] * _WS[i][None, :].astype(np.float64))
    return out


def _check(got, want, h):
    got, want = np.asarray(got), np.asarray(want)
    # ulp-tight against the unfused kernel...
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    # ...and no farther from the fp64 reference oracle than the unfused is
    oracle = _oracle64(np.asarray(h, np.float32))
    d_got = np.abs(got - oracle).max()
    d_want = np.abs(want - oracle).max()
    assert d_got <= d_want * 2 + 1e-6, (d_got, d_want)


@pytest.mark.parametrize("b", [1, 8])
def test_fused_norm_exact(wt, b):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, N)).astype(np.float32))
    nw = jnp.asarray(1.0 + 0.1 * rng.standard_normal(N).astype(np.float32))

    h = rmsnorm(x, nw)
    xq, xs = quantize_act(h, G)
    want = q8_q8_matmul_tiled(xq, xs, *wt, G, interpret=True)

    got = q8_matmul_fused(x, *wt, G, inv=rms_inv(x), nw=nw,
                          prologue="norm", exact=True, interpret=True)
    _check(got, want, h)


def test_fused_swiglu_exact(wt):
    rng = np.random.default_rng(2)
    gu = jnp.asarray(rng.standard_normal((4, 2 * N)).astype(np.float32))

    h = swiglu(gu[:, :N], gu[:, N:])
    xq, xs = quantize_act(h, G)
    want = q8_q8_matmul_tiled(xq, xs, *wt, G, interpret=True)

    got = q8_matmul_fused(gu, *wt, G, prologue="swiglu", exact=True,
                          interpret=True)
    _check(got, want, h)


def test_fused_none_exact(wt):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, N)).astype(np.float32))
    xq, xs = quantize_act(x, G)
    want = q8_q8_matmul_tiled(xq, xs, *wt, G, interpret=True)
    got = q8_matmul_fused(x, *wt, G, prologue="none", exact=True,
                          interpret=True)
    _check(got, want, x)


@pytest.mark.parametrize("prologue", ["norm", "swiglu", "none"])
def test_fused_fast_matches_unfused(wt, prologue):
    rng = np.random.default_rng(4)
    b = 3
    if prologue == "swiglu":
        gu = jnp.asarray(rng.standard_normal((b, 2 * N)).astype(np.float32))
        h = swiglu(gu[:, :N], gu[:, N:])
        got = q8_matmul_fused(gu, *wt, G, prologue="swiglu", interpret=True)
    elif prologue == "norm":
        x = jnp.asarray(rng.standard_normal((b, N)).astype(np.float32))
        nw = jnp.asarray(1.0 + 0.1 * rng.standard_normal(N).astype(np.float32))
        h = rmsnorm(x, nw)
        got = q8_matmul_fused(x, *wt, G, inv=rms_inv(x), nw=nw,
                              prologue="norm", interpret=True)
    else:
        h = jnp.asarray(rng.standard_normal((b, N)).astype(np.float32))
        got = q8_matmul_fused(h, *wt, G, prologue="none", interpret=True)
    want = q8_matmul_tiled_fast(h, *wt, G, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("mode", ["pallas", "pallas-fast"])
def test_fused_forward_matches_unfused(monkeypatch, mode):
    """QWEN3_TPU_FUSE=1 end-to-end: logits of the full pallas forward with
    fused prologues match the unfused forward, and greedy decode streams are
    identical (tiny synthetic model)."""
    import dataclasses

    from qwen3_tpu.config import PRESETS
    from qwen3_tpu.io.synthetic import synthetic_weights
    from qwen3_tpu.models import forward, init_kv_cache, init_params
    from qwen3_tpu.models.qwen3 import decode_forward_impl

    cfg = dataclasses.replace(PRESETS["tiny"], seq_len=64)
    params = init_params(
        dataclasses.replace(synthetic_weights(PRESETS["tiny"], seed=3),
                            config=cfg), mode=mode, max_seq_len=64)
    toks = (jnp.arange(2 * 8, dtype=jnp.int32) % 101).reshape(2, 8)

    def run():
        # the env flag is read at trace time: bust jit caches so the second
        # run actually re-traces with the flipped flag
        import jax

        jax.clear_caches()
        k, v = init_kv_cache(cfg, 2, 64)
        lg, k, v = forward(params, cfg, toks, k, v, jnp.int32(0), mode=mode,
                           last_pos=jnp.int32(7))
        lg2, k, v = decode_forward_impl(
            params, cfg, jnp.asarray([5, 9], jnp.int32), k, v,
            jnp.asarray([8, 8], jnp.int32), mode=mode)
        return np.asarray(lg[:, 0]), np.asarray(lg2)

    monkeypatch.delenv("QWEN3_TPU_FUSE", raising=False)
    base_pre, base_dec = run()
    monkeypatch.setenv("QWEN3_TPU_FUSE", "1")
    fuse_pre, fuse_dec = run()
    np.testing.assert_allclose(fuse_pre, base_pre, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(fuse_dec, base_dec, rtol=2e-4, atol=2e-4)
    assert (fuse_pre.argmax(-1) == base_pre.argmax(-1)).all()
    assert (fuse_dec.argmax(-1) == base_dec.argmax(-1)).all()


def test_fused_prefill_rows(wt):
    """[B, T, n] activations (prefill shape) flatten per row; inv is per
    (b, t) row."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 4, N)).astype(np.float32))
    nw = jnp.asarray(1.0 + 0.1 * rng.standard_normal(N).astype(np.float32))
    h = rmsnorm(x, nw)
    xq, xs = quantize_act(h, G)
    want = q8_q8_matmul_tiled(xq, xs, *wt, G, interpret=True)
    got = q8_matmul_fused(x, *wt, G, inv=rms_inv(x), nw=nw,
                          prologue="norm", exact=True, interpret=True)
    assert got.shape == want.shape == (2, 4, D)
    _check(got.reshape(8, D), want.reshape(8, D), np.asarray(h).reshape(8, N))
