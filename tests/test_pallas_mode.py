"""Pallas fused dequant+matmul kernel: correctness (interpret mode on CPU)
and end-to-end pallas-mode forward parity with the exact-mode engine."""

import numpy as np
import jax.numpy as jnp
import pytest

from qwen3_tpu.models import forward, init_kv_cache, init_params
from qwen3_tpu.ops.pallas.q8_matmul import q8_matmul_pallas


def test_kernel_matches_dequant_matmul(rng):
    G, n, d = 32, 128, 256
    wq = rng.integers(-127, 128, size=(n, d)).astype(np.int8)
    ws = (0.01 * (0.5 + rng.random((n // G, d)))).astype(np.float32)
    x = (rng.standard_normal((4, n)) * 0.1).astype(np.float32)

    got = np.asarray(q8_matmul_pallas(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(ws), G,
        compute_dtype=jnp.float32, interpret=True))
    w = (wq.astype(np.float32).reshape(n // G, G, d) * ws[:, None, :]
         ).reshape(n, d)
    want = x @ w
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_kernel_3d_batch(rng):
    G, n, d = 32, 64, 128
    wq = rng.integers(-127, 128, size=(n, d)).astype(np.int8)
    ws = (0.01 * (0.5 + rng.random((n // G, d)))).astype(np.float32)
    x = (rng.standard_normal((2, 3, n)) * 0.1).astype(np.float32)
    got = np.asarray(q8_matmul_pallas(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(ws), G,
        compute_dtype=jnp.float32, interpret=True))
    w = (wq.astype(np.float32).reshape(n // G, G, d) * ws[:, None, :]
         ).reshape(n, d)
    np.testing.assert_allclose(got, x @ w, rtol=1e-5, atol=1e-5)


def test_q8q8_kernel_matches_exact(rng):
    """int8 x int8 kernel must be numerically equivalent to the exact jnp
    path (same integer dots, fp32 scaling)."""
    from qwen3_tpu.ops.pallas.q8_matmul import q8_q8_matmul_pallas
    from qwen3_tpu.ops.quant_matmul import q8_matmul_exact
    from qwen3_tpu.ops.q8 import quantize_act

    G, n, d = 32, 256, 128
    wq = rng.integers(-127, 128, size=(n, d)).astype(np.int8)
    ws = (0.01 * (0.5 + rng.random((n // G, d)))).astype(np.float32)
    x = (rng.standard_normal((2, n)) * 0.1).astype(np.float32)
    xq, xs = quantize_act(jnp.asarray(x), G)

    got = np.asarray(q8_q8_matmul_pallas(
        xq, xs, jnp.asarray(wq), jnp.asarray(ws), G, interpret=True))
    # the exact jnp path uses the untransposed [d, n] weight layout
    want = np.asarray(q8_matmul_exact(
        xq, xs, jnp.asarray(np.ascontiguousarray(wq.T)),
        jnp.asarray(np.ascontiguousarray(ws.T)), G))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pallas_mode_forward_matches_exact(tiny_weights, tiny_cfg):
    """pallas mode now computes the reference-exact integer math — logits
    must match exact mode tightly and share the greedy argmax."""
    cfg = tiny_cfg
    pp = init_params(tiny_weights, mode="pallas")
    pe = init_params(tiny_weights, mode="exact")
    toks = jnp.asarray([[1, 2, 3, 4]], jnp.int32)

    k, v = init_kv_cache(cfg, 1, 64)
    lg_p, _, _ = forward(pp, cfg, toks, k, v, jnp.int32(0),
                         mode="pallas", all_logits=True)
    k, v = init_kv_cache(cfg, 1, 64)
    lg_e, _, _ = forward(pe, cfg, toks, k, v, jnp.int32(0),
                         mode="exact", all_logits=True)
    a, b = np.asarray(lg_p), np.asarray(lg_e)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))


def test_pick_tile_always_divides():
    """Regression: a non-divisor tile makes the grid silently drop the axis
    tail (found driving a dim-768 model: 768 -> tk=512 dropped 256 rows)."""
    from qwen3_tpu.ops.pallas.q8_matmul import _pick_tile
    for n in (256, 320, 512, 768, 1344, 2048, 6144, 151936, 8 * 64 * 7):
        for quantum, cap in ((8 * 64, 512), (128, 1024)):
            t = _pick_tile(n, quantum, cap)
            assert n % t == 0, (n, quantum, cap, t)


def test_q8q8_nondivisible_hidden_dim():
    """Regression for the dropped-tail bug at n=768 (tk fallback)."""
    import numpy as np
    from qwen3_tpu.ops.pallas.q8_matmul import q8_q8_matmul_pallas
    from qwen3_tpu.ops.quant_matmul import q8_matmul_exact
    G, n, d = 64, 768, 256
    rng = np.random.default_rng(0)
    wq = jnp.asarray(rng.integers(-127, 128, (n, d)).astype(np.int8))
    ws = jnp.asarray(rng.random((n // G, d)).astype(np.float32) * 0.01)
    xq = jnp.asarray(rng.integers(-127, 128, (1, n)).astype(np.int8))
    xs = jnp.asarray(rng.random((1, n // G)).astype(np.float32))
    got = np.asarray(q8_q8_matmul_pallas(xq, xs, wq, ws, G, interpret=True))
    want = np.asarray(q8_matmul_exact(xq, xs, wq.T, ws.T, G))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_batch_tiled_kernels_match_untiled(rng):
    """Regression for the serving-batch VMEM blowup: with b=1024 the batch
    axis is split into bt=512 grid tiles (an untiled [b, td] f32 output
    block hit Mosaic's 16 MB scoped-VMEM limit at serving batch 4096 on
    hardware). The tiled grid must produce the same values as small-b."""
    from qwen3_tpu.ops.pallas.q8_matmul import (
        _pick_bt,
        q8_matmul_fused,
        q8_matmul_tiled_fast,
        q8_q8_matmul_tiled,
        repack_tiles,
    )
    from qwen3_tpu.ops.q8 import quantize_act

    assert _pick_bt(4096) == 512
    assert _pick_bt(640) == 128
    assert _pick_bt(8) == 8          # small batches stay untiled

    G, n, d, b = 64, 256, 256, 1024  # b=1024 -> two bt=512 tiles
    wq = rng.integers(-127, 128, size=(n, d)).astype(np.int8)
    ws = (0.01 * (0.5 + rng.random((n // G, d)))).astype(np.float32)
    wqt, wst = repack_tiles(wq, ws, G)
    wd = (wq.astype(np.float32).reshape(n // G, G, d) * ws[:, None, :]
          ).reshape(n, d)
    x = (rng.standard_normal((b, n)) * 0.1).astype(np.float32)

    got = np.asarray(q8_matmul_tiled_fast(
        jnp.asarray(x), jnp.asarray(wqt), jnp.asarray(wst), G,
        interpret=True))[:, :d]
    np.testing.assert_allclose(got, x @ wd, rtol=2e-2, atol=2e-2)

    xq, xs = quantize_act(jnp.asarray(x), G)
    got = np.asarray(q8_q8_matmul_tiled(
        xq, xs, jnp.asarray(wqt), jnp.asarray(wst), G, interpret=True))
    ref = np.asarray(q8_q8_matmul_tiled(
        xq[:8], xs[:8], jnp.asarray(wqt), jnp.asarray(wst), G,
        interpret=True))
    np.testing.assert_allclose(got[:8, :d], ref[:, :d], rtol=0, atol=0)

    inv = (1.0 / np.sqrt((x ** 2).mean(1) + 1e-6)).astype(np.float32)
    nw = rng.standard_normal(n).astype(np.float32)
    h = nw[None, :] * (x * inv[:, None])
    got = np.asarray(q8_matmul_fused(
        jnp.asarray(x), jnp.asarray(wqt), jnp.asarray(wst), G,
        inv=jnp.asarray(inv), nw=jnp.asarray(nw), prologue="norm",
        exact=True, interpret=True))[:, :d]
    # exact=True quantizes h in-kernel (quantize_act semantics) — compare
    # against the exact int8 x int8 kernel on the same quantized input
    hq, hs = quantize_act(jnp.asarray(h), G)
    want = np.asarray(q8_q8_matmul_tiled(
        hq, hs, jnp.asarray(wqt), jnp.asarray(wst), G,
        interpret=True))[:, :d]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_q8i8_kernel_close_to_dequant(rng):
    """int8-MXU kernel (per-tile weight requant + full-K int8 dots,
    VERDICT r3 #7): not bit-exact — the requant rounds weights to the
    tile-max scale — but must stay within the quantization-noise class of
    the dequant reference on well-conditioned weights."""
    from qwen3_tpu.ops.pallas.q8_matmul import (
        q8i8_matmul_tiled,
        q8i8_matmul_stacked,
        repack_tiles,
    )
    from qwen3_tpu.ops.q8 import dequantize

    G, n, d = 64, 512, 256
    wq = rng.integers(-127, 128, size=(n, d)).astype(np.int8)
    ws = (0.01 * (0.5 + rng.random((n // G, d)))).astype(np.float32)
    x = (rng.standard_normal((4, n)) * 0.1).astype(np.float32)

    w_qt, w_st = repack_tiles(wq, ws, G)
    got = np.asarray(q8i8_matmul_tiled(
        jnp.asarray(x), jnp.asarray(w_qt), jnp.asarray(w_st), G,
        interpret=True))
    wf = np.asarray(dequantize(jnp.asarray(wq.T), jnp.asarray(ws.T), G))
    want = x @ wf.T
    # per-tile activation quant + tile-scale weight requant: a few % of the
    # output scale is the expected noise class (scales here vary ~2x)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.05 * scale, (
        np.abs(got - want).max(), scale)

    # stacked variant addresses layer l of [L, ...] identically
    L = 3
    wqs = np.stack([wq] * L)
    wss = np.stack([ws] * L)
    w_qt2, w_st2 = repack_tiles(wqs, wss, G)
    got2 = np.asarray(q8i8_matmul_stacked(
        jnp.asarray(x), jnp.asarray(w_qt2), jnp.asarray(w_st2),
        jnp.int32(1), G, interpret=True))
    np.testing.assert_allclose(got2, got, rtol=1e-6, atol=1e-6)


def test_pallas_int8_forward_runs(tiny_weights, tiny_cfg):
    """mode="pallas-int8" runs the forward end-to-end in interpret mode and
    stays in the quantization-noise class of the pallas-fast logits."""
    cfg = tiny_cfg
    pp = init_params(tiny_weights, mode="pallas")
    toks = jnp.asarray([[1, 2, 3, 4]], jnp.int32)

    k, v = init_kv_cache(cfg, 1, 64)
    lg_i, _, _ = forward(pp, cfg, toks, k, v, jnp.int32(0),
                         mode="pallas-int8", all_logits=True)
    k, v = init_kv_cache(cfg, 1, 64)
    lg_f, _, _ = forward(pp, cfg, toks, k, v, jnp.int32(0),
                         mode="pallas-fast", all_logits=True)
    a, b = np.asarray(lg_i), np.asarray(lg_f)
    assert np.isfinite(a).all()
    denom = np.abs(b).max()
    assert np.abs(a - b).max() < 0.1 * denom, np.abs(a - b).max() / denom
