"""NumPy oracle: a literal fp32 reimplementation of the reference C engine's
forward pass semantics (src/forward.c, src/q8.c), token-at-a-time.

Used as ground truth for the JAX forward pass on tiny synthetic models. This
is written from the behavioral spec in SURVEY.md (not translated code) and is
deliberately simple/slow.
"""

from __future__ import annotations

import numpy as np

from qwen3_tpu.io.checkpoint import Q8Weights

F32 = np.float32


def rmsnorm(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    sos = F32((x.astype(F32) ** 2).mean() + F32(1e-6))
    return (w * (x / np.sqrt(sos))).astype(F32)


def softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp((x - x.max()).astype(F32))
    return (e / e.sum()).astype(F32)


def quantize(x: np.ndarray, gs: int):
    g = x.astype(F32).reshape(-1, gs)
    wmax = np.abs(g).max(axis=1)
    s = np.where(wmax == 0.0, F32(1e-6), wmax / F32(127.0)).astype(F32)
    q = g / s[:, None]
    q = np.sign(q) * np.floor(np.abs(q) + 0.5)
    return np.clip(q, -127, 127).astype(np.int8).reshape(x.shape), s


def matmul(xq: np.ndarray, xs: np.ndarray, wq: np.ndarray, ws: np.ndarray,
           gs: int) -> np.ndarray:
    """out[d] = sum_k int32dot(x_g, w_g) * ws[d,k] * xs[k]"""
    d, n = wq.shape
    k = n // gs
    dots = np.einsum(
        "kg,dkg->dk",
        xq.reshape(k, gs).astype(np.int32),
        wq.reshape(d, k, gs).astype(np.int32),
    )
    return (dots.astype(F32) * ws.reshape(d, k) * xs[None, :]).sum(
        axis=1, dtype=F32
    )


def rotary(x: np.ndarray, pos: int) -> np.ndarray:
    half = x.shape[-1] // 2
    i = np.arange(half, dtype=F32)
    angle = F32(pos) * np.power(F32(1e6), -i / F32(half), dtype=F32)
    c, s = np.cos(angle, dtype=F32), np.sin(angle, dtype=F32)
    re, im = x[:half], x[half:]
    return np.concatenate([re * c - im * s, re * s + im * c]).astype(F32)


class OracleState:
    def __init__(self, w: Q8Weights, seq_len: int):
        cfg = w.config
        self.k_cache = np.zeros(
            (cfg.n_layers, seq_len, cfg.n_kv_heads, cfg.head_dim), F32)
        self.v_cache = np.zeros_like(self.k_cache)


def forward(w: Q8Weights, st: OracleState, token: int, pos: int) -> np.ndarray:
    cfg = w.config
    gs, hd = cfg.group_size, cfg.head_dim
    H, KV = cfg.n_heads, cfg.n_kv_heads
    kv_mul = H // KV

    # embedding row, dequantized (the reference's fp32 table)
    x = (w.emb_q[token].astype(F32).reshape(-1, gs)
         * w.emb_s[token][:, None]).reshape(-1)

    for l in range(cfg.n_layers):
        xb = rmsnorm(x, w.att_norm[l])
        xq, xs = quantize(xb, gs)
        q = matmul(xq, xs, w.wq_q[l], w.wq_s[l], gs).reshape(H, hd)
        k = matmul(xq, xs, w.wk_q[l], w.wk_s[l], gs).reshape(KV, hd)
        v = matmul(xq, xs, w.wv_q[l], w.wv_s[l], gs).reshape(KV, hd)

        for h in range(H):
            q[h] = rotary(rmsnorm(q[h], w.q_norm[l]), pos)
        for h in range(KV):
            k[h] = rotary(rmsnorm(k[h], w.k_norm[l]), pos)

        st.k_cache[l, pos] = k
        st.v_cache[l, pos] = v

        att_out = np.zeros((H, hd), F32)
        for h in range(H):
            keys = st.k_cache[l, : pos + 1, h // kv_mul]      # [pos+1, hd]
            vals = st.v_cache[l, : pos + 1, h // kv_mul]
            scores = (keys @ q[h]) / np.sqrt(F32(hd))
            probs = softmax(scores.astype(F32))
            att_out[h] = probs @ vals

        xq, xs = quantize(att_out.reshape(-1), gs)
        x = x + matmul(xq, xs, w.wo_q[l], w.wo_s[l], gs)

        xb = rmsnorm(x, w.ffn_norm[l])
        xq, xs = quantize(xb, gs)
        gate = matmul(xq, xs, w.w1_q[l], w.w1_s[l], gs)
        up = matmul(xq, xs, w.w3_q[l], w.w3_s[l], gs)
        act = (gate / (1.0 + np.exp(-gate, dtype=F32)) * up).astype(F32)
        hq, hs = quantize(act, gs)
        x = x + matmul(hq, hs, w.w2_q[l], w.w2_s[l], gs)

    x = rmsnorm(x, w.out_norm)
    xq, xs = quantize(x, gs)
    return matmul(xq, xs, w.cls_q, w.cls_s, gs)
