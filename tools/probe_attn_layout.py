"""Microbench: does a head-major KV layout speed up the serving decode's
dense attention dots?

The B=64 ledger shows the two attention einsum+dequant fusions running at
~210 GB/s at every bucket depth (2.87 ms @ 256 rows, 5.75 ms @ 512 — linear
in rows, so not the prefix slicing). Hypothesis: the [B, S, KV, D] cache
interleaves heads, so each (b, kv) score matrix [s, d] has row stride
KV*D = 1 KB — strided reads the fusion can't coalesce. A head-major
[B, KV, S, D] layout gives contiguous per-head slabs.

This probe times ONE layer's worth of the attend chain (dequant + score
einsum + masked softmax + value einsum) on device-synthesized int8 caches
in both layouts, plus a pre-dequantized bf16 variant of each to split
VPU dequant cost from memory layout. lax.scan over ITERS fresh q vectors
amortizes dispatch; timing fetches a slice (block_until_ready does not
sync on the tunneled runtime).

Usage: python tools/probe_attn_layout.py [rows] [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 36  # one 4B model's worth of layers


def main() -> None:
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    H, KV, D = 32, 8, 128  # qwen3-4b heads
    M = H // KV

    key = jax.random.PRNGKey(0)
    kq = jax.random.randint(key, (B, S, KV, D), -127, 128, jnp.int8)
    vq = jax.random.randint(key, (B, S, KV, D), -127, 128, jnp.int8)
    ks = jax.random.uniform(key, (B, S, KV), jnp.float32, 0.01, 0.02)
    vs = jax.random.uniform(key, (B, S, KV), jnp.float32, 0.01, 0.02)
    qs = jax.random.normal(key, (ITERS, B, KV, M, D), jnp.bfloat16)
    pos = jnp.full((B,), S - 1, jnp.int32)
    mask = (jnp.arange(S, dtype=jnp.int32)[None, :]
            <= pos[:, None])[:, None, None, :]

    def softmax(s):
        neg = jnp.finfo(jnp.float32).min
        x = jnp.where(mask, s, neg)
        m = jnp.max(x, axis=-1, keepdims=True)
        p = jnp.exp(x - m) * mask.astype(jnp.float32)
        return p / jnp.sum(p, axis=-1, keepdims=True)

    def attend_rows(qf, kc, vc, kss, vss):
        # the production layout/spec (ops/attention.py: fast path);
        # kss=None -> direct bf16 einsum, no dequant multiply in the graph
        if kss is None:
            kf, vf = kc, vc
        else:
            kf = (kc.astype(jnp.float32) * kss[..., None]).astype(jnp.bfloat16)
            vf = (vc.astype(jnp.float32) * vss[..., None]).astype(jnp.bfloat16)
        sc = jnp.einsum("bkmd,bskd->bkms", qf, kf,
                        preferred_element_type=jnp.float32) / np.sqrt(D)
        p = softmax(sc)
        return jnp.einsum("bkms,bskd->bkmd", p.astype(jnp.bfloat16), vf,
                          preferred_element_type=jnp.float32)

    def attend_heads(qf, kc, vc, kss, vss):
        # head-major: kc/vc [B, KV, S, D], scales [B, KV, S]
        if kss is None:
            kf, vf = kc, vc
        else:
            kf = (kc.astype(jnp.float32) * kss[..., None]).astype(jnp.bfloat16)
            vf = (vc.astype(jnp.float32) * vss[..., None]).astype(jnp.bfloat16)
        sc = jnp.einsum("bkmd,bksd->bkms", qf, kf,
                        preferred_element_type=jnp.float32) / np.sqrt(D)
        p = softmax(sc)
        return jnp.einsum("bkms,bksd->bkmd", p.astype(jnp.bfloat16), vf,
                          preferred_element_type=jnp.float32)

    variants = {
        "rows-int8 [B,S,KV,D]": (attend_rows, kq, vq, ks, vs),
        "heads-int8 [B,KV,S,D]": (attend_heads,
                                  jnp.transpose(kq, (0, 2, 1, 3)),
                                  jnp.transpose(vq, (0, 2, 1, 3)),
                                  jnp.transpose(ks, (0, 2, 1)),
                                  jnp.transpose(vs, (0, 2, 1))),
        "rows-bf16": (lambda q, k, v, a, b_: attend_rows(q, k, v, a, b_),
                      None, None, None, None),  # filled below
        "heads-bf16": (None, None, None, None, None),
    }
    # pre-dequantized bf16 (dequant outside the timed region)
    kb = (kq.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
    vb = (vq.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
    variants["rows-bf16"] = (
        lambda q, k, v, a, b_: attend_rows(q, k, v, a, b_), kb, vb, None, None)
    variants["heads-bf16"] = (
        lambda q, k, v, a, b_: attend_heads(q, k, v, a, b_),
        jnp.transpose(kb, (0, 2, 1, 3)), jnp.transpose(vb, (0, 2, 1, 3)),
        None, None)

    gib = 2 * B * S * KV * D / 2**30  # int8 K+V bytes actually needed

    for name, (fn, kc, vc, kss, vss) in variants.items():
        @jax.jit
        def run(qs, kc=kc, vc=vc, kss=kss, vss=vss, fn=fn):
            def body(acc, qf):
                return acc + fn(qf, kc, vc, kss, vss).sum(), None
            return jax.lax.scan(body, jnp.float32(0.0), qs)[0]

        np.asarray(run(qs))  # compile + warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(qs))
            best = min(best, time.perf_counter() - t0)
        ms = best / ITERS * 1e3
        scale = 1 if name.endswith("int8") or "int8" in name else 2
        print(f"{name:24s} {ms:7.3f} ms/layer-step  "
              f"~{gib * scale / (best / ITERS):6.1f} GiB/s eff", flush=True)


if __name__ == "__main__":
    main()
