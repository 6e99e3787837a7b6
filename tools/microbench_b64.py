"""Microbenchmark: where does the B=64 batched decode step spend time?

Run on the real TPU:  python tools/microbench_b64.py
Every measurement amortizes an on-device fori_loop over N iterations (the
tunnel costs ~30ms per dispatch) and synchronizes via a small host fetch.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from qwen3_tpu.config import PRESETS
from qwen3_tpu.models import init_kv_cache, load_params
from qwen3_tpu.models.qwen3 import _layer_weights, _make_linear, \
    decode_forward_impl
from qwen3_tpu.runtime import kvcache

B, S, CHUNK, N = 64, 512, 32, 64
CKPT = ".cache/qwen3-4b.bin"


def timed(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]  # compile+sync
    t0 = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
    dt = (time.perf_counter() - t0 - 0.030) / N * 1e3  # ~30ms dispatch
    print(f"{name:40s} {dt:8.2f} ms/iter", flush=True)
    return dt


def main():
    cfg, params = load_params(CKPT, mode="pallas", max_seq_len=1024)
    cfg = cfg.with_seq_len(1024)
    print(f"loaded: dim={cfg.dim} hidden={cfg.hidden_dim} L={cfg.n_layers}",
          flush=True)

    kv = init_kv_cache(cfg, B, S + CHUNK, jnp.bfloat16)
    tok = jnp.full((B,), 17, jnp.int32)
    pos = jnp.full((B,), 200, jnp.int32)
    base = pos

    # --- cls matmul + argmax alone
    linear = _make_linear("pallas", cfg.group_size)
    x0 = jnp.ones((B, 1, cfg.dim), jnp.float32) * 0.01

    @jax.jit
    def cls_loop(x):
        def body(i, t):
            xi = x + (t[0] * 0).astype(jnp.float32)
            lg = linear(xi, _layer_weights(params, "pallas", "cls"))
            return jnp.argmax(lg[:, 0, :cfg.vocab_size], -1).astype(jnp.int32)
        return jax.lax.fori_loop(0, N, body, tok)

    timed("cls matmul + argmax", cls_loop, x0)

    # --- one full decode step (side mode), with / without attention
    def step_loop(mode, attn):
        @jax.jit
        def run(tok, kv0, kv1):
            sk = kvcache.make_side(kv0, CHUNK)
            sv = kvcache.make_side(kv1, CHUNK)

            def body(i, carry):
                t, sk, sv = carry
                logits, sk, sv = decode_forward_impl(
                    params, cfg, t, kv0, kv1, pos + (i % CHUNK), mode=mode,
                    attn=attn, side=(sk, sv, base, i % CHUNK))
                return (jnp.argmax(logits, -1).astype(jnp.int32), sk, sv)

            return jax.lax.fori_loop(0, N, body, (tok, sk, sv))[0]
        return run

    timed("decode step pallas attn=dense", step_loop("pallas", "dense"),
          tok, kv[0], kv[1])
    timed("decode step pallas attn=none", step_loop("pallas", "none"),
          tok, kv[0], kv[1])


if __name__ == "__main__":
    main()
