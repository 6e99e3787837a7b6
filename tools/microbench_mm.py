"""Sweep the tiled Q8 matmul kernel across batch sizes / block_k to find
why b=64 runs at ~6 GB/s (vs ~500+ GB/s at b=1)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from qwen3_tpu.models import load_params
from qwen3_tpu.ops.pallas.q8_matmul import q8_q8_matmul_tiled
from qwen3_tpu.ops.q8 import quantize_act

N = 256
CKPT = ".cache/qwen3-4b.bin"


def main():
    cfg, params = load_params(CKPT, mode="pallas", max_seq_len=64)
    w_qt, w_st = params["w13_q"][0], params["w13_s"][0]
    gb = (w_qt.size + 4 * w_st.size) / 1e9

    def loop(b, block_k):
        x = jnp.ones((b, cfg.dim), jnp.float32) * 0.01

        @jax.jit
        def run(x):
            def body(i, acc):
                xi = x + acc[:, :1] * 0
                xq, xs = quantize_act(xi, cfg.group_size)
                return q8_q8_matmul_tiled(xq, xs, w_qt, w_st,
                                          cfg.group_size, block_k=block_k)
            return jax.lax.fori_loop(0, N, body, jnp.zeros(
                (b, w_qt.shape[0] * w_qt.shape[2]), jnp.float32))

        out = run(x)
        _ = np.asarray(out[:1, :4])
        t0 = time.perf_counter()
        out = run(x)
        _ = np.asarray(out[:1, :4])
        dt = (time.perf_counter() - t0) / N * 1e3
        print(f"b={b:4d} block_k={block_k:5d}: {dt:8.2f} ms/iter "
              f"({gb/dt*1e3:6.0f} GB/s)", flush=True)

    for b in (1, 8, 64):
        loop(b, 512)
    loop(64, 2560)


if __name__ == "__main__":
    main()
