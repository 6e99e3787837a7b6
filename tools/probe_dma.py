"""Probe the stacked Q8 kernel's HBM streaming rate against a pure-read
kernel on the same tensors (VERDICT r3 #6).

The single-stream decode ledger puts the kernels at ~734 GB/s effective
(weights bytes / kernel time). This probe separates "what the DMA pattern
can stream" from "what the kernel achieves": a kernel with identical grid
and BlockSpecs whose body only accumulates a trivially cheap reduction of
the weight tile (no MXU, no scales) measures the pipeline's pure read
rate on the exact same [L, J, n, td] arrays.

    python tools/probe_dma.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen3_tpu.config import PRESETS
from qwen3_tpu.io.device_synth import synth_device_params
from qwen3_tpu.ops.pallas.q8_matmul import q8_q8_matmul_stacked, _pick_tile
from qwen3_tpu.ops.q8 import quantize_act

CACHE = Path(__file__).resolve().parent.parent / ".cache"
N_ITERS = 64


def pure_read_stacked(w_qt, layer, block_k=512):
    """Same grid/BlockSpec walk as _kernel_q8q8_stacked, body = tile sum."""
    L, j, n, td = w_qt.shape
    tk = _pick_tile(n, 512, block_k)

    def kern(l_ref, wq_ref, out_ref):
        k = pl.program_id(1)
        jj = pl.program_id(0)

        @pl.when((k == 0) & (jj == 0))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # cheapest op that forces the read: int8 -> i32 sum of 8 rows
        out_ref[:] += jnp.sum(
            wq_ref[0, 0, :8, :].astype(jnp.int32), axis=0, keepdims=True)

    lidx = jnp.reshape(layer, (1,)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(j, n // tk),
        in_specs=[pl.BlockSpec((1, 1, tk, td),
                               lambda jj, k, lr: (lr[0], jj, k, 0))],
        out_specs=pl.BlockSpec((8, td), lambda jj, k, lr: (0, 0)),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        out_shape=jax.ShapeDtypeStruct((8, td), jnp.int32),
    )(lidx, w_qt)


def pure_read_manual(w_qt, layer, n_buf: int, block_k=512):
    """Manual n_buf-deep DMA pipeline over the same per-layer tiles
    (VERDICT r4 #7: is the last ~10% to the HBM roofline recoverable with
    a deeper pipeline than Pallas's automatic double buffering?). The body
    streams every [tk, td] chunk of layer `layer` through a rotating
    n_buf-slot VMEM scratch with explicit async copies; compute is the
    same trivial 8-row sum as pure_read_stacked."""
    L, j, n, td = w_qt.shape
    tk = _pick_tile(n, 512, block_k)
    nk = n // tk
    n_chunks = j * nk

    def kern(l_ref, w_hbm, out_ref):
        l = l_ref[0]

        def body(scratch, sems):
            def dma(slot, idx):
                jj = idx // nk
                kk = idx % nk
                return pltpu.make_async_copy(
                    w_hbm.at[l, jj, pl.ds(kk * tk, tk), :],
                    scratch.at[slot],
                    sems.at[slot],
                )

            def start(slot, idx):
                dma(slot, idx).start()

            for i in range(n_buf):
                start(i, i)

            def loop(idx, acc):
                slot = idx % n_buf
                dma(slot, idx).wait()
                acc = acc + jnp.sum(
                    scratch[slot, :8, :].astype(jnp.int32), axis=0,
                    keepdims=True)

                @pl.when(idx + n_buf < n_chunks)
                def _():
                    start(slot, idx + n_buf)

                return acc

            out_ref[:] = jax.lax.fori_loop(
                0, n_chunks, loop, jnp.zeros((8, td), jnp.int32))

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((n_buf, tk, td), jnp.int8),
            sems=pltpu.SemaphoreType.DMA((n_buf,)),
        )

    lidx = jnp.reshape(layer, (1,)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, td), lambda i, lr: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, td), jnp.int32),
    )(lidx, w_qt)


def main() -> int:
    cfg = PRESETS["qwen3-4b"].with_seq_len(512)
    params = synth_device_params(cfg, 512, seed=0,
                                 exec_cache=str(CACHE / "exec"))
    name = "w13"   # the biggest per-layer tensor: [L, J, 2560, 1024]
    w_qt, w_st = params[name + "_q"], params[name + "_s"]
    L = w_qt.shape[0]
    nbytes = w_qt.nbytes // L
    print(f"{name}_q per-layer bytes: {nbytes/1e6:.1f} MB", flush=True)

    x = jnp.full((1, w_qt.shape[2]), 0.01, jnp.float32)
    xq, xs = quantize_act(x, cfg.group_size)

    @jax.jit
    def mm_loop(xq, xs, w_qt, w_st):
        def body(i, acc):
            out = q8_q8_matmul_stacked(xq, xs, w_qt, w_st,
                                       i % L, cfg.group_size)
            return acc + out[0, :8]
        return jax.lax.fori_loop(0, N_ITERS, body, jnp.zeros((8,), jnp.float32))

    @jax.jit
    def read_loop(w_qt):
        def body(i, acc):
            out = pure_read_stacked(w_qt, i % L)
            return acc + out[0, :8]
        return jax.lax.fori_loop(0, N_ITERS, body, jnp.zeros((8,), jnp.int32))

    def mk_manual(n_buf):
        @jax.jit
        def manual_loop(w_qt):
            def body(i, acc):
                out = pure_read_manual(w_qt, i % L, n_buf)
                return acc + out[0, :8]
            return jax.lax.fori_loop(0, N_ITERS, body,
                                     jnp.zeros((8,), jnp.int32))
        return manual_loop

    for label, fn, args in (("q8q8 stacked matmul", mm_loop,
                             (xq, xs, w_qt, w_st)),
                            ("pure-read same walk", read_loop, (w_qt,)),
                            ("manual DMA 2-buffer", mk_manual(2), (w_qt,)),
                            ("manual DMA 3-buffer", mk_manual(3), (w_qt,)),
                            ("manual DMA 4-buffer", mk_manual(4), (w_qt,))):
        out = fn(*args)
        _ = np.asarray(out)           # compile + warm
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / N_ITERS
        print(f"{label:24s} {dt*1e3:7.3f} ms/layer  "
              f"{nbytes/dt/1e9:6.1f} GB/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
