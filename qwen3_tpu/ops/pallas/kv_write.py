"""In-place per-slot KV-cache row writes for continuous-batching decode.

Each decode step must write every slot's new K/V row at that slot's *own*
position (the TPU analog of the reference writing K/V into cache slices in
place, src/forward.c:247-262 — but with per-stream positions). The two XLA
spellings are both bad on TPU:

- a multi-index scatter (`.at[l, arange(B), positions].set`) falls off
  XLA:TPU's fast path for narrow dtypes (measured 6.6x slower decode steps
  with a bf16 cache at B=8);
- B unrolled `dynamic_update_slice`s stay on the fast path but serialize:
  at B=64 that is 64 x 2 x n_layers tiny sequential ops per decode step,
  which capped 4B continuous batching at ~860 tok/s aggregate.

This kernel does all B row writes in ONE launch. The layer index and the
per-slot positions are scalar-prefetched, the grid runs over slots, and grid
step b addresses output block (layer, b, positions[b]) of the cache buffer —
aliased in/out, so unvisited blocks keep their data (same pattern as
jax.experimental.pallas.ops.tpu.megablox.gmm's existing_out) and nothing
else is copied.

CAVEAT (measured): inside a `lax.scan` body whose carry holds the cache —
the serving decode loop's structure — XLA double-buffers the carry around
the custom call and copies the whole multi-GB cache every layer, making
this 8x SLOWER than B unrolled dynamic_update_slices (which XLA's in-place
while-loop pass understands). Use this kernel only where the cache is not
a scan/while carry; the decode path instead stages chunk KV in a side
buffer written at a uniform step index (runtime/batched.py).

Blocks keep the cache's rank-5 layout: the trailing (KV, D) block equals
those full array dimensions (Mosaic's escape hatch from the 8x128
divisibility rule), so the position axis can be addressed one row at a
time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(lay_ref, pos_ref, cache_in_ref, rows_ref, cache_ref):
    del lay_ref, pos_ref, cache_in_ref  # addressing happens in the BlockSpecs
    cache_ref[...] = rows_ref[...].astype(cache_ref.dtype).reshape(
        cache_ref.shape)


def kv_write_rows(cache: jnp.ndarray, rows: jnp.ndarray, layer: jnp.ndarray,
                  positions: jnp.ndarray, interpret: bool = False
                  ) -> jnp.ndarray:
    """Write rows[b] into cache[layer, b, positions[b]] for all b at once.

    cache [L, B, S, KV, D] (float32/bfloat16); rows [B, KV, D] float;
    layer i32 scalar; positions [B] i32 (caller clamps into [0, S)).
    Returns the updated cache (same buffer via input/output aliasing).

    NOT wrapped in its own jax.jit: a nested jit boundary without donation
    breaks the operand-output aliasing of the underlying custom call, and
    XLA then copies the whole multi-GB cache on every invocation (measured
    8x slower than even the unrolled writes). Call it from inside an outer
    jitted function that donates the cache.
    """
    L, B, S, KV, D = cache.shape

    cache_spec = pl.BlockSpec(
        (1, 1, 1, KV, D), lambda b, lay, pos: (lay[0], b, pos[b], 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                cache_spec,
                pl.BlockSpec((1, KV, D), lambda b, lay, pos: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=cache_spec,
        ),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        # 2 scalar-prefetch leaves + cache at flat index 2 -> output 0
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(layer, jnp.int32), (1,)),
      positions.astype(jnp.int32), cache, rows)
    return out
