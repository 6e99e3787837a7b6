"""Quantized matmuls over Q8_0 weights.

Two paths:

- `q8_matmul_exact`: bit-exact reproduction of the reference kernel's integer
  math (src/forward.c:79-101): int8 x int8 dot products accumulated in int32
  per quantization group, each group dequantized by `w_scale * x_scale` and
  summed in fp32. Used for parity/oracle validation and exact-mode inference.

- `q8_matmul_bf16`: weight-only-quantized fast path — weights dequantized to
  bf16 (values identical to the reference's dequantized weights), activations
  kept in higher precision (no activation quantization, slightly *better*
  quality than the reference), MXU bf16 matmul with fp32 accumulation.

The production Pallas kernel (ops/pallas/...) replaces the bf16 path by
reading int8 weights directly from HBM and fusing dequantization into the
matmul tiles, halving weight bandwidth.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def q8_matmul_exact(x_q: jnp.ndarray, x_s: jnp.ndarray,
                    w_q: jnp.ndarray, w_s: jnp.ndarray,
                    group_size: int) -> jnp.ndarray:
    """out[..., d] = sum_k int32dot(x_q[..., k], w_q[d, k]) * w_s[d, k] * x_s[..., k]

    x_q: int8 [..., n]; x_s: fp32 [..., n/G]
    w_q: int8 [d, n];   w_s: fp32 [d, n/G]
    """
    *lead, n = x_q.shape
    d = w_q.shape[0]
    k = n // group_size
    xg = x_q.reshape(*lead, k, group_size)
    wg = w_q.reshape(d, k, group_size)
    # Exact int32 group dots on the MXU int8 path:
    # dots[..., d, k] = sum_g xg[..., k, g] * wg[d, k, g]
    dots = lax.dot_general(
        xg, wg,
        dimension_numbers=(((xg.ndim - 1,), (2,)), ((xg.ndim - 2,), (1,))),
        preferred_element_type=jnp.int32,
    )  # [k, ..., d]
    # move contracted-batch axis (k) to the end: [..., d, k]
    dots = jnp.moveaxis(dots, 0, -1)
    scaled = dots.astype(jnp.float32) * w_s * x_s[..., None, :]
    return jnp.sum(scaled, axis=-1)


def dequant_weights_bf16(w_q: jnp.ndarray, w_s: jnp.ndarray,
                         group_size: int) -> jnp.ndarray:
    """One-time host/device conversion of Q8_0 weights to bf16 [n, d] layout
    (transposed so matmuls contract the leading axis without a transpose)."""
    d, n = w_q.shape[-2], w_q.shape[-1]
    g = w_q.reshape(*w_q.shape[:-1], n // group_size, group_size).astype(jnp.float32)
    w = (g * w_s[..., None]).reshape(*w_q.shape[:-2], d, n)
    return jnp.swapaxes(w, -1, -2).astype(jnp.bfloat16)


def q8_matmul_bf16(x: jnp.ndarray, w_t: jnp.ndarray) -> jnp.ndarray:
    """x [..., n] @ w_t [n, d] -> fp32 [..., d] (bf16 MXU, fp32 accumulate)."""
    return lax.dot_general(
        x.astype(jnp.bfloat16), w_t,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
