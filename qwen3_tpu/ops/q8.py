"""Q8_0 activation quantization / dequantization as JAX ops.

Semantics match the reference runtime quantizer (src/q8.c:5-37): symmetric
per-group absmax scale `wmax/127` with a 1e-6 zero-guard, round half away from
zero (C roundf), clamp to [-127, 127].
"""

from __future__ import annotations

import jax.numpy as jnp

Q8_MAX = 127.0


def _round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    # jnp.round is round-half-to-even; the C engine uses roundf (half away).
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def quantize_act(x: jnp.ndarray, group_size: int):
    """Quantize activations along the last axis in groups of `group_size`.

    Returns (q int8 [..., n], s fp32 [..., n // group_size]).
    """
    *lead, n = x.shape
    g = x.astype(jnp.float32).reshape(*lead, n // group_size, group_size)
    wmax = jnp.max(jnp.abs(g), axis=-1)
    s = jnp.where(wmax == 0.0, jnp.float32(1e-6), wmax / Q8_MAX)
    q = _round_half_away(g / s[..., None])
    q = jnp.clip(q, -Q8_MAX, Q8_MAX).astype(jnp.int8)
    return q.reshape(*lead, n), s


def dequantize(q: jnp.ndarray, s: jnp.ndarray, group_size: int,
               dtype=jnp.float32) -> jnp.ndarray:
    """Dequantize int8 values with per-group scales along the last axis."""
    *lead, n = q.shape
    g = q.reshape(*lead, n // group_size, group_size).astype(dtype)
    return (g * s[..., None].astype(dtype)).reshape(*lead, n)
