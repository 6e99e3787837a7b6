"""Rotary position embeddings, NeoX half-split style with theta 1e6.

The reference computes `angle = pos * 1e6^(-i/half_dim)` per token per head
with no cache (src/forward.c:104-118, TODO at :103). On TPU we precompute
cos/sin tables once and gather rows by position — same math, no transcendental
recompute in the hot loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from qwen3_tpu.config import ROPE_THETA


def rope_tables(head_dim: int, max_pos: int,
                theta: float = ROPE_THETA) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (cos, sin) tables of shape [max_pos, head_dim // 2], fp32."""
    import numpy as np

    # Compute in float64 on host for accuracy at large positions (the
    # reference recomputes powf/cosf in fp32 each step and carries ~1e-4
    # error there; f64 tables are strictly more accurate).
    half = head_dim // 2
    i = np.arange(half, dtype=np.float64)
    freqs = np.power(float(theta), -i / half)
    angles = np.arange(max_pos, dtype=np.float64)[:, None] * freqs[None, :]
    return (jnp.asarray(np.cos(angles), dtype=jnp.float32),
            jnp.asarray(np.sin(angles), dtype=jnp.float32))


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate the last axis of `x` (head_dim, split in halves).

    `cos`/`sin` must broadcast against x[..., :head_dim//2] — e.g. shape
    [half] for a single position or [T, 1, half] against [T, n_heads, half].
    """
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    out1 = x1 * cos - x2 * sin
    out2 = x1 * sin + x2 * cos
    return jnp.concatenate([out1, out2], axis=-1)
