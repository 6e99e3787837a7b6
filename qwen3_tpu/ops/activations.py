"""SwiGLU: silu(w1x) * w3x (src/forward.c:122-139 — math must be preserved)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swiglu(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """silu(gate) * up, computed in fp32."""
    g = gate.astype(jnp.float32)
    return (g * jax.nn.sigmoid(g) * up.astype(jnp.float32)).astype(gate.dtype)
