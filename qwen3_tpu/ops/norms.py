"""RMSNorm (eps hard-coded 1e-6 in the reference engine, src/forward.c:12-28)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from qwen3_tpu.config import RMS_EPS


def rmsnorm(x: jnp.ndarray, w: jnp.ndarray, eps: float = RMS_EPS) -> jnp.ndarray:
    """out = w * x / sqrt(mean(x^2) + eps), computed in fp32 over the last axis."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (w.astype(jnp.float32) * (xf * lax.rsqrt(ms + eps))).astype(x.dtype)


def rms_inv(x: jnp.ndarray, eps: float = RMS_EPS) -> jnp.ndarray:
    """rsqrt(mean(x^2) + eps) per row — rmsnorm's reduction factored out so
    the elementwise remainder (w * (x * inv)) can run inside a fused matmul
    prologue (ops/pallas/q8_matmul._kernel_fused) with identical values."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return lax.rsqrt(ms + eps)
