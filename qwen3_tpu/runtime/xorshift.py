"""xorshift64* RNG, bit-identical to the reference (src/xorshift.c:7-16):

    state ^= state >> 12; state ^= state << 25; state ^= state >> 27
    u32 = (state * 0x2545F4914F6CDD1D) >> 32        (high 32 bits of u64 product)
    float = (u32 >> 8) / 2^24                        (top 24 bits -> [0, 1))

The host implementation is the reproducibility oracle; a device (uint32-pair)
implementation lives in the batched sampler so streams can be sampled fully
on-device without host round-trips.
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1
_MULT = 0x2545F4914F6CDD1D


def xorshift_step(state: int) -> tuple[int, int]:
    """Advance the state; return (new_state, uint32 output)."""
    state &= _M64
    state ^= state >> 12
    state ^= (state << 25) & _M64
    state ^= state >> 27
    out = ((state * _MULT) & _M64) >> 32
    return state, out


def xorshift_float(state: int) -> tuple[int, float]:
    """Advance the state; return (new_state, float32 coin in [0, 1))."""
    state, u32 = xorshift_step(state)
    coin = np.float32(u32 >> 8) / np.float32(16777216.0)
    return state, float(coin)


# -- device implementation ---------------------------------------------------
#
# JAX on TPU has no uint64, so the 64-bit state is carried as two uint32
# halves (hi, lo). Shifts/xors decompose exactly; the multiply needs only the
# *low 64 bits* of state * MULT (the output is bits 32..63 of that product),
# which decomposes into 32x32->64 partial products via 16-bit limbs.

_MULT_HI = (_MULT >> 32) & 0xFFFFFFFF
_MULT_LO = _MULT & 0xFFFFFFFF


def _u32(x):
    import jax.numpy as jnp

    return x.astype(jnp.uint32) if hasattr(x, "astype") else jnp.uint32(x)


def _mulhi_u32(a, b):
    """High 32 bits of a 32x32 unsigned multiply, via 16-bit limbs."""
    import jax.numpy as jnp

    mask = jnp.uint32(0xFFFF)
    a0, a1 = a & mask, a >> 16
    b0, b1 = b & mask, b >> 16
    t = a0 * b0
    u = a1 * b0 + (t >> 16)
    v = a0 * b1 + (u & mask)
    return a1 * b1 + (u >> 16) + (v >> 16)


def xorshift_step_device(hi, lo):
    """One xorshift64* step on (hi, lo) uint32 arrays.

    Returns (new_hi, new_lo, u32_output) — bit-identical to xorshift_step.
    """
    import jax.numpy as jnp

    hi, lo = _u32(hi), _u32(lo)
    # s ^= s >> 12
    new_hi = hi ^ (hi >> 12)
    new_lo = lo ^ ((lo >> 12) | (hi << 20))
    hi, lo = new_hi, new_lo
    # s ^= s << 25
    new_lo = lo ^ (lo << 25)
    new_hi = hi ^ ((hi << 25) | (lo >> 7))
    hi, lo = new_hi, new_lo
    # s ^= s >> 27
    new_hi = hi ^ (hi >> 27)
    new_lo = lo ^ ((lo >> 27) | (hi << 5))
    hi, lo = new_hi, new_lo
    # high 32 bits of the low-64 product (s * MULT):
    #   prod64 = lo*ml + ((lo*mh + hi*ml) << 32)
    #   bits 32..63 = mulhi(lo, ml) + lo*mh + hi*ml   (mod 2^32)
    ml = jnp.uint32(_MULT_LO)
    mh = jnp.uint32(_MULT_HI)
    out = _mulhi_u32(lo, ml) + lo * mh + hi * ml
    return hi, lo, out


def xorshift_coin_device(hi, lo):
    """One step; returns (hi, lo, f32 coin in [0,1)) matching xorshift_float."""
    import jax.numpy as jnp

    hi, lo, out = xorshift_step_device(hi, lo)
    coin = (out >> 8).astype(jnp.float32) / jnp.float32(16777216.0)
    return hi, lo, coin


def seed_to_device(seed: int):
    """Split a 64-bit seed into (hi, lo) uint32 jax scalars."""
    import jax.numpy as jnp

    seed &= _M64
    return jnp.uint32(seed >> 32), jnp.uint32(seed & 0xFFFFFFFF)


class XorshiftRng:
    """Stateful wrapper mirroring the C engine's `Sampler.seed` usage."""

    def __init__(self, seed: int):
        self.state = seed & _M64

    def next_u32(self) -> int:
        self.state, out = xorshift_step(self.state)
        return out

    def next_float(self) -> float:
        self.state, coin = xorshift_float(self.state)
        return coin
