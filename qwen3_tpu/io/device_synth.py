"""Device-side synthetic parameter generation.

The benchmark checkpoints are synthetic (random Q8_0 weights with real
architecture shapes — tokens/s does not depend on weight values, see
io/synthetic.py). Host->device transfer through the tunneled TPU runtime
runs at ~10-45 MB/s, so shipping a multi-GB random checkpoint to the chip
dominates a cold benchmark process (4.7 GB ≈ 2-8 min). This module instead
generates the packed parameter pytree *on device* with `jax.random` —
identical shapes, dtypes, and memory layout to `models.load_params`'s pallas
pack (verified against the pack cache by tests/test_formats.py), so kernel
timings are the same while cold-start transfer drops to zero.

Only the benchmark uses this path; real inference always loads checkpoint
bytes (models/qwen3.py load_params).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from qwen3_tpu.config import ModelConfig
from qwen3_tpu.ops.rope import rope_tables


def packed_shapes(cfg: ModelConfig) -> dict[str, tuple[tuple[int, ...], str]]:
    """Shapes/dtypes of the `models.load_params(mode='pallas')` params pytree
    (minus rope tables), derived analytically: mirrors
    ops.pallas.q8_matmul.repack_tiles' tiling/padding and the fused
    wqkv / w13 concatenation in models.qwen3._host_params."""
    from qwen3_tpu.ops.pallas.q8_matmul import _pick_tile

    L, D, G = cfg.n_layers, cfg.dim, cfg.group_size
    HD = cfg.head_dim

    def tiled(n: int, out: int, lead: tuple[int, ...] = ()):
        td = _pick_tile(out, 128, 1024)
        if td < 512 and out > 1024:           # repack_tiles' pad rule
            out = -(-out // 1024) * 1024
            td = 1024
        j = out // td
        return (
            (lead + (j, n, td), "int8"),
            (lead + (j, n // G, td), "float32"),
        )

    s: dict[str, tuple[tuple[int, ...], str]] = {
        "att_norm": ((L, D), "float32"),
        "ffn_norm": ((L, D), "float32"),
        "out_norm": ((D,), "float32"),
        "q_norm": ((L, HD), "float32"),
        "k_norm": ((L, HD), "float32"),
        "emb_q": ((cfg.vocab_size, D), "int8"),
        "emb_s": ((cfg.vocab_size, D // G), "float32"),
    }
    s["wqkv_q"], s["wqkv_s"] = tiled(D, cfg.proj_dim + 2 * cfg.kv_dim, (L,))
    s["w13_q"], s["w13_s"] = tiled(D, 2 * cfg.hidden_dim, (L,))
    s["wo_q"], s["wo_s"] = tiled(cfg.proj_dim, D, (L,))
    s["w2_q"], s["w2_s"] = tiled(cfg.hidden_dim, D, (L,))
    s["cls_q"], s["cls_s"] = tiled(D, cfg.vocab_size)
    return s


def synth_device_params(cfg: ModelConfig, max_seq_len: int, *, seed: int = 0,
                        scale: float = 0.02,
                        exec_cache: str | None = None) -> dict:
    """Generate the pallas-mode params pytree on device, one jitted program
    for all leaves. Magnitudes match io.synthetic.synthetic_weights (norms
    ~1, projection scales ~scale/127) so decode stays numerically tame.
    `exec_cache`: directory for the cross-process compiled-executable cache
    (utils/aotcache.py) — bench cold-start path."""
    shapes = packed_shapes(cfg)

    @jax.jit
    def gen(key):
        leaves = {}
        for name in sorted(shapes):
            shape, dt = shapes[name]
            key, sub = jax.random.split(key)
            if dt == "int8":
                v = jax.random.randint(sub, shape, -127, 128, jnp.int8)
            elif name.endswith("_s"):
                v = (scale / 127.0) * (
                    0.5 + jax.random.uniform(sub, shape, jnp.float32))
            else:  # norm weights
                v = 1.0 + 0.1 * jax.random.normal(sub, shape, jnp.float32)
            leaves[name] = v
        return leaves

    key0 = jax.random.PRNGKey(seed)
    if exec_cache is not None:
        from qwen3_tpu.utils.aotcache import aot_cached

        fn = aot_cached(gen.lower(key0), exec_cache, "synth")
    else:
        fn = gen
    p = dict(fn(key0))
    cos, sin = rope_tables(cfg.head_dim, max_seq_len)
    p["rope_cos"] = jnp.asarray(cos)
    p["rope_sin"] = jnp.asarray(sin)
    return p
