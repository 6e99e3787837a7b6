"""Qwen3 forward pass, TPU-native.

Architecture semantics follow the reference engine (src/forward.c:225-350):
per layer: att-RMSNorm -> Q/K/V quantized matmuls -> per-head QK-RMSNorm then
RoPE (theta 1e6, half-split) -> GQA attention over the KV cache -> output
projection + residual -> FFN-RMSNorm -> w1/w3 -> SwiGLU -> w2 + residual;
finally out-RMSNorm and the (possibly tied) classifier matmul.

Design differences from the reference (TPU-first, not a port):
- one traced program handles a [B, T] token block — the same function serves
  batched prefill (T>1) and decode (T=1), where the reference runs a scalar
  token-at-a-time loop for both (src/completion.c:57-80);
- layers run under `lax.scan` over weights stacked [L, ...], so compile time
  and program size are O(1) in depth;
- RoPE cos/sin are precomputed tables gathered by position;
- logits are computed for the last position only unless `all_logits` is set
  (the reference computes the full vocab matmul for every prompt token).

Quantization modes:
- "exact": reproduces the reference integer math (activation Q8 quantization
  + int8xint8 group dots, fp32 accumulation; see ops/quant_matmul.py).
- "bf16": weight-only quantization — weights dequantized once to bf16,
  activations unquantized (slightly better quality than the reference).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from qwen3_tpu.config import ModelConfig
from qwen3_tpu.io.checkpoint import Q8Weights, load_checkpoint
from qwen3_tpu.ops.attention import (
    fused_batched_attention,
    gqa_attention,
    gqa_attention_per_slot,
    gqa_attention_two_segment,
)
from qwen3_tpu.ops.activations import swiglu
from qwen3_tpu.ops.norms import rms_inv, rmsnorm
from qwen3_tpu.ops.q8 import dequantize, quantize_act
from qwen3_tpu.ops.quant_matmul import (
    dequant_weights_bf16,
    q8_matmul_bf16,
    q8_matmul_exact,
)
from qwen3_tpu.ops.rope import rope_tables

Params = dict[str, Any]

_LAYER_MATS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")
_LAYER_MATS_FUSED = ("wqkv", "wo", "w13", "w2")  # pallas mode


def _mat_names(mode: str):
    return _LAYER_MATS_FUSED if mode.startswith("pallas") else _LAYER_MATS


def _dequant_bf16_host(q, s, group_size: int):
    """Host-side Q8_0 -> bf16 [.., in, out] conversion, one layer at a time to
    bound transient fp32 memory (device conversion of a 4B model would blow
    past HBM during load)."""
    import ml_dtypes
    import numpy as np

    def one(qi, si):
        d, n = qi.shape
        w = (qi.astype(np.float32).reshape(d, n // group_size, group_size)
             * si[..., None]).reshape(d, n)
        return np.ascontiguousarray(w.T).astype(ml_dtypes.bfloat16)

    if q.ndim == 2:
        return one(q, s)
    return np.stack([one(q[i], s[i]) for i in range(q.shape[0])])


def _transpose_stacked(a):
    """[..., out, in] -> contiguous [..., in, out] on host.

    Multi-GB checkpoint transposes via torch's multithreaded contiguous()
    (numpy's strided copy is single-threaded: ~40 min for a 4B model)."""
    import numpy as np

    try:
        import torch
    except ImportError:
        import sys

        print("[Params] torch unavailable — falling back to numpy's "
              "single-threaded transpose (minutes-slow for multi-GB "
              "checkpoints)", file=sys.stderr)
        return np.ascontiguousarray(np.swapaxes(a, -1, -2))
    import warnings

    with warnings.catch_warnings():
        # torch warns on read-only numpy (memmap) inputs; we only read
        warnings.simplefilter("ignore", UserWarning)
        t = torch.from_numpy(np.asarray(a))
    return t.transpose(-1, -2).contiguous().numpy()


def _host_params(w: Q8Weights, mode: str) -> dict:
    """Host (numpy) parameter dict for `mode` — everything in the device
    params pytree except the rope tables (which depend on max_seq_len).

    Embeddings and (in exact mode) all projections stay int8.
    """
    cfg = w.config
    p = {
        "att_norm": w.att_norm,
        "ffn_norm": w.ffn_norm,
        "out_norm": w.out_norm,
        "q_norm": w.q_norm,
        "k_norm": w.k_norm,
        "emb_q": w.emb_q,
        "emb_s": w.emb_s,
    }
    if mode == "exact":
        for name in _LAYER_MATS:
            p[name + "_q"] = getattr(w, name + "_q")
            p[name + "_s"] = getattr(w, name + "_s")
        p["cls_q"] = w.cls_q
        p["cls_s"] = w.cls_s
    elif mode == "bf16":
        g = cfg.group_size
        for name in _LAYER_MATS:
            p[name + "_t"] = _dequant_bf16_host(
                getattr(w, name + "_q"), getattr(w, name + "_s"), g)
        p["cls_t"] = _dequant_bf16_host(w.cls_q, w.cls_s, g)
    elif mode.startswith("pallas"):
        # int8 weights transposed to [in, out], then repacked into contiguous
        # [J, in, td] d-tiles so each kernel grid block is ONE contiguous HBM
        # DMA (the flat layout gives the vocab matmul only 128B per row)
        from qwen3_tpu.ops.pallas.q8_matmul import repack_tiles

        def pack(q, s):
            # repack_tiles handles arbitrary leading (layer-stack) dims in
            # one vectorized pass
            return repack_tiles(_transpose_stacked(q), _transpose_stacked(s),
                                cfg.group_size)

        import numpy as _np

        # fuse QKV and W1/W3 along the output axis: one kernel launch where
        # the reference runs three matvecs (src/forward.c:260-262) / two
        # (src/forward.c:311-314); outputs are split by static slice
        fused = {
            "wqkv": ("wq", "wk", "wv"),
            "w13": ("w1", "w3"),
        }
        for out_name, parts in fused.items():
            q = _np.concatenate([getattr(w, n + "_q") for n in parts],
                                axis=-2)
            s = _np.concatenate([getattr(w, n + "_s") for n in parts],
                                axis=-2)
            p[out_name + "_q"], p[out_name + "_s"] = pack(q, s)
        for name in ("wo", "w2"):
            p[name + "_q"], p[name + "_s"] = pack(
                getattr(w, name + "_q"), getattr(w, name + "_s"))
        p["cls_q"], p["cls_s"] = pack(w.cls_q, w.cls_s)
    else:
        raise ValueError(f"unknown mode: {mode}")
    return p


def _to_device(host: dict, head_dim: int, max_seq_len: int) -> Params:
    cos, sin = rope_tables(head_dim, max_seq_len)
    p: Params = {k: jnp.asarray(v) for k, v in host.items()}
    p["rope_cos"] = cos
    p["rope_sin"] = sin
    return p


def init_params(w: Q8Weights, mode: str = "bf16",
                max_seq_len: int | None = None) -> Params:
    """Build the device parameter pytree from host Q8 weights."""
    if max_seq_len is None:
        max_seq_len = w.config.seq_len
    return _to_device(_host_params(w, mode), w.config.head_dim, max_seq_len)


def materialize_params(params) -> None:
    """Force every parameter leaf onto the device NOW.

    On the tunneled runtime, `jnp.asarray` of host (mmap) arrays defers the
    actual host->device upload until first use — so the first dispatch of a
    serving program against a freshly loaded multi-GB checkpoint silently
    pays the whole transfer (~28 MB/s through the tunnel: ~5 min for the
    8B pack, measured round 4), which misattributes load cost to decode.
    Engines call this at init so `engine ready` carries the transfer (the
    analog of the reference faulting its mmap pages on the first forward,
    src/model.c:19-48). Fetching one element per leaf is the reliable sync
    on this runtime (block_until_ready does not synchronize here)."""
    import numpy as np

    for leaf in jax.tree.leaves(params):
        np.asarray(jax.device_get(leaf.ravel()[:1]))


_PACK_VERSION = 1


def load_params(path: str, mode: str = "bf16",
                max_seq_len: int | None = None,
                cache: bool = True, tp: int = 1, mesh=None) -> tuple:
    """Load checkpoint -> device params, with a packed-tensor disk cache.

    The host-side prep for bf16 (dequant + transpose) and pallas (transpose +
    tile repack) modes is a large single-threaded strided copy — minutes for a
    4B checkpoint on a 1-core host. The prepped numpy arrays are a pure
    function of the checkpoint bytes, so they are written once to
    `<path>.pack/<mode>/` and later loads mmap them straight into the device
    transfer (no body parse, no repack). Returns (ModelConfig, Params).

    `tp` > 1 packs the fused pallas layout shard-aware for tensor-parallel
    execution (parallel/tp.py; leading [tp, ...] axis on projection leaves,
    cached under `<path>.pack/pallas-tp{tp}/`). `mesh` places every leaf
    with its NamedSharding during the device transfer (required when tp>1;
    also usable with tp=1 to replicate onto a dp mesh).
    """
    import json
    import os
    from pathlib import Path as _Path

    from qwen3_tpu.io.checkpoint import read_header

    cfg = read_header(path)
    if max_seq_len is None:
        max_seq_len = cfg.seq_len
    if tp > 1 and not mode.startswith("pallas"):
        raise ValueError(
            "tp>1 requires a pallas mode (exact/bf16 shard via "
            "parallel.sharding GSPMD specs instead)")
    if tp > 1 and mesh is None:
        raise ValueError("tp>1 needs a mesh to place the shards on")
    # mesh + pallas always uses the TP-aware pack (leading [tp, ...] shard
    # axis — at tp=1 a length-1 axis), because the shard_map serving
    # programs (parallel/tp.py _unlead) expect that layout even for pure
    # data-parallel meshes
    tp_pack = mesh is not None and mode.startswith("pallas")
    # pallas-fast differs only in the kernel, not the packed tensors
    pack_mode = "pallas" if mode.startswith("pallas") else mode
    if tp_pack:
        pack_mode = f"pallas-tp{tp}"
    st = os.stat(path)
    meta_want = {"pack_version": _PACK_VERSION, "mode": pack_mode,
                 "src_size": st.st_size, "src_mtime_ns": st.st_mtime_ns}
    pack = _Path(f"{path}.pack") / pack_mode

    def place(host: dict):
        if mesh is not None:
            from qwen3_tpu.parallel.tp import place_params

            return place_params(host, mesh, cfg.head_dim, max_seq_len)
        return _to_device(host, cfg.head_dim, max_seq_len)

    if cache and (pack / "meta.json").exists():
        import numpy as np

        meta = json.loads((pack / "meta.json").read_text())
        if {k: meta.get(k) for k in meta_want} == meta_want:
            host = {}
            for key in meta["keys"]:
                a = np.load(pack / f"{key}.npy", mmap_mode="r")
                if meta["dtypes"].get(key) == "bfloat16":
                    import ml_dtypes

                    a = a.view(ml_dtypes.bfloat16)
                host[key] = a
            return cfg, place(host)

    if tp_pack:
        from qwen3_tpu.parallel.tp import tp_host_params

        host = tp_host_params(load_checkpoint(path), tp)
    else:
        host = _host_params(load_checkpoint(path), mode)
    if cache:
        import ml_dtypes
        import numpy as np
        import shutil

        # build the pack in a private temp dir and publish it with one atomic
        # rename: a concurrent reader can never mmap a tensor mid-write, and
        # concurrent cold loads race harmlessly (one rename wins, the losers
        # keep serving from the host arrays they already built). Meta is
        # still written last so a crash mid-build never validates.
        tmp = pack.with_name(f"{pack.name}.tmp.{os.getpid()}")
        tmp.mkdir(parents=True, exist_ok=True)
        dtypes = {}
        for key, a in host.items():
            a = np.asarray(a)
            if a.dtype == ml_dtypes.bfloat16:
                dtypes[key] = "bfloat16"
                a = a.view(np.uint16)
            np.save(tmp / f"{key}.npy", a)
        (tmp / "meta.json").write_text(json.dumps(
            dict(meta_want, keys=sorted(host), dtypes=dtypes)))
        if pack.exists():
            # stale pack (meta mismatch — the fresh-and-valid case returned
            # above); move it aside before publishing the rebuild
            old = pack.with_name(f"{pack.name}.stale.{os.getpid()}")
            try:
                os.rename(pack, old)
                shutil.rmtree(old, ignore_errors=True)
            except OSError:
                pass
        try:
            os.rename(tmp, pack)
        except OSError:
            # another process published first; theirs is equivalent
            shutil.rmtree(tmp, ignore_errors=True)
    return cfg, place(host)


def init_kv_cache(cfg: ModelConfig, batch: int, seq_len: int,
                  dtype=jnp.float32):
    """(k_cache, v_cache): plain arrays for float dtypes, (values, scales)
    tuples for int8 (see runtime/kvcache.py)."""
    from qwen3_tpu.runtime import kvcache

    return kvcache.init_kv_cache(cfg, batch, seq_len, dtype)


def _embed(p: Params, cfg: ModelConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """Dequantized embedding rows (values equal the reference's fp32 table
    w->fe, src/model.c:199-206)."""
    q = jnp.take(p["emb_q"], tokens, axis=0)
    s = jnp.take(p["emb_s"], tokens, axis=0)
    return dequantize(q, s, cfg.group_size)


def _flash_bs() -> int:
    """S-tile size for the flash kernels (QWEN3_TPU_FLASH_BS env — an
    on-chip tuning knob; larger tiles cut grid steps at long context)."""
    import os as _os

    return int(_os.environ.get("QWEN3_TPU_FLASH_BS", "256"))


def _flash(q, k_vals, v_vals, positions, ks, vs):
    """Flash-decode attention (ops/pallas/flash_decode.py): same values as
    gqa_attention_per_slot up to online-softmax fp32 reduction order."""
    import jax as _jax

    from qwen3_tpu.ops.pallas.flash_decode import flash_decode_gqa

    return flash_decode_gqa(q, k_vals, v_vals, positions, ks, vs,
                            block_s=_flash_bs(),
                            interpret=_jax.default_backend() == "cpu")


def _flash_prefill(q, k_vals, v_vals, positions, ks, vs):
    """Block-causal flash prefill attention: same values as gqa_attention up
    to online-softmax fp32 reduction order."""
    import jax as _jax

    from qwen3_tpu.ops.pallas.flash_decode import flash_prefill_gqa

    return flash_prefill_gqa(q, k_vals, v_vals, positions, ks, vs,
                             block_s=_flash_bs(),
                             interpret=_jax.default_backend() == "cpu")


def _flash_two_segment(q, k_main, v_main, k_side, v_side, base_pos, offsets,
                       k_ms, v_ms, k_ss, v_ss):
    """Flash decode over the side-buffer serving layout: same values as
    gqa_attention_two_segment up to online-softmax fp32 reduction order."""
    import jax as _jax

    from qwen3_tpu.ops.pallas.flash_decode import flash_decode_gqa_two_segment

    return flash_decode_gqa_two_segment(
        q, k_main, v_main, k_side, v_side, base_pos, offsets,
        k_ms, v_ms, k_ss, v_ss, block_s=_flash_bs(),
        interpret=_jax.default_backend() == "cpu")


def _make_linear(mode: str, group_size: int):
    if mode == "exact":
        def linear(x, layer_w):
            w_q, w_s = layer_w
            xq, xs = quantize_act(x, group_size)
            return q8_matmul_exact(xq, xs, w_q, w_s, group_size)
    elif mode.startswith("pallas"):
        import os as _os

        import jax as _jax

        from qwen3_tpu.ops.pallas.q8_matmul import (
            q8_matmul_stacked_fast,
            q8_matmul_tiled_fast,
            q8_q8_matmul_stacked,
            q8_q8_matmul_tiled,
            q8i8_matmul_stacked,
            q8i8_matmul_tiled,
        )

        interpret = _jax.default_backend() == "cpu"
        block_k = int(_os.environ.get("QWEN3_TPU_PALLAS_BK", "512"))

        # layer_w is (w_qt, w_st) for a single layer's tiles (classifier,
        # legacy path) or (w_qt[L,...], w_st[L,...], l) for the stacked
        # layout the layer scan uses: the kernel streams layer l's tiles
        # straight from HBM via a scalar-prefetched index instead of XLA
        # materializing a VMEM copy of the slab first (see
        # ops/pallas/q8_matmul._kernel_q8q8_stacked).
        if mode == "pallas-fast":
            # serving throughput: same packed int8 weights and HBM traffic,
            # but bf16 activations straight in and in-VMEM bf16 weight
            # dequant feeding full-K MXU dots (quality class of bf16 mode)
            def linear(x, layer_w):
                if len(layer_w) == 3:
                    w_qt, w_st, l = layer_w
                    return q8_matmul_stacked_fast(x, w_qt, w_st, l,
                                                  group_size,
                                                  block_k=block_k,
                                                  interpret=interpret)
                w_qt, w_st = layer_w
                return q8_matmul_tiled_fast(x, w_qt, w_st, group_size,
                                            block_k=block_k,
                                            interpret=interpret)
        elif mode == "pallas-int8":
            # int8-MXU experiment (VERDICT r3 #7): per-(k-tile, column)
            # in-VMEM weight requant + full-K int8 x int8 MXU dots (2x bf16
            # peak); same packed tensors and HBM traffic. Quality class
            # measured via tools/quality_table before any adoption.
            def linear(x, layer_w):
                if len(layer_w) == 3:
                    w_qt, w_st, l = layer_w
                    return q8i8_matmul_stacked(x, w_qt, w_st, l, group_size,
                                               block_k=block_k,
                                               interpret=interpret)
                w_qt, w_st = layer_w
                return q8i8_matmul_tiled(x, w_qt, w_st, group_size,
                                         block_k=block_k,
                                         interpret=interpret)
        else:
            # reference-exact integer math: quantize activations per group
            # (src/forward.c:259), then int8 x int8 group dots in the
            # kernel over the tile-repacked weight layout (see init_params)
            def linear(x, layer_w):
                xq, xs = quantize_act(x, group_size)
                if len(layer_w) == 3:
                    w_qt, w_st, l = layer_w
                    return q8_q8_matmul_stacked(xq, xs, w_qt, w_st, l,
                                                group_size, block_k=block_k,
                                                interpret=interpret)
                w_qt, w_st = layer_w
                return q8_q8_matmul_tiled(xq, xs, w_qt, w_st, group_size,
                                          block_k=block_k,
                                          interpret=interpret)
    else:
        def linear(x, layer_w):
            (w_t,) = layer_w
            return q8_matmul_bf16(x, w_t)
    return linear


def _make_fused_linear(mode: str, group_size: int):
    """Prologue-fused matmul dispatch for the pallas modes (see
    ops/pallas/q8_matmul.q8_matmul_fused): rmsnorm / swiglu / activation
    quantization run INSIDE the matmul kernel, removing the per-matmul XLA
    fusion boundaries the reference pays as separate passes
    (src/forward.c:254-262, 311-317). Enabled by QWEN3_TPU_FUSE=1 (off by
    default until validated on real TPU hardware — interpret mode does not
    check Mosaic constraints).

    Returns fused(x, layer_w, prologue, inv=None, nw=None) or None when the
    mode has no fused path."""
    if not mode.startswith("pallas"):
        return None
    import os as _os

    import jax as _jax

    if _os.environ.get("QWEN3_TPU_FUSE", "0") != "1":
        return None
    if mode == "pallas-int8":
        # no fused-prologue variant of the int8-MXU kernel exists; treating
        # it as `exact` would silently mix kernels (fused matmuls on the
        # integer path, unfused ones on the int8-requant path) — ignore the
        # FUSE knob so the mode measured is the mode that runs (ADVICE r4)
        return None
    from qwen3_tpu.ops.pallas.q8_matmul import q8_matmul_fused

    interpret = _jax.default_backend() == "cpu"
    block_k = int(_os.environ.get("QWEN3_TPU_PALLAS_BK", "512"))
    exact = mode != "pallas-fast"

    def fused(x, layer_w, prologue, inv=None, nw=None):
        w_qt, w_st = layer_w
        return q8_matmul_fused(x, w_qt, w_st, group_size, inv=inv, nw=nw,
                               prologue=prologue, exact=exact,
                               block_k=block_k, interpret=interpret)

    return fused


def _layer_weights(p: Params, mode: str, name: str):
    if mode == "bf16":
        return (p[name + "_t"],)
    return (p[name + "_q"], p[name + "_s"])


def forward_impl(p: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                 k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                 start_pos: jnp.ndarray, *, mode: str = "bf16",
                 all_logits: bool = False, attn: str = "dense",
                 last_pos=None, axis_name: str | None = None,
                 out_vocab: int | None = None):
    """Run a [B, T] block of tokens starting at absolute position `start_pos`.

    `last_pos` (traced i32, optional): position within the block whose
    logits to return when `all_logits` is False — lets a padded tail chunk
    ask for its last *valid* position without recompiling per prompt length
    (the reference computes the full-vocab matmul for every prompt token,
    src/completion.c:57-66; we compute exactly one).

    `axis_name`: when running tensor-parallel under `jax.shard_map`
    (parallel/tp.py), the mesh axis to reduce over. `cfg` then holds the
    LOCAL shard dims (n_heads/tp, n_kv_heads/tp, hidden/tp, vocab/tp);
    attention and the FFN are head-/hidden-sharded so the only collectives
    are one psum after each row-parallel matmul (wo, w2) and one tiled
    all-gather of the vocab-sharded logits, sliced to `out_vocab` (the true
    global vocab; per-shard tile padding sits between shard segments).

    Returns (logits [B, T, V] or [B, 1, V], new_k_cache, new_v_cache).
    """
    B, T = tokens.shape
    H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    linear = _make_linear(mode, cfg.group_size)
    fused = _make_fused_linear(mode, cfg.group_size)
    reduce_ = (lambda y: lax.psum(y, axis_name)) if axis_name else (lambda y: y)

    x = _embed(p, cfg, tokens)  # [B, T, dim] fp32

    positions = start_pos + jnp.arange(T, dtype=jnp.int32)       # [T]
    # mode="clip": an out-of-range position (guarded upstream) must clamp,
    # not fill with NaN — a NaN'd KV row poisons masked attention (0 * NaN)
    cos = jnp.take(p["rope_cos"], positions, axis=0,
                   mode="clip")[:, None, :]                       # [T,1,half]
    sin = jnp.take(p["rope_sin"], positions, axis=0, mode="clip")[:, None, :]

    def rope(v):
        half = v.shape[-1] // 2
        a, b = v[..., :half], v[..., half:]
        return jnp.concatenate([a * cos - b * sin, a * sin + b * cos], axis=-1)

    from qwen3_tpu.runtime import kvcache as kvc

    k_vals, k_sc = kvc.split(k_cache)
    v_vals, v_sc = kvc.split(v_cache)
    # pallas modes read the layer's weight tiles straight from the stacked
    # [L, ...] arrays inside the kernel (scalar-prefetched layer index);
    # putting them in scan xs makes XLA copy each layer's slab into VMEM
    # and serialize the copy with the matmul (~30% of decode, trace-
    # attributed). Other modes (and the fused-prologue path) keep xs.
    stacked = mode.startswith("pallas") and fused is None
    layer_xs = {
        "att_norm": p["att_norm"], "ffn_norm": p["ffn_norm"],
        "q_norm": p["q_norm"], "k_norm": p["k_norm"],
    }
    if not stacked:
        for name in _mat_names(mode):
            for part in (("_q", "_s") if mode != "bf16" else ("_t",)):
                layer_xs[name + part] = p[name + part]

    # The KV cache rides the scan CARRY (updated in place at layer l), not
    # xs/ys: mapping it through ys restacks the whole cache in HBM every
    # call (~2x cache bytes per token); the carry version writes only the
    # new rows. XLA aliases the carry buffer, so updates are in place.
    def body(carry, xs):
        x, kvs, l = carry
        k_vals, v_vals, k_sc, v_sc = kvs
        if stacked:
            lw = lambda name: (p[name + "_q"], p[name + "_s"], l)
        else:
            lw = lambda name: tuple(
                xs[name + part]
                for part in (("_q", "_s") if mode != "bf16" else ("_t",))
            )
        if fused is not None:
            qkv = fused(x, lw("wqkv"), "norm", inv=rms_inv(x),
                        nw=xs["att_norm"])
        elif mode.startswith("pallas"):
            qkv = linear(rmsnorm(x, xs["att_norm"]), lw("wqkv"))
        if mode.startswith("pallas"):
            q = qkv[..., :H * D].reshape(B, T, H, D)
            k = qkv[..., H * D:(H + KV) * D].reshape(B, T, KV, D)
            v = qkv[..., (H + KV) * D:(H + 2 * KV) * D].reshape(B, T, KV, D)
        else:
            h = rmsnorm(x, xs["att_norm"])
            q = linear(h, lw("wq")).reshape(B, T, H, D)
            k = linear(h, lw("wk")).reshape(B, T, KV, D)
            v = linear(h, lw("wv")).reshape(B, T, KV, D)

        q = rope(rmsnorm(q, xs["q_norm"]))
        k = rope(rmsnorm(k, xs["k_norm"]))

        k_enc, k_es = kvc.encode_block(k_vals, k)
        v_enc, v_es = kvc.encode_block(v_vals, v)
        k_vals = lax.dynamic_update_slice(
            k_vals, k_enc[None], (l, 0, start_pos, 0, 0))
        v_vals = lax.dynamic_update_slice(
            v_vals, v_enc[None], (l, 0, start_pos, 0, 0))
        kl = lax.dynamic_index_in_dim(k_vals, l, 0, keepdims=False)
        vl = lax.dynamic_index_in_dim(v_vals, l, 0, keepdims=False)
        ks = vs = None
        if k_es is not None:
            k_sc = lax.dynamic_update_slice(
                k_sc, k_es[None], (l, 0, start_pos, 0))
            v_sc = lax.dynamic_update_slice(
                v_sc, v_es[None], (l, 0, start_pos, 0))
            ks = lax.dynamic_index_in_dim(k_sc, l, 0, keepdims=False)
            vs = lax.dynamic_index_in_dim(v_sc, l, 0, keepdims=False)

        if attn == "flash" and T == 1:
            att = _flash(q[:, 0], kl, vl,
                         jnp.broadcast_to(positions, (B,)), ks, vs)[:, None]
        elif attn == "flash":
            att = _flash_prefill(q, kl, vl, positions, ks, vs)
        else:
            # pallas-fast (bf16 quality class) takes bf16 score/value MXU
            # passes; every other mode keeps fp32-HIGHEST reference numerics
            att = gqa_attention(q, kl, vl, positions, ks, vs,
                                fast=mode in ("pallas-fast", "pallas-int8"))  # [B,T,H,D]
        att = att.reshape(B, T, H * D)
        if fused is not None:
            x = x + reduce_(fused(att, lw("wo"), "none"))
            gu = fused(x, lw("w13"), "norm", inv=rms_inv(x),
                       nw=xs["ffn_norm"])
            x = x + reduce_(fused(gu, lw("w2"), "swiglu"))
            return (x, (k_vals, v_vals, k_sc, v_sc), l + 1), None
        x = x + reduce_(linear(att, lw("wo")))

        h = rmsnorm(x, xs["ffn_norm"])
        if mode.startswith("pallas"):
            gu = linear(h, lw("w13"))
            gate = gu[..., :cfg.hidden_dim]
            up = gu[..., cfg.hidden_dim:2 * cfg.hidden_dim]
        else:
            gate = linear(h, lw("w1"))
            up = linear(h, lw("w3"))
        x = x + reduce_(linear(swiglu(gate, up), lw("w2")))
        return (x, (k_vals, v_vals, k_sc, v_sc), l + 1), None

    init = (x, (k_vals, v_vals, k_sc, v_sc), jnp.int32(0))
    (x, (k_vals, v_vals, k_sc, v_sc), _), _ = lax.scan(body, init, layer_xs)
    new_k = kvc.join(k_vals, k_sc)
    new_v = kvc.join(v_vals, v_sc)

    if not all_logits:
        if last_pos is None:
            x = x[:, -1:, :]
        elif getattr(last_pos, "ndim", 0) == 1:
            # per-row last valid position (batched multi-request prefill —
            # prompts padded to a shared chunk have different lengths)
            x = jnp.take_along_axis(
                x, last_pos[:, None, None].astype(jnp.int32), axis=1)
        else:
            x = lax.dynamic_slice_in_dim(x, last_pos, 1, axis=1)
    if fused is not None:
        logits = fused(x, _layer_weights(p, mode, "cls"), "norm",
                       inv=rms_inv(x),
                       nw=p["out_norm"])[..., :cfg.vocab_size]
    else:
        x = rmsnorm(x, p["out_norm"])
        logits = linear(
            x, _layer_weights(p, mode, "cls"))[..., :cfg.vocab_size]
    if axis_name is not None:
        # vocab-sharded classifier: concatenate shard segments over the mesh
        logits = lax.all_gather(logits, axis_name, axis=-1, tiled=True)
        if out_vocab is not None:
            logits = logits[..., :out_vocab]
    return logits, new_k, new_v


forward = functools.partial(
    jax.jit, static_argnames=("cfg", "mode", "all_logits", "attn",
                              "axis_name", "out_vocab")
)(forward_impl)


def decode_forward_impl(p: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                        k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                        positions: jnp.ndarray, *, mode: str = "bf16",
                        attn: str = "dense", side=None,
                        axis_name: str | None = None,
                        out_vocab: int | None = None,
                        attn_bucket: int | None = None,
                        scales_t=None):
    """Batched single-token decode with *per-slot* positions.

    tokens: [B] int32, positions: [B] int32 (each stream at its own absolute
    position — the serving engine's continuous-batching step).

    Without `side`: cache rows are updated per slot at their own position
    (B unrolled slice-updates); returns (logits [B, V], new_k, new_v).

    attn="fused" (side mode only; falls back to dense without `side`): the
    main segment runs through the in-place Pallas kernel
    (ops.pallas.batched_decode) reading bucket-limited K/V tiles straight
    from the stacked cache in HBM — no per-layer slab copy. Requires
    `attn_bucket` (host-chosen, >= max positions, multiple of the kernel
    S-tile — runtime/batched.py computes it per chunk) and, for int8 KV,
    `scales_t` = (k_sf, v_sf) [L, B, S*KV] FLATTENED main scales
    (loop-invariant per chunk; the chunk loop hoists the flatten).

    With `side=(k_side, v_side, base_pos, step)`: the main cache is READ
    ONLY (rows idx < base_pos[b]); the new K/V rows go into the chunk side
    buffers [L, B, C, KV, D] at the *uniform* step index — one fast-path
    dynamic_update_slice instead of B scattered ones — and attention runs
    over both segments (dense: ops.attention.gqa_attention_two_segment;
    attn="flash": ops.pallas.flash_decode.flash_decode_gqa_two_segment).
    Returns (logits, new_k_side, new_v_side); the serving loop merges side
    rows back into the main cache once per chunk (runtime/batched.py).
    """
    B = tokens.shape[0]
    H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    linear = _make_linear(mode, cfg.group_size)
    fused = _make_fused_linear(mode, cfg.group_size)
    reduce_ = (lambda y: lax.psum(y, axis_name)) if axis_name else (lambda y: y)

    x = _embed(p, cfg, tokens[:, None])          # [B, 1, dim]
    cos = jnp.take(p["rope_cos"], positions, axis=0,
                   mode="clip")[:, None, None, :]
    sin = jnp.take(p["rope_sin"], positions, axis=0,
                   mode="clip")[:, None, None, :]

    def rope(v):  # [B, 1, heads, D]
        half = v.shape[-1] // 2
        a, b = v[..., :half], v[..., half:]
        return jnp.concatenate([a * cos - b * sin, a * sin + b * cos], axis=-1)

    from qwen3_tpu.runtime import kvcache as kvc

    k_vals, k_sc = kvc.split(k_cache)
    v_vals, v_sc = kvc.split(v_cache)
    # see forward_impl: pallas modes stream layer weights in-kernel from
    # the stacked arrays instead of scanning them through xs
    stacked = mode.startswith("pallas") and fused is None
    layer_xs = {
        "att_norm": p["att_norm"], "ffn_norm": p["ffn_norm"],
        "q_norm": p["q_norm"], "k_norm": p["k_norm"],
    }
    if not stacked:
        for name in _mat_names(mode):
            for part in (("_q", "_s") if mode != "bf16" else ("_t",)):
                layer_xs[name + part] = p[name + part]

    if side is not None:
        side_k, side_v, base_pos, step = side
        offsets = positions - base_pos
        sk0, sk_sc0 = kvc.split(side_k)
        sv0, sv_sc0 = kvc.split(side_v)
        carry_kvs = (sk0, sv0, sk_sc0, sv_sc0)
    else:
        carry_kvs = (k_vals, v_vals, k_sc, v_sc)

    # The writable cache (main without `side`, the chunk side buffers with)
    # rides the scan carry, updated in place at layer l (see forward_impl).
    def body(carry, xs):
        x, kvs, l = carry
        ck, cv, ck_sc, cv_sc = kvs
        if stacked:
            lw = lambda name: (p[name + "_q"], p[name + "_s"], l)
        else:
            lw = lambda name: tuple(
                xs[name + part]
                for part in (("_q", "_s") if mode != "bf16" else ("_t",))
            )
        if fused is not None:
            qkv = fused(x, lw("wqkv"), "norm", inv=rms_inv(x),
                        nw=xs["att_norm"])
        elif mode.startswith("pallas"):
            qkv = linear(rmsnorm(x, xs["att_norm"]), lw("wqkv"))
        if mode.startswith("pallas"):
            q = qkv[..., :H * D].reshape(B, 1, H, D)
            k = qkv[..., H * D:(H + KV) * D].reshape(B, 1, KV, D)
            v = qkv[..., (H + KV) * D:(H + 2 * KV) * D].reshape(B, 1, KV, D)
        else:
            h = rmsnorm(x, xs["att_norm"])
            q = linear(h, lw("wq")).reshape(B, 1, H, D)
            k = linear(h, lw("wk")).reshape(B, 1, KV, D)
            v = linear(h, lw("wv")).reshape(B, 1, KV, D)

        q = rope(rmsnorm(q, xs["q_norm"]))
        k = rope(rmsnorm(k, xs["k_norm"]))

        k_enc, k_es = kvc.encode_block(ck, k[:, 0])
        v_enc, v_es = kvc.encode_block(cv, v[:, 0])

        if side is None:
            # per-slot dynamic_update_slice, NOT a .at[l, rows, positions]
            # scatter: the multi-index scatter falls off XLA:TPU's fast path
            # for narrow dtypes (measured 6.6x slower per decode step with a
            # bf16 cache at B=8); B unrolled slice-updates stay in place. (A
            # pallas row-write kernel — ops/pallas/kv_write.py — is NOT an
            # improvement here: XLA double-buffers scan carries around
            # custom calls, copying the whole cache per layer; measured 8x
            # slower at B=64. The scalable path is `side`.)
            def write_rows(cache, rows_enc, extra_dims):
                for b in range(B):
                    blk = rows_enc[b].reshape((1, 1, 1) + rows_enc[b].shape)
                    cache = lax.dynamic_update_slice(
                        cache, blk.astype(cache.dtype),
                        (l, b, positions[b]) + (0,) * extra_dims)
                return cache

            ck = write_rows(ck, k_enc, 2)
            cv = write_rows(cv, v_enc, 2)
            if k_es is not None:
                ck_sc = write_rows(ck_sc, k_es, 1)
                cv_sc = write_rows(cv_sc, v_es, 1)

            if attn == "flash":
                kl = lax.dynamic_index_in_dim(ck, l, 0, keepdims=False)
                vl = lax.dynamic_index_in_dim(cv, l, 0, keepdims=False)
                ks = vs = None
                if k_es is not None:
                    ks = lax.dynamic_index_in_dim(ck_sc, l, 0,
                                                  keepdims=False)
                    vs = lax.dynamic_index_in_dim(cv_sc, l, 0,
                                                  keepdims=False)
                att = _flash(q[:, 0], kl, vl, positions, ks, vs)
            else:
                # serving mode takes bf16 attention passes (quality class of
                # bf16 — mirrors forward_impl's prefill decision, round 3).
                # The STACKED carry + layer index go straight in: a
                # pre-sliced cache[l] is a bucket-switch operand XLA must
                # materialize (a full slab copy per layer per step)
                # attn="fused" requires the side-buffer layout (the kernel
                # reads a loop-invariant main cache); without `side` it
                # falls back to the dense bucketed path
                att = gqa_attention_per_slot(
                    q[:, 0], ck, cv, positions,
                    None if k_es is None else ck_sc,
                    None if k_es is None else cv_sc,
                    fast=mode in ("pallas-fast", "pallas-int8"), layer=l,
                    static_bucket=None if attn == "fused" else attn_bucket)
        else:
            # all B rows share the step index -> ONE uniform
            # dynamic_update_slice per buffer, no scatter, no unroll
            def write_step(buf, rows_enc):
                blk = jnp.expand_dims(jnp.expand_dims(rows_enc, 0), 2)
                return lax.dynamic_update_slice(
                    buf, blk.astype(buf.dtype),
                    (l, 0, step) + (0,) * (buf.ndim - 3))

            ck = write_step(ck, k_enc)
            cv = write_step(cv, v_enc)
            ksl = lax.dynamic_index_in_dim(ck, l, 0, keepdims=False)
            vsl = lax.dynamic_index_in_dim(cv, l, 0, keepdims=False)
            kss = vss = None
            if k_es is not None:
                ck_sc = write_step(ck_sc, k_es)
                cv_sc = write_step(cv_sc, v_es)
                kss = lax.dynamic_index_in_dim(ck_sc, l, 0, keepdims=False)
                vss = lax.dynamic_index_in_dim(cv_sc, l, 0, keepdims=False)
            # main cache read-only from the closure (a scan carry would
            # double-buffer it)
            if attn == "none":  # debug: isolate attention cost in benches
                att = jnp.zeros((B, H, D), jnp.float32)
            elif attn == "flash":
                kml = lax.dynamic_index_in_dim(k_vals, l, 0, keepdims=False)
                vml = lax.dynamic_index_in_dim(v_vals, l, 0, keepdims=False)
                kms = vms = None
                if k_es is not None:
                    kms = lax.dynamic_index_in_dim(k_sc, l, 0,
                                                   keepdims=False)
                    vms = lax.dynamic_index_in_dim(v_sc, l, 0,
                                                   keepdims=False)
                att = _flash_two_segment(
                    q[:, 0], kml, vml, ksl, vsl, base_pos, offsets,
                    kms, vms, kss, vss)
            elif attn == "fused":
                # in-place Pallas kernel: main-cache tiles DMA'd from the
                # stacked array at the scalar-prefetched layer index; side
                # slab folded in by XLA under one online softmax
                att = fused_batched_attention(
                    q[:, 0], k_vals, v_vals, ksl, vsl, base_pos, offsets,
                    k_ss=kss, v_ss=vss, scales_flat=scales_t, layer=l,
                    bucket=attn_bucket,
                    fast=mode in ("pallas-fast", "pallas-int8"),
                    interpret=jax.default_backend() == "cpu")
            else:
                # stacked main cache + layer index (see per_slot branch
                # above): no materialized slab per layer
                att = gqa_attention_two_segment(
                    q[:, 0], k_vals, v_vals, ksl, vsl, base_pos, offsets,
                    k_ms=None if k_es is None else k_sc,
                    v_ms=None if k_es is None else v_sc,
                    k_ss=kss, v_ss=vss,
                    fast=mode in ("pallas-fast", "pallas-int8"), layer=l,
                    static_bucket=attn_bucket)

        att = att.reshape(B, 1, H * D)
        if fused is not None:
            x = x + reduce_(fused(att, lw("wo"), "none"))
            gu = fused(x, lw("w13"), "norm", inv=rms_inv(x),
                       nw=xs["ffn_norm"])
            x = x + reduce_(fused(gu, lw("w2"), "swiglu"))
            return (x, (ck, cv, ck_sc, cv_sc), l + 1), None
        x = x + reduce_(linear(att, lw("wo")))

        h = rmsnorm(x, xs["ffn_norm"])
        if mode.startswith("pallas"):
            gu = linear(h, lw("w13"))
            gate = gu[..., :cfg.hidden_dim]
            up = gu[..., cfg.hidden_dim:2 * cfg.hidden_dim]
        else:
            gate = linear(h, lw("w1"))
            up = linear(h, lw("w3"))
        x = x + reduce_(linear(swiglu(gate, up), lw("w2")))
        return (x, (ck, cv, ck_sc, cv_sc), l + 1), None

    init = (x, carry_kvs, jnp.int32(0))
    (x, (ck, cv, ck_sc, cv_sc), _), _ = lax.scan(body, init, layer_xs)
    new_a = kvc.join(ck, ck_sc)
    new_b = kvc.join(cv, cv_sc)
    if fused is not None:
        logits = fused(x, _layer_weights(p, mode, "cls"), "norm",
                       inv=rms_inv(x),
                       nw=p["out_norm"])[..., :cfg.vocab_size]
    else:
        x = rmsnorm(x, p["out_norm"])
        logits = linear(
            x, _layer_weights(p, mode, "cls"))[..., :cfg.vocab_size]
    if axis_name is not None:
        logits = lax.all_gather(logits, axis_name, axis=-1, tiled=True)
        if out_vocab is not None:
            logits = logits[..., :out_vocab]
    return logits[:, 0], new_a, new_b
