"""Tensor-parallel execution of the pallas (fused int8) mode via shard_map.

The GSPMD specs in parallel/sharding.py cover the per-matrix exact/bf16
layouts, where XLA can propagate a NamedSharding through plain matmuls. The
pallas perf path instead stores FUSED, TILE-REPACKED weights
(wqkv = [q|k|v] and w13 = [w1|w3] concatenated along the output axis, then
split into [J, n, td] HBM-contiguous tiles — models.qwen3._host_params), so
a tile-axis sharding would cut across the q/k/v and gate/up boundaries and
GSPMD would have to reshard around every static slice.

The TPU-first answer is to make the PACK shard-aware (Megatron-style TP,
done at repack time) and run the forward under `jax.shard_map`:

- each shard packs ITS OWN fused [q_shard|k_shard|v_shard] / [w1_s|w3_s]
  matrices — head groups for attention (n_heads/tp query + n_kv_heads/tp KV
  heads per shard), hidden/tp rows for the FFN — so inside a shard the
  kernel layout is identical to the single-chip pack, just smaller;
- wo / w2 are row-parallel: each shard holds the input-feature slice
  matching its heads / hidden rows; Q8 group boundaries (64) always align
  with shard boundaries (head_dim and hidden/tp are multiples of the group
  size), so per-shard activation quantization groups equal the global ones
  and the integer math stays reference-exact;
- the classifier is vocab-sharded; logits are all-gathered tiled and
  sliced to the true vocab;
- per layer the only collectives are one psum after wo and one after w2
  (models.qwen3.forward_impl `axis_name`), riding the ICI ring;
- the KV cache shards its kv-head axis over "tp" and batch over "dp";
  tokens/positions/RNG state shard over "dp" only.

The reference engine has no scale-out story at all (single-process OpenMP,
SURVEY.md §2.3); this module is the TP row of that design table.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qwen3_tpu.config import ModelConfig
from qwen3_tpu.io.checkpoint import Q8Weights

# params-dict keys that carry a leading shard axis [tp, ...]
TP_SHARDED_KEYS = frozenset(
    name + part
    for name in ("wqkv", "w13", "wo", "w2", "cls")
    for part in ("_q", "_s")
)


def check_tp(cfg: ModelConfig, tp: int) -> None:
    if tp == 1:
        return
    if cfg.n_kv_heads % tp:
        raise ValueError(f"tp={tp} must divide n_kv_heads={cfg.n_kv_heads}")
    hl = cfg.hidden_dim // tp
    if cfg.hidden_dim % tp or hl % cfg.group_size:
        raise ValueError(
            f"hidden_dim={cfg.hidden_dim} must split into tp={tp} chunks "
            f"divisible by group_size={cfg.group_size}")
    if (cfg.head_dim * cfg.n_heads // tp) % cfg.group_size:
        raise ValueError("per-shard proj_dim must be divisible by group_size")


def local_config(cfg: ModelConfig, tp: int) -> ModelConfig:
    """The shard-local architecture: heads, kv heads, hidden rows and vocab
    columns divided by tp. `vocab_size` becomes the shard's valid column
    count (global vocab padded up to a tp multiple, then split)."""
    check_tp(cfg, tp)
    v_pad = -(-cfg.vocab_size // tp) * tp
    return dataclasses.replace(
        cfg,
        n_heads=cfg.n_heads // tp,
        n_kv_heads=cfg.n_kv_heads // tp,
        hidden_dim=cfg.hidden_dim // tp,
        vocab_size=v_pad // tp,
    )


def tp_host_params(w: Q8Weights, tp: int) -> dict:
    """Host (numpy) pallas-mode params with TP-shard-aware fused packing.

    Sharded leaves get a LEADING shard axis [tp, ...] (placed with spec
    P("tp", ...); the shard_map body squeezes it). Replicated leaves (norms,
    embeddings) are identical to models.qwen3._host_params' output.
    """
    from qwen3_tpu.models.qwen3 import _transpose_stacked
    from qwen3_tpu.ops.pallas.q8_matmul import repack_tiles

    cfg = w.config
    check_tp(cfg, tp)
    D = cfg.head_dim
    Hl, KVl = cfg.n_heads // tp, cfg.n_kv_heads // tp
    hl = cfg.hidden_dim // tp

    p = {
        "att_norm": w.att_norm,
        "ffn_norm": w.ffn_norm,
        "out_norm": w.out_norm,
        "q_norm": w.q_norm,
        "k_norm": w.k_norm,
        "emb_q": w.emb_q,
        "emb_s": w.emb_s,
    }

    def pack(q, s):
        return repack_tiles(_transpose_stacked(q), _transpose_stacked(s),
                            cfg.group_size)

    def stack(pairs):
        qs, ss = zip(*pairs)
        return np.stack(qs), np.stack(ss)

    def out_rows(a, lo, hi):   # slice the output axis of [L, out, in]
        return a[..., lo:hi, :]

    # column-parallel fused QKV: shard s owns query heads [s*Hl, (s+1)*Hl)
    # and kv heads [s*KVl, (s+1)*KVl)
    p["wqkv_q"], p["wqkv_s"] = stack([
        pack(
            np.concatenate([
                out_rows(w.wq_q, s * Hl * D, (s + 1) * Hl * D),
                out_rows(w.wk_q, s * KVl * D, (s + 1) * KVl * D),
                out_rows(w.wv_q, s * KVl * D, (s + 1) * KVl * D),
            ], axis=-2),
            np.concatenate([
                out_rows(w.wq_s, s * Hl * D, (s + 1) * Hl * D),
                out_rows(w.wk_s, s * KVl * D, (s + 1) * KVl * D),
                out_rows(w.wv_s, s * KVl * D, (s + 1) * KVl * D),
            ], axis=-2),
        )
        for s in range(tp)
    ])

    # column-parallel fused FFN in: shard s owns hidden rows [s*hl, (s+1)*hl)
    p["w13_q"], p["w13_s"] = stack([
        pack(
            np.concatenate([out_rows(w.w1_q, s * hl, (s + 1) * hl),
                            out_rows(w.w3_q, s * hl, (s + 1) * hl)], axis=-2),
            np.concatenate([out_rows(w.w1_s, s * hl, (s + 1) * hl),
                            out_rows(w.w3_s, s * hl, (s + 1) * hl)], axis=-2),
        )
        for s in range(tp)
    ])

    # row-parallel wo / w2: shard the INPUT feature axis to match the heads /
    # hidden rows this shard produced. Group scales follow: the input slice
    # is always a multiple of the group size (check_tp).
    G = cfg.group_size

    def in_cols(q_arr, s_arr, lo, hi):  # [L, out, in] / [L, out, in//G]
        return q_arr[..., :, lo:hi], s_arr[..., :, lo // G:hi // G]

    p["wo_q"], p["wo_s"] = stack([
        pack(*in_cols(w.wo_q, w.wo_s, s * Hl * D, (s + 1) * Hl * D))
        for s in range(tp)
    ])
    p["w2_q"], p["w2_s"] = stack([
        pack(*in_cols(w.w2_q, w.w2_s, s * hl, (s + 1) * hl))
        for s in range(tp)
    ])

    # vocab-sharded classifier: pad the vocab to a tp multiple (zero rows and
    # zero scales -> exactly-0.0 logits, removed by the post-gather slice)
    V = cfg.vocab_size
    v_pad = -(-V // tp) * tp
    cls_q, cls_s = w.cls_q, w.cls_s
    if v_pad != V:
        cls_q = np.pad(cls_q, ((0, v_pad - V), (0, 0)))
        cls_s = np.pad(cls_s, ((0, v_pad - V), (0, 0)))
    vl = v_pad // tp
    p["cls_q"], p["cls_s"] = stack([
        pack(cls_q[s * vl:(s + 1) * vl], cls_s[s * vl:(s + 1) * vl])
        for s in range(tp)
    ])
    return p


def param_specs(host: dict) -> dict:
    """PartitionSpec per params key (leading "tp" axis on sharded leaves)."""
    return {k: (P("tp") if k in TP_SHARDED_KEYS else P()) for k in host}


def _kv_leaf_spec(a) -> P:
    # [L, B, S, KV, D] values / [L, B, S, KV] int8 scales
    if a.ndim == 5:
        return P(None, "dp", None, "tp", None)
    return P(None, "dp", None, "tp")


def kv_specs(kv) -> tuple:
    return jax.tree.map(_kv_leaf_spec, kv)


def place_params(host: dict, mesh: Mesh, head_dim: int,
                 max_seq_len: int) -> dict:
    """Host leaves -> device, sharded per param_specs; adds rope tables."""
    from qwen3_tpu.ops.rope import rope_tables

    specs = param_specs(host)
    p = {
        k: jax.device_put(np.asarray(v), NamedSharding(mesh, specs[k]))
        for k, v in host.items()
    }
    cos, sin = rope_tables(head_dim, max_seq_len)
    for k, v in (("rope_cos", cos), ("rope_sin", sin)):
        p[k] = jax.device_put(v, NamedSharding(mesh, P()))
    return p


def init_sharded_kv(cfg: ModelConfig, batch: int, seq_len: int, dtype,
                    mesh: Mesh):
    """KV cache sharded batch-over-dp, kv-heads-over-tp."""
    from qwen3_tpu.models import init_kv_cache

    kv = init_kv_cache(cfg, batch, seq_len, dtype)
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, _kv_leaf_spec(a))),
        kv)


def _unlead(params: dict) -> dict:
    """Drop the (length-1 inside shard_map) leading shard axis."""
    return {k: (v[0] if k in TP_SHARDED_KEYS else v)
            for k, v in params.items()}


def _pspecs(params_tree: dict) -> dict:
    s = param_specs(params_tree)
    s["rope_cos"] = s["rope_sin"] = P()
    return s


def make_tp_forward(mesh: Mesh, cfg: ModelConfig, params_tree: dict,
                    kv_tree, *, mode: str = "pallas", attn: str = "dense"):
    """jitted tensor/data-parallel forward: (params, tokens, k, v, start_pos,
    last_pos) -> (logits [B, 1, V], k, v). `params_tree`/`kv_tree` are only
    inspected for their pytree structure (specs), not kept."""
    from qwen3_tpu.models.qwen3 import forward_impl

    tp = mesh.shape["tp"]
    cfg_loc = local_config(cfg, tp)
    pspecs = _pspecs(params_tree)
    kspecs = kv_specs(kv_tree)

    def body(p, tokens, k, v, start_pos, last_pos):
        logits, k, v = forward_impl(
            _unlead(p), cfg_loc, tokens, k, v, start_pos, mode=mode,
            attn=attn, last_pos=last_pos,
            axis_name="tp" if tp > 1 else None, out_vocab=cfg.vocab_size)
        return logits, k, v

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, P("dp"), kspecs[0], kspecs[1], P(), P()),
        out_specs=(P("dp"), kspecs[0], kspecs[1]),
        check_vma=False)
    return jax.jit(fn, donate_argnums=(2, 3))


def make_tp_decode_step(mesh: Mesh, cfg: ModelConfig, params_tree: dict,
                        kv_tree, *, mode: str = "pallas",
                        attn: str = "dense"):
    """jitted TP serving decode step with per-slot positions:
    (params, tokens [B], k, v, positions [B]) -> (logits [B, V], k, v)."""
    from qwen3_tpu.models.qwen3 import decode_forward_impl

    tp = mesh.shape["tp"]
    cfg_loc = local_config(cfg, tp)
    pspecs = _pspecs(params_tree)
    kspecs = kv_specs(kv_tree)

    def body(p, tokens, k, v, positions):
        return decode_forward_impl(
            _unlead(p), cfg_loc, tokens, k, v, positions, mode=mode,
            attn=attn, axis_name="tp" if tp > 1 else None,
            out_vocab=cfg.vocab_size)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, P("dp"), kspecs[0], kspecs[1], P("dp")),
        out_specs=(P("dp"), kspecs[0], kspecs[1]),
        check_vma=False)
    return jax.jit(fn, donate_argnums=(2, 3))


def make_tp_decode_chunk(mesh: Mesh, cfg: ModelConfig, params_tree: dict,
                         kv_tree, **statics):
    """TP version of runtime.decode_loop.decode_chunk (single stream, B=1;
    requires mesh dp=1). `statics` forwards the chunk's static kwargs
    (mode/chunk/temperature/top_p/greedy/bos/eos/emit_at_limit/top_k/attn).
    """
    from qwen3_tpu.runtime.decode_loop import decode_chunk_impl

    tp = mesh.shape["tp"]
    if mesh.shape["dp"] != 1:
        raise ValueError("single-stream decode_chunk runs with dp=1")
    cfg_loc = local_config(cfg, tp)
    kspecs = kv_specs(kv_tree)

    def body(p, k, v, token, pos, limit, hi, lo):
        return decode_chunk_impl(
            _unlead(p), k, v, token, pos, limit, hi, lo, cfg=cfg_loc,
            axis_name="tp" if tp > 1 else None, out_vocab=cfg.vocab_size,
            **statics)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(_pspecs(params_tree), kspecs[0], kspecs[1],
                  P(), P(), P(), P(), P()),
        out_specs=(P(), kspecs[0], kspecs[1], P(), P(), P(), P()),
        check_vma=False)
    return jax.jit(fn, donate_argnums=(1, 2))


def make_tp_batched_chunk(mesh: Mesh, cfg: ModelConfig, params_tree: dict,
                          kv_tree, **statics):
    """TP/DP version of runtime.batched.batched_decode_chunk: per-slot [B]
    state shards over "dp", kv heads over "tp"."""
    from qwen3_tpu.runtime.batched import batched_decode_chunk_impl

    tp = mesh.shape["tp"]
    cfg_loc = local_config(cfg, tp)
    kspecs = kv_specs(kv_tree)
    b = P("dp")

    def body(p, k, v, token, pos, limit, done, hi, lo, temp, topp, emit_lim):
        return batched_decode_chunk_impl(
            _unlead(p), k, v, token, pos, limit, done, hi, lo, temp, topp,
            emit_lim, cfg=cfg_loc, axis_name="tp" if tp > 1 else None,
            out_vocab=cfg.vocab_size, **statics)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(_pspecs(params_tree), kspecs[0], kspecs[1],
                  b, b, b, b, b, b, b, b, b),
        out_specs=(b, kspecs[0], kspecs[1], b, b, b, b, b),
        check_vma=False)
    return jax.jit(fn, donate_argnums=(1, 2))


def make_tp_prefill_slots_chunk(mesh: Mesh, cfg: ModelConfig,
                                params_tree: dict, kv_tree, *, mode: str,
                                attn: str = "dense"):
    """TP/DP version of runtime.batched.prefill_slots_chunk — batched
    admission: one prompt chunk for N fresh requests through ONE gathered-
    slots forward per dp shard (instead of N serial slot prefills, which is
    an admission-latency cliff at dp>1).

    Data-parallel by construction: the HOST routes each request's row to the
    dp shard that owns its slot and pads every shard to the same row count M
    (N = M * dp rows total, row args sharded over "dp"), so admission compute
    scales with dp rather than being replicated. Padding rows are marked
    invalid: their forward output is discarded and their cache writes are
    masked back to the current rows, so a padding row may alias ANY local
    slot (live or pinned) without corrupting it — the host only guarantees
    the M local slot ids per shard are distinct (no scatter-duplicate
    hazard).

    tokens: [N, C] i32 padded blocks; slots: [N] i32 GLOBAL batch indices
    (each row's slot must belong to the dp shard the row is placed on:
    slot // (B/dp) == row // M); valid: [N] bool; start_pos: i32 scalar
    (fresh admissions only — chat continuations go through the serial
    path); last_pos: [N] i32. Returns (logits [N, V] — rows for invalid
    entries are garbage —, k, v)."""
    import jax.numpy as _jnp
    from jax import lax

    from qwen3_tpu.models.qwen3 import forward_impl

    tp, dp = mesh.shape["tp"], mesh.shape["dp"]
    cfg_loc = local_config(cfg, tp)
    kspecs = kv_specs(kv_tree)

    def body(p, k_cache, v_cache, tokens, slots, valid, start_pos, last_pos):
        pl = _unlead(p)
        bl = jax.tree.leaves(k_cache)[0].shape[1]   # local slots per shard
        my = lax.axis_index("dp") if dp > 1 else _jnp.int32(0)
        lslots = _jnp.clip(slots - my * bl, 0, bl - 1)
        n_rows = tokens.shape[0]                    # local rows (static)

        # unrolled dynamic slices / slice-updates, NOT take + .at[].set: the
        # scatter defeats XLA's donation aliasing and double-buffers the
        # whole donated cache (the single-device prefill_slots_chunk had the
        # same admission OOM at B=512 — see runtime/batched.py)
        def take(a):
            return _jnp.concatenate(
                [lax.dynamic_slice_in_dim(a, lslots[i], 1, axis=1)
                 for i in range(n_rows)], axis=1)

        def put(full, part):
            part = part.astype(full.dtype)
            for i in range(n_rows):
                row = lax.dynamic_slice_in_dim(part, i, 1, axis=1)
                cur = lax.dynamic_slice_in_dim(full, lslots[i], 1, axis=1)
                full = lax.dynamic_update_slice_in_dim(
                    full, _jnp.where(valid[i], row, cur), lslots[i], axis=1)
            return full

        kv_rows = jax.tree.map(take, k_cache)
        vv_rows = jax.tree.map(take, v_cache)
        logits, kr, vr = forward_impl(
            pl, cfg_loc, tokens, kv_rows, vv_rows, start_pos, mode=mode,
            attn=attn, last_pos=last_pos,
            axis_name="tp" if tp > 1 else None, out_vocab=cfg.vocab_size)
        k_cache = jax.tree.map(put, k_cache, kr)
        v_cache = jax.tree.map(put, v_cache, vr)
        return logits[:, 0], k_cache, v_cache

    b = P("dp")
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(_pspecs(params_tree), kspecs[0], kspecs[1],
                  b, b, b, P(), b),
        out_specs=(b, kspecs[0], kspecs[1]),
        check_vma=False)
    return jax.jit(fn, donate_argnums=(1, 2))


def make_tp_prefill_slot_chunk(mesh: Mesh, cfg: ModelConfig,
                               params_tree: dict, kv_tree, *, mode: str,
                               attn: str = "dense"):
    """TP/DP version of runtime.batched.prefill_slot_chunk — one prompt
    chunk into one cache slot. The caller drives the chunk loop and the
    first-token sampling (decode_loop.prefill_blocks + burn_and_sample, the
    same pieces the single-device engines share), on the replicated
    all-gathered logits.

    `slot` is the GLOBAL batch index; with dp>1 each dp shard holds B/dp
    slots, so the owning shard is slot // (B/dp). Every shard runs the
    (cheap, prompt-sized) forward — they must anyway, for the tp
    collectives — but only the owner's cache rows are written; the others
    re-write their own current rows."""
    import jax.numpy as _jnp
    from jax import lax

    from qwen3_tpu.models.qwen3 import forward_impl

    tp, dp = mesh.shape["tp"], mesh.shape["dp"]
    cfg_loc = local_config(cfg, tp)
    kspecs = kv_specs(kv_tree)

    def body(p, k_cache, v_cache, tokens, slot, start_pos, last_pos):
        pl = _unlead(p)
        bl = jax.tree.leaves(k_cache)[0].shape[1]   # local slots per shard
        my = lax.axis_index("dp") if dp > 1 else _jnp.int32(0)
        lslot = slot - my * bl
        in_range = (lslot >= 0) & (lslot < bl)
        safe = _jnp.clip(lslot, 0, bl - 1)

        take = lambda a: lax.dynamic_slice_in_dim(a, safe, 1, axis=1)
        put = lambda full, part: lax.dynamic_update_slice_in_dim(
            full,
            _jnp.where(in_range, part.astype(full.dtype), take(full)),
            safe, axis=1)
        kv_rows = jax.tree.map(take, k_cache)
        vv_rows = jax.tree.map(take, v_cache)
        logits, kr, vr = forward_impl(
            pl, cfg_loc, tokens[None, :], kv_rows, vv_rows, start_pos,
            mode=mode, attn=attn, last_pos=last_pos,
            axis_name="tp" if tp > 1 else None, out_vocab=cfg.vocab_size)
        k_cache = jax.tree.map(put, k_cache, kr)
        v_cache = jax.tree.map(put, v_cache, vr)
        out = logits[0, 0]
        if dp > 1:
            # only the slot OWNER computed against the slot's real earlier
            # KV rows (continuation chunks, start_pos > 0, read rows the
            # other dp shards don't hold) — replicate the owner's logits.
            # `where` (not multiply) so a non-owner NaN can't poison the sum.
            out = lax.psum(_jnp.where(in_range, out, 0.0), "dp")
        return out, k_cache, v_cache

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(_pspecs(params_tree), kspecs[0], kspecs[1],
                  P(), P(), P(), P()),
        out_specs=(P(), kspecs[0], kspecs[1]),
        check_vma=False)
    return jax.jit(fn, donate_argnums=(1, 2))
