"""Tensor/data-parallel sharding over a TPU device mesh.

The reference is a single-process shared-memory engine (SURVEY.md §2.3); this
module adds the scale-out design: a 2-D ("dp", "tp") mesh where

- attention is head-sharded over "tp": wq/wk/wv column-parallel (output
  features = heads), wo row-parallel (input features), so each chip holds
  n_heads/tp query heads and n_kv_heads/tp KV heads plus the matching KV-cache
  shard — attention needs no communication; XLA inserts a single all-reduce
  after wo;
- the FFN is column-parallel on w1/w3 (hidden) and row-parallel on w2, again
  one all-reduce per layer;
- the classifier is vocab-sharded ("tp"), so each chip computes a logits
  shard and sampling all-gathers only the top-level distribution;
- the batch axis is sharded over "dp" for throughput serving.

Shardings are expressed as NamedShardings on the parameter/KV pytrees; GSPMD
propagates them through the jitted forward and inserts the collectives over
ICI. Multi-host extends the same mesh across processes (jax.distributed).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int | None = None,
              devices=None) -> Mesh:
    """Create a (dp, tp) mesh. Defaults to tp = all devices / dp."""
    if devices is None:
        devices = jax.devices()
    if tp is None:
        tp = len(devices) // dp
    if dp * tp != len(devices):
        devices = devices[: dp * tp]
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def param_partition_specs(mode: str = "bf16") -> dict[str, P]:
    """PartitionSpecs keyed like the params dict from models.init_params."""
    specs: dict[str, P] = {
        # norms + rope tables: replicated
        "att_norm": P(), "ffn_norm": P(), "out_norm": P(),
        "q_norm": P(), "k_norm": P(),
        "rope_cos": P(), "rope_sin": P(),
        # embedding table: replicated (gathered by token id on every chip)
        "emb_q": P(), "emb_s": P(),
    }
    if mode == "exact":
        # int8 [L, out, in] / scales [L, out, in//G]
        col = P(None, "tp", None)     # shard output features
        row = P(None, None, "tp")     # shard input features
        for name in ("wq", "wk", "wv", "w1", "w3"):
            specs[name + "_q"] = col
            specs[name + "_s"] = col
        for name in ("wo", "w2"):
            specs[name + "_q"] = row
            # scales group along input: in//G divides evenly across tp as long
            # as (in/tp) % G == 0, which holds for all presets with tp <= 8
            specs[name + "_s"] = row
        specs["cls_q"] = P("tp", None)     # vocab-sharded [V, D]
        specs["cls_s"] = P("tp", None)
    else:
        # bf16 transposed [L, in, out]
        col = P(None, None, "tp")
        row = P(None, "tp", None)
        for name in ("wq", "wk", "wv", "w1", "w3"):
            specs[name + "_t"] = col
        for name in ("wo", "w2"):
            specs[name + "_t"] = row
        specs["cls_t"] = P(None, "tp")     # [D, V] vocab-sharded
    return specs


def kv_partition_spec(rank: int = 5) -> P:
    """KV cache [L, B, S, KV, HD]: batch over dp, kv heads over tp.
    int8 caches carry rank-4 scale arrays [L, B, S, KV]."""
    if rank == 4:
        return P(None, "dp", None, "tp")
    return P(None, "dp", None, "tp", None)


def shard_params(params: dict, mesh: Mesh, mode: str = "bf16") -> dict:
    specs = param_partition_specs(mode)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in params.items()
    }


def shard_kv_cache(kv: tuple, mesh: Mesh) -> tuple:
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, kv_partition_spec(x.ndim))),
        kv)
