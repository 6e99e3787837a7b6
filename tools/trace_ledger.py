"""Per-op device-time ledger from a JAX profiler trace (VERDICT r3 #2/#4).

Captures a device trace of one serving workload, aggregates XLA-op wall
time by (bucketed) op family, and prints a markdown ledger table plus a
JSON line. The committed PROFILE.md is produced from these runs, making
trace-attributed perf claims auditable and diffable across rounds.

    python tools/trace_ledger.py batched   # B=64 serving step (default)
    python tools/trace_ledger.py decode    # single-stream decode chunk
    python tools/trace_ledger.py prefill   # pallas-fast prefill chunk
    python tools/trace_ledger.py parse <trace_dir>   # re-parse only

Env: LEDGER_PRESET (qwen3-4b), LEDGER_BATCH (64), LEDGER_STEPS (4),
LEDGER_KV (int8), LEDGER_QMODE (pallas-fast for batched / pallas for
decode), LEDGER_ATTN (dense), LEDGER_CTX (512 batched / 1024 decode).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
CACHE = REPO / ".cache"
PRESET = os.environ.get("LEDGER_PRESET", "qwen3-4b")


# -- trace parsing ----------------------------------------------------------

def load_trace_events(trace_dir: str) -> list[dict]:
    """All trace events from the newest run under `trace_dir`."""
    paths = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)["traceEvents"]


def device_op_durations(events: list[dict]) -> tuple[dict, float]:
    """{op_name: total_us} for ops on the TPU 'XLA Ops' track, plus the
    span (first-start..last-end us) of those ops."""
    # process/thread metadata events name the tracks
    pids_tpu = set()
    tid_names: dict[tuple, str] = {}
    for e in events:
        if e.get("ph") == "M":
            if (e.get("name") == "process_name"
                    and "TPU" in str(e.get("args", {}).get("name", ""))):
                pids_tpu.add(e["pid"])
            if e.get("name") == "thread_name":
                tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    ops: dict[str, float] = defaultdict(float)
    t_lo, t_hi = float("inf"), float("-inf")
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids_tpu:
            continue
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        if "XLA Ops" not in tname:
            continue
        dur = float(e.get("dur", 0.0))
        ops[e["name"]] += dur
        t0 = float(e.get("ts", 0.0))
        t_lo, t_hi = min(t_lo, t0), max(t_hi, t0 + dur)
    return dict(ops), (t_hi - t_lo if t_hi > t_lo else 0.0)


_BUCKETS = [
    # (bucket label, substrings matched against the lowercase op name)
    ("q8 matmul kernels", ("q8q8_stacked", "q8_stacked", "q8q8_tiled",
                           "q8_tiled", "q8_matmul", "custom-call")),
    ("flash attention kernels", ("flash_decode", "flash_prefill")),
    ("attention (dense dots)", ("dot.", "dot_general", "einsum")),
    ("conversions / dequant", ("convert.", "convert_element_type",
                               "multiply.", "mul.")),
    ("copies / transposes", ("copy", "transpose", "bitcast")),
    ("cache updates", ("dynamic-update-slice", "dynamic_update_slice",
                       "scatter")),
    ("gathers / slices", ("dynamic-slice", "dynamic_slice", "gather",
                          "slice.", "take")),
    ("softmax / elementwise", ("exp", "divide", "div.", "subtract", "add.",
                               "maximum", "reduce", "select", "compare",
                               "broadcast", "iota", "and.", "or.", "not.",
                               "tanh", "logistic", "rsqrt", "sqrt", "power",
                               "concatenate", "reshape", "pad", "clamp",
                               "floor", "sign", "abs", "negate", "xor",
                               "shift", "rem.", "round")),
    ("sort / top-k / argmax", ("sort", "top-k", "topk", "arg")),
    ("while/control", ("while", "condition", "tuple", "parameter",
                       "constant", "call")),
]


def bucket_of(name: str) -> str:
    n = name.lower()
    # fusion names carry the dominant-op hint, e.g. "fusion.123" alone is
    # opaque; XLA names loop fusions after their root where possible
    for label, keys in _BUCKETS:
        for k in keys:
            if k in n:
                return label
    if n.startswith("fusion"):
        return "fusions (unclassified)"
    return "other"


def make_ledger(ops: dict, span_us: float, n_steps: int) -> dict:
    """Control-flow parents (while/conditional/call) NEST their children on
    the XLA Ops track, so they are excluded from the total — the leaf-op sum
    matches the trace span to within a few percent, which is the
    '<10% unattributed' criterion the ledger exists to witness."""
    buckets: dict[str, float] = defaultdict(float)
    examples: dict[str, list] = defaultdict(list)
    for name, us in ops.items():
        b = bucket_of(name)
        buckets[b] += us
        examples[b].append((us, name))
    control_us = buckets.pop("while/control", 0.0)
    total = sum(buckets.values())
    rows = []
    for b, us in sorted(buckets.items(), key=lambda kv: -kv[1]):
        top = sorted(examples[b], reverse=True)[:3]
        rows.append({
            "bucket": b, "ms_per_step": round(us / 1e3 / max(n_steps, 1), 3),
            "pct": round(100 * us / max(total, 1e-9), 1),
            "top_ops": [f"{n} ({u/1e3/max(n_steps,1):.2f} ms)"
                        for u, n in top],
        })
    span_ms = span_us / 1e3 / max(n_steps, 1)
    leaf_ms = total / 1e3 / max(n_steps, 1)
    return {
        "leaf_ms_per_step": round(leaf_ms, 3),
        "span_ms_per_step": round(span_ms, 3),
        "unattributed_pct": round(100 * (1 - leaf_ms / max(span_ms, 1e-9)),
                                  1),
        "control_parents_ms": round(control_us / 1e3 / max(n_steps, 1), 3),
        "n_steps": n_steps,
        "rows": rows,
    }


def print_ledger(tag: str, ledger: dict, meta: dict) -> None:
    print(f"\n## {tag} — per-op device ledger")
    print(f"({meta})")
    print(f"leaf ops {ledger['leaf_ms_per_step']} ms/step of "
          f"span {ledger['span_ms_per_step']} ms/step "
          f"({ledger['unattributed_pct']}% unattributed) over "
          f"{ledger['n_steps']} steps\n")
    print("| bucket | ms/step | % | top ops |")
    print("|---|---|---|---|")
    for r in ledger["rows"]:
        print(f"| {r['bucket']} | {r['ms_per_step']} | {r['pct']} | "
              f"{'; '.join(r['top_ops'])} |")
    print()
    print("JSON:", json.dumps({"tag": tag, "meta": meta, **ledger}))


# -- workloads --------------------------------------------------------------

def _params(ctx: int, qmode: str):
    from qwen3_tpu.config import PRESETS
    from qwen3_tpu.io.device_synth import synth_device_params

    cfg = PRESETS[PRESET].with_seq_len(ctx)
    return cfg, synth_device_params(cfg, ctx, seed=0,
                                    exec_cache=str(CACHE / "exec"))


def run_batched(trace_dir: str) -> dict:
    """Trace LEDGER_STEPS batched_decode_chunk dispatches at B=LEDGER_BATCH
    (the serving flagship: int8 KV + side buffer + dense attention)."""
    import jax.numpy as jnp
    import numpy as np

    from qwen3_tpu.models import init_kv_cache
    from qwen3_tpu.runtime import kvcache
    from qwen3_tpu.runtime.batched import batched_decode_chunk
    from qwen3_tpu.utils.profiling import profile_trace

    B = int(os.environ.get("LEDGER_BATCH", "64"))
    ctx = int(os.environ.get("LEDGER_CTX", "512"))
    chunk = int(os.environ.get("LEDGER_CHUNK", "32"))
    qmode = os.environ.get("LEDGER_QMODE", "pallas-fast")
    attn = os.environ.get("LEDGER_ATTN", "dense")
    kv_dtype = os.environ.get("LEDGER_KV", "int8")
    n_steps = int(os.environ.get("LEDGER_STEPS", "4"))
    cfg, params = _params(ctx, qmode)

    rows = kvcache.pad_rows(ctx + chunk)
    k, v = init_kv_cache(cfg, B, rows, jnp.dtype(kv_dtype))
    token = jnp.full((B,), 7, jnp.int32)
    # LEDGER_POS: slot depth (default mid-depth; the short-prompt bench
    # steady state sits at ~64-80 -> the smallest 256-row bucket)
    pos = jnp.full((B,), int(os.environ.get("LEDGER_POS", ctx // 2)),
                   jnp.int32)
    limit = jnp.full((B,), ctx, jnp.int32)
    done = jnp.zeros((B,), bool)
    hi = jnp.full((B,), 0x9E3779B9, jnp.uint32)
    lo = jnp.full((B,), 0x7F4A7C15, jnp.uint32)
    temp = jnp.zeros((B,), jnp.float32)
    topp = jnp.full((B,), 0.9, jnp.float32)
    emit = jnp.zeros((B,), bool)
    statics = dict(cfg=cfg, mode=qmode, chunk=chunk, attn=attn, greedy=True,
                   bos=cfg.vocab_size - 10, eos=cfg.vocab_size - 9,
                   top_k=64, use_side=True)
    # LEDGER_BUCKET: trace the static-bucket program (the engine's
    # host-side dispatch) instead of the in-program lax.switch
    if os.environ.get("LEDGER_BUCKET"):
        statics["bucket"] = int(os.environ["LEDGER_BUCKET"])

    def step(k, v, token, pos, done, hi, lo):
        out = batched_decode_chunk(params, k, v, token, pos, limit, done,
                                   hi, lo, temp, topp, emit, **statics)
        packed, k, v, token, pos, done, hi, lo = out
        np.asarray(packed)
        return k, v, token, pos, done, hi, lo

    t0 = time.time()
    st = step(k, v, token, pos, done, hi, lo)   # compile + warm
    print(f"[ledger] compile+warm {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    with profile_trace(trace_dir):
        for _ in range(n_steps):
            st = step(*st)
    wall = time.perf_counter() - t0
    tok_s = B * chunk * n_steps / wall
    print(f"[ledger] {n_steps} chunks of {chunk} steps at B={B}: "
          f"{tok_s:.0f} tok/s aggregate "
          f"({wall*1e3/(n_steps*chunk):.2f} ms/step)", file=sys.stderr)
    return {"workload": "batched", "B": B, "ctx": ctx, "chunk": chunk,
            "qmode": qmode, "attn": attn, "kv": kv_dtype,
            # per-STEP numbers below divide by chunk bodies, not dispatches
            "n_steps": n_steps * chunk, "agg_tok_s": round(tok_s, 1)}


def run_decode(trace_dir: str) -> dict:
    """Trace single-stream decode chunks (the 135 tok/s headline path)."""
    import jax.numpy as jnp
    import numpy as np

    from qwen3_tpu.models import init_kv_cache
    from qwen3_tpu.runtime.decode_loop import decode_chunk
    from qwen3_tpu.runtime.xorshift import seed_to_device
    from qwen3_tpu.utils.profiling import profile_trace

    ctx = int(os.environ.get("LEDGER_CTX", "1024"))
    chunk = int(os.environ.get("LEDGER_CHUNK", "128"))
    qmode = os.environ.get("LEDGER_QMODE", "pallas")
    n_steps = int(os.environ.get("LEDGER_STEPS", "2"))
    cfg, params = _params(ctx, qmode)
    kwargs = dict(cfg=cfg, mode=qmode, chunk=chunk, temperature=0.0,
                  top_p=0.9, greedy=True, bos=cfg.vocab_size - 10,
                  eos=cfg.vocab_size - 9, emit_at_limit=False, top_k=64,
                  attn=os.environ.get("LEDGER_ATTN", "dense"))
    k, v = init_kv_cache(cfg, 1, ctx, jnp.bfloat16)
    hi, lo = seed_to_device(3)
    st = (k, v, jnp.asarray([7], jnp.int32), jnp.int32(0), hi, lo)

    def step(k, v, tok, pos, hi, lo):
        packed, k, v, tok, pos, hi, lo = decode_chunk(
            params, k, v, tok, pos, jnp.int32(ctx), hi, lo, **kwargs)
        np.asarray(packed)
        return k, v, tok, pos, hi, lo

    t0 = time.time()
    st = step(*st)
    print(f"[ledger] compile+warm {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    with profile_trace(trace_dir):
        for _ in range(n_steps):
            st = step(*st)
    wall = time.perf_counter() - t0
    tok_s = chunk * n_steps / wall
    print(f"[ledger] decode {tok_s:.1f} tok/s", file=sys.stderr)
    return {"workload": "decode", "ctx": ctx, "chunk": chunk, "qmode": qmode,
            "n_steps": n_steps * chunk, "tok_s": round(tok_s, 2)}


def run_prefill(trace_dir: str) -> dict:
    """Trace the pallas-fast prefill chunk program (12.1k tok/s path)."""
    import jax.numpy as jnp
    import numpy as np

    from qwen3_tpu.models import forward, init_kv_cache
    from qwen3_tpu.utils.profiling import profile_trace

    ctx = int(os.environ.get("LEDGER_CTX", "1024"))
    width = int(os.environ.get("LEDGER_CHUNK", "512"))
    qmode = os.environ.get("LEDGER_QMODE", "pallas-fast")
    n_steps = int(os.environ.get("LEDGER_STEPS", "4"))
    cfg, params = _params(ctx, qmode)
    k, v = init_kv_cache(cfg, 1, ctx, jnp.bfloat16)
    toks = jnp.full((1, width), 7, jnp.int32)
    attn = os.environ.get("LEDGER_ATTN", "dense")

    def step(k, v):
        lg, k, v = forward(params, cfg, toks, k, v, jnp.int32(0), mode=qmode,
                           attn=attn, last_pos=jnp.int32(width - 1))
        np.asarray(lg[0, 0, :8])
        return k, v

    t0 = time.time()
    k, v = step(k, v)
    print(f"[ledger] compile+warm {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    with profile_trace(trace_dir):
        for _ in range(n_steps):
            k, v = step(k, v)
    wall = time.perf_counter() - t0
    tok_s = width * n_steps / wall
    print(f"[ledger] prefill {tok_s:.0f} tok/s (width {width})",
          file=sys.stderr)
    return {"workload": "prefill", "ctx": ctx, "width": width, "qmode": qmode,
            "attn": attn, "n_steps": n_steps, "tok_s": round(tok_s, 1)}


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "batched"
    if which == "parse":
        trace_dir = sys.argv[2]
        n = int(os.environ.get("LEDGER_STEPS", "1"))
        ops, span = device_op_durations(load_trace_events(trace_dir))
        print_ledger("parse", make_ledger(ops, span, n), {"dir": trace_dir})
        return 0
    trace_dir = os.environ.get("LEDGER_DIR",
                               f"/tmp/ledger_{which}_{int(time.time())}")
    meta = {"batched": run_batched, "decode": run_decode,
            "prefill": run_prefill}[which](trace_dir)
    ops, span = device_op_durations(load_trace_events(trace_dir))
    ledger = make_ledger(ops, span, meta["n_steps"])
    print_ledger(which, ledger, meta)
    return 0


if __name__ == "__main__":
    sys.exit(main())
