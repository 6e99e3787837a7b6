"""Benchmark: decode tokens/s on the flagship config, TPU vs. the reference
C engine on the same synthetic Q8_0 checkpoint.

Prints ONE JSON line:
  {"metric": "decode_tok_s_per_chip", "value": N, "unit": "tok/s",
   "vs_baseline": ratio, ...extras}

- The checkpoint is synthetic (random Q8 weights with real architecture
  shapes — tokens/s does not depend on weight values) and cached under
  .cache/. The reference engine runs on the *same* file, so the baseline is
  measured, not assumed (the reference publishes no numbers; see BASELINE.md).
- Baseline timing uses the reference's own [tg]/[t/ms] counters from chat
  mode (its only built-in measurement) and is cached in .cache/ because the
  single-core C run is slow.

Env knobs: BENCH_PRESET (default qwen3-4b), BENCH_CTX (default 1024),
BENCH_DECODE_TOKENS (default 128), BENCH_QMODE (default pallas — the fused
int8 kernel path), BENCH_SKIP_BASELINE=1.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
CACHE = REPO / ".cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(CACHE / "jaxcache"))
PRESET = os.environ.get("BENCH_PRESET", "qwen3-4b")
CTX = int(os.environ.get("BENCH_CTX", "1024"))
N_DECODE = int(os.environ.get("BENCH_DECODE_TOKENS", "256"))
PROMPT = "the thinker thought the thought and the thought thought in the thinker"


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def ensure_artifacts() -> str:
    from qwen3_tpu.config import PRESETS
    from qwen3_tpu.io.checkpoint import write_checkpoint
    from qwen3_tpu.io.synthetic import synthetic_tokenizer, synthetic_weights
    from qwen3_tpu.io.tokenizer_bin import write_tokenizer_bin
    import dataclasses

    CACHE.mkdir(exist_ok=True)
    path = CACHE / f"{PRESET}.bin"
    if not path.exists() or not Path(str(path) + ".tokenizer").exists():
        log(f"generating synthetic {PRESET} checkpoint (one-time)...")
        cfg = dataclasses.replace(PRESETS[PRESET], seq_len=max(CTX, 2048))
        t0 = time.time()
        write_checkpoint(str(path), synthetic_weights(cfg, seed=0))
        write_tokenizer_bin(str(path) + ".tokenizer",
                            synthetic_tokenizer(cfg.vocab_size))
        log(f"wrote {path} ({path.stat().st_size/1e9:.2f} GB, "
            f"{time.time()-t0:.0f}s)")
    return str(path)


def measure_engine(ckpt: str) -> dict:
    import numpy as np

    from qwen3_tpu.runtime.engine import Engine, EngineConfig

    greedy = os.environ.get("BENCH_GREEDY", "1") == "1"
    eng = Engine(EngineConfig(
        path=ckpt, seed=3, temperature=0.0 if greedy else 0.8, top_p=0.9,
        seq_len=CTX, mode=os.environ.get("BENCH_QMODE", "pallas"),
        kv_dtype="bfloat16", prefill_chunk=64,
        # 128-token chunks halve the ~26ms-per-dispatch tunnel overhead vs 64:
        # 1.7B decode measured 210 vs 191 tok/s
        decode_chunk=int(os.environ.get("BENCH_DECODE_CHUNK", "128")),
    ))
    tok = eng.tokenizer
    ids = tok.encode(PROMPT)

    # --- warmup / compile (block_until_ready is unreliable on tunneled
    # runtimes, so every measurement synchronizes via a host fetch)
    log("compiling prefill + decode...")
    t0 = time.time()
    res = eng.generate(PROMPT, max_tokens=2 * eng.cfg.decode_chunk)
    eng.reset(batch=1)
    _ = np.asarray(eng._prefill(ids, 0)[0, :8])  # warm prefill+sync path
    log(f"compile+warmup {time.time()-t0:.1f}s "
        f"({res.n_generated} tokens warm)")

    # --- prefill throughput: time chunked prefill with one final fetch
    eng.reset(batch=1)
    reps = 4
    n_chunks = -(-len(ids) // 64)
    t0 = time.perf_counter()
    for _ in range(reps):
        logits = eng._prefill(ids, 0)
    _ = np.asarray(logits[0, :8])  # sync
    prefill_tok_s = reps * n_chunks * 64 / (time.perf_counter() - t0)

    # --- decode throughput: fresh generation, timed portion excludes prefill
    t0 = time.perf_counter()
    res = eng.generate(PROMPT, max_tokens=N_DECODE)
    dt = res.generate_ms / 1e3
    n = res.n_generated
    decode_tok_s = n / dt
    log(f"decode: {decode_tok_s:.2f} tok/s ({dt*1e3/max(n,1):.2f} ms/tok, "
        f"{n} tokens), prefill: {prefill_tok_s:.1f} tok/s")
    return {"decode_tok_s": decode_tok_s, "prefill_tok_s": prefill_tok_s}


def measure_batched(ckpt: str) -> float | None:
    """Aggregate decode tok/s with continuous batching (BASELINE config #4,
    scaled to one chip's HBM)."""
    if os.environ.get("BENCH_SKIP_BATCHED") == "1":
        return None
    from qwen3_tpu.runtime.batched import BatchedEngine, Request

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    n_tok = int(os.environ.get("BENCH_BATCH_TOKENS", "64"))
    eng = BatchedEngine(
        ckpt, max_batch=batch, seq_len=512,
        # serving-throughput kernel by default (quality class of bf16 mode);
        # single-stream measurement keeps the reference-exact kernel
        mode=os.environ.get("BENCH_QMODE", "pallas-fast"),
        temperature=0.0,
        kv_dtype="bfloat16", prefill_bucket=64, decode_chunk=32,
        attn=os.environ.get("BENCH_ATTN", "dense"),
        side_buffer=os.environ.get("BENCH_SIDE", "1") == "1")

    def run() -> float:
        reqs = [eng.submit(Request(prompt=PROMPT + f" {i}", seed=i,
                                   max_tokens=n_tok)) for i in range(batch)]
        t0 = time.perf_counter()
        eng.run()
        dt = time.perf_counter() - t0
        total = sum(len(r.out_ids) for r in reqs)
        return total / dt

    log(f"batched: compiling (batch={batch})...")
    run()  # compile + warm
    tok_s = run()
    log(f"batched decode: {tok_s:.1f} tok/s aggregate over {batch} streams")
    return tok_s


def build_reference() -> Path | None:
    ref_src = Path("/root/reference")
    if not ref_src.exists() or shutil.which("cmake") is None:
        return None
    build = Path("/tmp/qwen3_ref_bench")
    exe = build / "build" / "examples" / "qwen"
    if exe.exists():
        return exe
    try:
        shutil.rmtree(build, ignore_errors=True)
        shutil.copytree(ref_src, build)
        subprocess.run(["cmake", "-S", str(build), "-B", str(build / "build"),
                        "-DCMAKE_BUILD_TYPE=Release"],
                       check=True, capture_output=True)
        subprocess.run(["cmake", "--build", str(build / "build"), "-j", "8"],
                       check=True, capture_output=True)
        return exe
    except subprocess.CalledProcessError as e:
        log(f"reference build failed: {e.stderr[-300:]}")
        return None


def measure_baseline(ckpt: str) -> float | None:
    """Reference C engine tok/s on this host.

    The reference's own [pp/tg] counters only print when a turn ends in EOS
    (src/completion.c:327-340) — random-weight greedy streams never do — so
    we time two completion runs with different context lengths and take the
    marginal positions/second, which cancels load/mmap-page-in time. The
    completion loop costs one full forward per position for prompt and
    generation alike (src/completion.c:57-66), so this is its decode rate.
    """
    cache_file = CACHE / f"baseline_{PRESET}.json"
    if cache_file.exists():
        return json.loads(cache_file.read_text())["decode_tok_s"]
    exe = build_reference()
    if exe is None:
        return None
    c_lo = int(os.environ.get("BENCH_BASELINE_CTX_LO", "32"))
    c_hi = int(os.environ.get("BENCH_BASELINE_CTX_HI", "160"))
    env = dict(os.environ, OMP_NUM_THREADS=str(os.cpu_count() or 1))

    def run(ctx: int) -> float:
        t0 = time.perf_counter()
        r = subprocess.run(
            [str(exe), ckpt, "-m", "completion", "-i", PROMPT, "-t", "0",
             "-p", "0.9", "-s", "3", "-c", str(ctx)],
            capture_output=True, timeout=7200, env=env)
        dt = time.perf_counter() - t0
        assert r.returncode == 0, r.stderr[-300:]
        return dt

    log(f"running reference C engine (ctx {c_lo} then {c_hi}) — "
        "single-core, may take minutes...")
    run(c_lo)  # warm the page cache
    t_lo = run(c_lo)
    t_hi = run(c_hi)
    tok_s = (c_hi - c_lo) / max(t_hi - t_lo, 1e-9)
    log(f"reference: {t_lo:.1f}s @{c_lo} vs {t_hi:.1f}s @{c_hi} "
        f"-> {tok_s:.3f} tok/s")
    cache_file.write_text(json.dumps(
        {"decode_tok_s": tok_s, "ctx_lo": c_lo, "ctx_hi": c_hi,
         "t_lo": t_lo, "t_hi": t_hi, "threads": env["OMP_NUM_THREADS"]}))
    return tok_s


def main() -> None:
    ckpt = ensure_artifacts()
    if os.environ.get("BENCH_SKIP_ENGINE") == "1":  # batched-only run
        tok_s = measure_batched(ckpt)
        print(json.dumps({
            "metric": "batched_decode_tok_s",
            "value": round(tok_s or 0.0, 1), "unit": "tok/s",
            "vs_baseline": None, "preset": PRESET,
            "batch": int(os.environ.get("BENCH_BATCH", "8")),
        }))
        return
    ours = measure_engine(ckpt)
    try:
        batched = measure_batched(ckpt)
    except Exception as e:
        log(f"batched bench failed: {e}")
        batched = None
    baseline = None
    if os.environ.get("BENCH_SKIP_BASELINE") != "1":
        try:
            baseline = measure_baseline(ckpt)
        except Exception as e:  # baseline failure must not sink the bench
            log(f"baseline failed: {e}")
    vs = (ours["decode_tok_s"] / baseline) if baseline else None
    print(json.dumps({
        "metric": "decode_tok_s_per_chip",
        "value": round(ours["decode_tok_s"], 2),
        "unit": "tok/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "prefill_tok_s": round(ours["prefill_tok_s"], 1),
        "batched_tok_s": round(batched, 1) if batched else None,
        "baseline_tok_s": round(baseline, 3) if baseline else None,
        "preset": PRESET, "ctx": CTX,
        "qmode": os.environ.get("BENCH_QMODE", "pallas"),
    }))


if __name__ == "__main__":
    main()
