"""A/B the batched engine's dense-attention bucket dispatch on chip.

Static-bucket (host picks the bucket, per-bucket compiled program) vs the
in-program lax.switch — interleaved samples from one process so the tunnel's
hour-scale latency drift (measured 1832-2262 tok/s for identical configs in
one afternoon, round 4) cancels out of the comparison. Both engines share
one device-resident param pytree; KV caches are per-engine (2x ~2.7 GB int8
at B=64/seq 512 — fits beside the 4.7 GB pack on the 16 GB chip).

Round-4 verdict (v5e, 4B, B=64/seq 512/int8 KV): static 1961 vs switch
2313 tok/s (-15%) — the static 256-row prefix slice of the [B, S, ...]
cache is a B-strided copy at ~110 GB/s where the switch branch extracts
the full layer slab contiguously at ~550 GB/s (ledgers: LEDGER_POS=64
[LEDGER_BUCKET=256] python tools/trace_ledger.py batched). The switch
stays the default; see ops/attention.py:_bucketed and PROFILE.md.

Usage: python tools/ab_static_bucket.py [B] [n_pairs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: param synth + cache paths)
from qwen3_tpu.runtime.batched import BatchedEngine, Request  # noqa: E402


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cfg, params = bench.get_params()
    bench.ensure_tokenizer(cfg.vocab_size)

    def mk(static: bool) -> BatchedEngine:
        os.environ["QWEN3_TPU_STATIC_BUCKET"] = "1" if static else "0"
        return BatchedEngine(
            str(bench.CACHE / f"{bench.PRESET}.bin"), max_batch=batch,
            seq_len=512, mode="pallas-fast", temperature=0.0,
            kv_dtype="int8", prefill_bucket=64, decode_chunk=32,
            attn="dense", side_buffer=True, model_cfg=cfg, params=params,
            aot_dir=str(bench.CACHE / "exec"))

    def run(eng: BatchedEngine) -> float:
        reqs = [eng.submit(Request(prompt=bench.PROMPT + f" {i}", seed=i,
                                   max_tokens=64)) for i in range(batch)]
        t0 = time.perf_counter()
        eng.run()
        return sum(len(r.out_ids) for r in reqs) / (time.perf_counter() - t0)

    ea, eb = mk(True), mk(False)
    assert ea._attn_buckets and not eb._attn_buckets
    print(f"buckets: {ea._attn_buckets}", flush=True)
    run(ea), run(eb)  # compile/AOT-load + warm
    best_a = best_b = 0.0
    for i in range(pairs):
        a, b = run(ea), run(eb)
        best_a, best_b = max(best_a, a), max(best_b, b)
        print(f"pair {i}: static {a:7.1f}  switch {b:7.1f}", flush=True)
    print(f"best  : static {best_a:7.1f}  switch {best_b:7.1f}  "
          f"({(best_a / best_b - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
