"""A/B the batched engine's decode attention on chip: attn="fused" (the
in-place batched-decode Pallas kernel, ops/pallas/batched_decode.py) vs the
default dense bucket-switch path.

Interleaved samples from one process so the tunnel's hour-scale latency
drift (measured 1832-2262 tok/s for identical configs in one afternoon,
round 4) cancels out of the comparison. Both engines share one
device-resident param pytree; KV caches are per-engine (fused pads rows to
the 256 kernel quantum, dense to 128).

Usage: python tools/ab_fused_attn.py [B] [n_pairs] [seq]
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
    seq = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    cfg, params = bench.get_params()
    bench.ensure_tokenizer(cfg.vocab_size)

    def mk(attn: str) -> BatchedEngine:
        return BatchedEngine(
            str(bench.CACHE / f"{bench.PRESET}.bin"), max_batch=batch,
            seq_len=seq, mode="pallas-fast", temperature=0.0,
            kv_dtype=os.environ.get("AB_KV", "int8"), prefill_bucket=64,
            decode_chunk=32, attn=attn, side_buffer=True, model_cfg=cfg,
            params=params, aot_dir=str(bench.CACHE / "exec"))

    def run(eng: BatchedEngine) -> float:
        reqs = [eng.submit(Request(prompt=bench.PROMPT + f" {i}", seed=i,
                                   max_tokens=64)) for i in range(batch)]
        t0 = time.perf_counter()
        eng.run()
        return sum(len(r.out_ids) for r in reqs) / (time.perf_counter() - t0)

    ea, eb = mk("fused"), mk("dense")
    print(f"fused buckets: {ea._attn_buckets}", flush=True)
    run(ea), run(eb)  # compile/AOT-load + warm
    best_a = best_b = 0.0
    for i in range(pairs):
        a, b = run(ea), run(eb)
        best_a, best_b = max(best_a, a), max(best_b, b)
        print(f"pair {i}: fused {a:7.1f}  dense {b:7.1f}", flush=True)
    print(f"best  : fused {best_a:7.1f}  dense {best_b:7.1f}  "
          f"({(best_a / best_b - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
