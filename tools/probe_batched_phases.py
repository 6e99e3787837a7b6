"""Split the B=64 bench batched stage into admission vs decode wall time.

The bench's batched number covers submit -> all-done: batched admission
(prefill_slots_chunk groups) + the decode chunks. When the aggregate moves
but the traced decode step doesn't, this probe says which phase moved.

    python tools/probe_batched_phases.py [batch] [seq]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
CACHE = REPO / ".cache"
PRESET = os.environ.get("BENCH_PRESET", "qwen3-4b")
PROMPT = ("the thinker thought the thought and the thought thought in "
          "the thinker")


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    seq = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from qwen3_tpu.config import PRESETS
    from qwen3_tpu.io.device_synth import synth_device_params
    from qwen3_tpu.runtime.batched import BatchedEngine, Request

    cfg = PRESETS[PRESET].with_seq_len(seq)
    params = synth_device_params(cfg, seq, seed=0,
                                 exec_cache=str(CACHE / "exec"))
    eng = BatchedEngine(
        str(CACHE / f"{PRESET}.bin"), max_batch=batch, seq_len=seq,
        mode="pallas-fast", temperature=0.0, kv_dtype="int8",
        prefill_bucket=64, decode_chunk=32, attn="dense", side_buffer=True,
        model_cfg=cfg, params=params, aot_dir=str(CACHE / "exec"))

    def run() -> tuple:
        reqs = [eng.submit(Request(prompt=PROMPT + f" {i}", seed=i,
                                   max_tokens=64)) for i in range(batch)]
        t0 = time.perf_counter()
        eng._admit()
        t_admit = time.perf_counter() - t0
        n_steps = 0
        t0 = time.perf_counter()
        while any(s.req for s in eng._slots) or eng._queue:
            eng._admit()
            eng._step()
            n_steps += 1
        t_decode = time.perf_counter() - t0
        total = sum(len(r.out_ids) for r in reqs)
        return t_admit, t_decode, n_steps, total

    print("[probe] compile + warm...", flush=True)
    run()
    t_admit, t_decode, n_steps, total = run()
    print(f"[probe] B={batch} seq={seq}: admission {t_admit*1e3:.0f} ms, "
          f"decode {t_decode*1e3:.0f} ms over {n_steps} chunks "
          f"({t_decode*1e3/max(n_steps,1):.1f} ms/chunk), "
          f"{total} tokens -> {total/(t_admit+t_decode):.1f} tok/s "
          f"aggregate", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
