"""Generate the synthetic deepseek-r1-qwen3-8b .bin + tokenizer sidecar.

One-time artifact for the real end-to-end 8B serve (VERDICT r2 #8): the
full load -> pack cache -> serve.py path on the actual multi-GB file, as
opposed to the device-synthesized params the long-context bench uses.
seq_len is written as 32768 (the serving context) rather than the preset's
131072 so the header-clamped context matches the benched configuration.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from pathlib import Path

from qwen3_tpu.config import PRESETS
from qwen3_tpu.io.checkpoint import write_checkpoint
from qwen3_tpu.io.synthetic import synthetic_tokenizer, synthetic_weights
from qwen3_tpu.io.tokenizer_bin import write_tokenizer_bin

# env overrides mirror tools/e2e_8b.py so the stage logic is dry-runnable
# against a tiny preset on CPU (tests/test_e2e_tool.py)
PRESET = os.environ.get("QWEN3_E2E_PRESET", "deepseek-r1-qwen3-8b")
SEQ_LEN = int(os.environ.get("QWEN3_E2E_SEQ_LEN", "32768"))


def main() -> int:
    cache = Path(os.environ.get(
        "QWEN3_E2E_CACHE", Path(__file__).resolve().parent.parent / ".cache"))
    cache.mkdir(exist_ok=True)
    path = cache / f"{PRESET}.bin"
    cfg = dataclasses.replace(PRESETS[PRESET],
                              seq_len=min(SEQ_LEN, PRESETS[PRESET].seq_len))
    if not path.exists():
        t0 = time.time()
        print(f"generating {PRESET} weights...", flush=True)
        w = synthetic_weights(cfg, seed=0)
        print(f"weights in RAM after {time.time()-t0:.0f}s; writing...",
              flush=True)
        write_checkpoint(str(path), w)
        print(f"wrote {path} ({path.stat().st_size/2**30:.2f} GiB) "
              f"in {time.time()-t0:.0f}s", flush=True)
    tok = cache / f"{PRESET}.bin.tokenizer"
    if not tok.exists():
        write_tokenizer_bin(str(tok), synthetic_tokenizer(cfg.vocab_size))
        print(f"wrote {tok}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
