"""Pre-build a checkpoint's packed-tensor disk cache on the CPU platform.

The pack (`<ckpt>.pack/<mode>/`, models.load_params) is a pure function of
the checkpoint bytes + mode — platform-independent — so it can be built
while the TPU is busy serving something else. Usage:

    python tools/pack_ckpt.py .cache/deepseek-r1-qwen3-8b.bin [mode]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the TPU tunnel

from qwen3_tpu.models import load_params  # noqa: E402


def main() -> int:
    path = sys.argv[1]
    mode = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    t0 = time.time()
    cfg, _ = load_params(path, mode=mode, max_seq_len=2048)
    print(f"packed {path} mode={mode} ({cfg.n_layers} layers) "
          f"in {time.time()-t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
