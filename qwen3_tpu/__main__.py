"""`python -m qwen3_tpu` — the runq-compatible CLI (mirrors the reference's
`python -m qwen3` packaging convention, qwen3/__main__.py:14-41, but runs
inference; export lives at `python -m qwen3_tpu.io.hf_export`)."""
from qwen3_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
