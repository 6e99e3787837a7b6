"""Perplexity evaluator CLI.

    python -m qwen3_tpu.eval <model.bin> [--text FILE|-] [--qmode MODE]

Computes token-level NLL/perplexity of the model on the given text (stdin by
default) — the quality-acceptance metric vs the reference engine
(BASELINE.md: delta perplexity <= 0.05).
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m qwen3_tpu.eval")
    ap.add_argument("checkpoint")
    ap.add_argument("--text", default="-",
                    help="file with evaluation text ('-' = stdin)")
    ap.add_argument("--qmode", default="pallas",
                    choices=["exact", "bf16", "pallas", "pallas-fast"])
    ap.add_argument("--kv-dtype", default="float32",
                    choices=["float32", "bfloat16", "int8"])
    ap.add_argument("-c", "--ctx", type=int, default=0)
    args = ap.parse_args(argv)

    text = (sys.stdin.read() if args.text == "-"
            else open(args.text, encoding="utf-8").read())

    from qwen3_tpu.eval.perplexity import perplexity, sequence_nll
    from qwen3_tpu.io.checkpoint import read_header
    from qwen3_tpu.models import load_params
    from qwen3_tpu.tokenizer.bpe import Tokenizer

    cfg = read_header(args.checkpoint)
    if args.ctx:
        cfg = cfg.with_seq_len(args.ctx)
    tok = Tokenizer.from_file(args.checkpoint)
    ids = tok.encode(text)
    if len(ids) < 2:
        print("[eval] need at least 2 tokens", file=sys.stderr)
        return 1
    ids = ids[: cfg.seq_len]
    import numpy as np

    import jax.numpy as jnp

    kvd = jnp.dtype(args.kv_dtype)
    _, params = load_params(args.checkpoint, mode=args.qmode,
                            max_seq_len=cfg.seq_len)
    nll = float(np.mean(sequence_nll(params, cfg, ids, mode=args.qmode,
                                     kv_dtype=kvd)))
    ppl = perplexity(params, cfg, ids, mode=args.qmode, kv_dtype=kvd)
    print(f"[eval] tokens={len(ids)} nll/token={nll:.4f} ppl={ppl:.4f}",
          file=sys.stderr)
    print(f'{{"tokens": {len(ids)}, "nll": {nll:.6f}, "ppl": {ppl:.6f}}}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
