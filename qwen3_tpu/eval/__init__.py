from qwen3_tpu.eval.perplexity import perplexity, sequence_nll  # noqa: F401
