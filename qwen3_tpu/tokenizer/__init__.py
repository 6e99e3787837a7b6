from qwen3_tpu.tokenizer.bpe import Tokenizer  # noqa: F401
