"""qwen3-tpu: a TPU-native Q8_0 inference framework for Qwen3-architecture models.

Built from scratch in JAX/XLA/Pallas with the capability surface of the C reference
engine (teleprint-me/qwen3.c): model export, checkpoint/tokenizer loading, a quantized
forward pass (GQA + QK-RMSNorm + RoPE theta 1e6 + SwiGLU), temperature/top-p sampling
with xorshift-reproducible seeding, completion + chat with thinking-mode templates —
plus the scale-out capabilities the reference lacks: batched prefill, continuous
batching, int8 KV cache, tensor-parallel sharding over a TPU mesh.
"""

__version__ = "0.1.0"

from qwen3_tpu.config import ModelConfig  # noqa: F401
