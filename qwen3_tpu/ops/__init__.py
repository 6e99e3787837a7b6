from qwen3_tpu.ops.q8 import quantize_act, dequantize  # noqa: F401
from qwen3_tpu.ops.quant_matmul import q8_matmul_exact, q8_matmul_bf16  # noqa: F401
from qwen3_tpu.ops.norms import rmsnorm  # noqa: F401
from qwen3_tpu.ops.rope import rope_tables, apply_rope  # noqa: F401
from qwen3_tpu.ops.activations import swiglu  # noqa: F401
