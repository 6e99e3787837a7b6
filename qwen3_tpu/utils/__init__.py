from qwen3_tpu.utils.logging import log  # noqa: F401
from qwen3_tpu.utils.profiling import profile_trace  # noqa: F401
