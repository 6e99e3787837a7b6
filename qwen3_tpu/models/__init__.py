from qwen3_tpu.models.qwen3 import (  # noqa: F401
    forward,
    init_kv_cache,
    init_params,
    load_params,
    materialize_params,
)
