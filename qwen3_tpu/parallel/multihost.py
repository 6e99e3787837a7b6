"""Multi-host (pod slice) support over DCN.

The reference never crosses a process boundary (SURVEY.md §2.3). Scaling past
one host is the standard JAX recipe: every host runs the same program,
`jax.distributed.initialize` wires the processes together, and the (dp, tp)
mesh from parallel/sharding.py simply spans all global devices — XLA routes
intra-slice collectives over ICI and inter-host traffic over DCN. Keep "tp"
within a host/slice (n_kv_heads <= 8 bounds useful tp anyway) and let "dp"
span hosts so only data-parallel traffic crosses DCN.

Exercised for real (two OS processes, the actual jax.distributed
coordination service + gloo CPU collectives standing in for DCN) by
tests/test_multihost.py; the CLI exposes it via --coordinator /
--num-processes / --process-id (every host runs the same command).
"""

from __future__ import annotations

import jax

from qwen3_tpu.parallel.sharding import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed. With TPU metadata available (GCE/GKE),
    all arguments are auto-discovered and may be None.

    On the CPU backend (tests / local rehearsal) cross-process collectives
    need the gloo transport — the TPU backend ignores the setting. Checked
    WITHOUT touching jax.default_backend(): initializing the backend before
    jax.distributed breaks multi-process TPU discovery."""
    import os

    if (jax.config.jax_platforms or
            os.environ.get("JAX_PLATFORMS", "")) == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(tp: int | None = None):
    """A (dp, tp) mesh over all global devices: tp contiguous within a host
    so its all-reduces ride ICI; dp spans hosts over DCN."""
    n = len(jax.devices())
    local = jax.local_device_count()
    if tp is None:
        tp = min(8, local)
    return make_mesh(dp=n // tp, tp=tp)


def is_primary() -> bool:
    """True on the process that should own stdout/stderr streaming (every
    host runs the same program; only one should print)."""
    return jax.process_index() == 0


def agree_seed(seed: int) -> int:
    """Process 0's value, broadcast to every process. The CLI's default seed
    is time(NULL) like the reference (examples/qwen.c:104) — evaluated
    per-process it diverges across hosts and desyncs the replicated RNG
    state feeding the collectives."""
    import numpy as np
    from jax.experimental import multihost_utils

    return int(multihost_utils.broadcast_one_to_all(
        np.asarray(seed, np.int64)))
