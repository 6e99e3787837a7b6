"""Multi-host (pod slice) support over DCN.

The reference never crosses a process boundary (SURVEY.md §2.3). Scaling past
one host is the standard JAX recipe: every host runs the same program,
`jax.distributed.initialize` wires the processes together, and the (dp, tp)
mesh from parallel/sharding.py simply spans all global devices — XLA routes
intra-slice collectives over ICI and inter-host traffic over DCN. Keep "tp"
within a host/slice (n_kv_heads <= 8 bounds useful tp anyway) and let "dp"
span hosts so only data-parallel traffic crosses DCN.

This module cannot be exercised in a single-host environment; the sharding
itself is validated on a virtual 8-device mesh (tests/test_sharding.py) and
via the driver's dryrun_multichip entry point.
"""

from __future__ import annotations

import jax

from qwen3_tpu.parallel.sharding import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed. With TPU metadata available (GCE/GKE),
    all arguments are auto-discovered and may be None."""
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
    return jax.process_index() == 0
