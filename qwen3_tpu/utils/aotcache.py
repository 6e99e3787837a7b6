"""Cross-process compiled-executable cache.

The persistent XLA compilation cache does not hit across processes on the
tunneled axon TPU backend, so every fresh process pays the full compile
(minutes for model-sized programs) — which is exactly what a hard-timeout
driver run cannot afford. This caches the compiled EXECUTABLE itself
(jax.experimental.serialize_executable) keyed by the sha256 of the lowered
StableHLO + device kind: any code, shape, or static-arg change re-keys
automatically, so there is no manual version bookkeeping.

Falls back to a plain compile when the backend can't (de)serialize
executables (guarded — some PJRT plugins don't implement it).
"""

from __future__ import annotations

import hashlib
import pickle
from pathlib import Path
from typing import Callable


def aot_cached(lowered, cache_dir: str | Path, name: str,
               log: Callable[[str], None] = lambda s: None):
    """Compile `lowered` (a jax.stages.Lowered) with an executable cache
    under `cache_dir`. Returns a jax.stages.Compiled."""
    import jax

    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
            serialize,
        )
    except ImportError:
        return lowered.compile()

    if len(jax.devices()) != 1:
        # deserialize_and_load remaps the executable onto ALL visible
        # devices (observed: a 1-device serving program reloaded under the
        # 8-virtual-CPU test mesh demands 8 input shards and refuses
        # unsharded args). The cache is only trustworthy on single-device
        # backends — e.g. the tunneled TPU this exists for.
        return lowered.compile()

    dev = jax.devices()[0]
    key = hashlib.sha256(
        (jax.__version__ + dev.device_kind + lowered.as_text()).encode()
    ).hexdigest()[:24]
    path = Path(cache_dir) / f"{name}_{key}.pkl"
    if path.exists():
        try:
            ser, in_tree, out_tree = pickle.loads(path.read_bytes())
            compiled = deserialize_and_load(ser, in_tree, out_tree)
            log(f"{name}: loaded compiled executable from {path.name}")
            return compiled
        except Exception as e:
            log(f"{name}: executable cache load failed ({e}); recompiling")
    compiled = lowered.compile()
    try:
        path.parent.mkdir(parents=True, exist_ok=True)
        blob = pickle.dumps(serialize(compiled))
        tmp = path.with_name(path.name + ".tmp")
        tmp.write_bytes(blob)
        tmp.rename(path)   # atomic publish (same pattern as the pack cache)
        log(f"{name}: cached compiled executable ({len(blob) / 1e6:.1f} MB)")
    except Exception as e:
        log(f"{name}: executable cache save failed ({e})")
    return compiled
