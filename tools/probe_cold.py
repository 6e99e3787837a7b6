"""Probe: decompose cold-start time on the real TPU.

Phases timed separately: jax init, load_params (pack mmap + device
transfer), decode_chunk compile (lowering vs backend compile), first
decode run, marginal decode. Run: python tools/probe_cold.py [preset]
"""
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".cache/jaxcache"))

PRESET = sys.argv[1] if len(sys.argv) > 1 else "qwen3-1.7b"
MODE = os.environ.get("PROBE_QMODE", "pallas")
CTX = int(os.environ.get("PROBE_CTX", "1024"))
CHUNK = int(os.environ.get("PROBE_CHUNK", "128"))

T0 = time.time()


def log(msg):
    print(f"[probe +{time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


log("importing jax...")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

log(f"devices: {jax.devices()}")

from qwen3_tpu.models import load_params, init_kv_cache  # noqa: E402
from qwen3_tpu.runtime.decode_loop import decode_chunk  # noqa: E402
from qwen3_tpu.runtime.xorshift import seed_to_device  # noqa: E402

ckpt = str(REPO / f".cache/{PRESET}.bin")
log(f"load_params({PRESET}, {MODE})...")
cfg, params = load_params(ckpt, mode=MODE, max_seq_len=CTX)
# force the transfer to finish: touch one element of each leaf
for leaf in jax.tree_util.tree_leaves(params):
    _ = np.asarray(leaf.ravel()[0])
log(f"load_params done (cfg dim={cfg.dim} layers={cfg.n_layers})")

kv = init_kv_cache(cfg, 1, CTX, jnp.bfloat16)
k, v = kv
hi, lo = seed_to_device(3)
tok = jnp.asarray([7], jnp.int32)  # not bos/eos — those stop the loop

log("lowering decode_chunk...")
t0 = time.time()
kwargs = dict(cfg=cfg, mode=MODE, chunk=CHUNK, temperature=0.0, top_p=0.9,
              greedy=True, bos=1, eos=2, emit_at_limit=False, top_k=64,
              attn="dense")
lowered = decode_chunk.lower(params, k, v, tok, jnp.int32(0),
                             jnp.int32(CTX), hi, lo, **kwargs)
log(f"lowered in {time.time()-t0:.1f}s; compiling...")
t0 = time.time()
compiled = lowered.compile()
log(f"compiled in {time.time()-t0:.1f}s; first run...")
t0 = time.time()
out = compiled(params, k, v, tok, jnp.int32(0), jnp.int32(CTX), hi, lo)
arr = np.asarray(out[0])
log(f"first chunk ({CHUNK} tokens) in {time.time()-t0:.1f}s")
packed, k, v, tok, pos, hi, lo = out
log(f"first chunk emitted n={int(arr[-2])} done={bool(arr[-1])}")
t0 = time.time()
out = compiled(params, k, v, tok, pos, jnp.int32(CTX), hi, lo)
arr = np.asarray(out[0])
dt = time.time() - t0
log(f"second chunk emitted n={int(arr[-2])} in {dt:.2f}s "
    f"-> {CHUNK/dt:.1f} tok/s")
print(f'{{"probe_decode_tok_s": {CHUNK/dt:.2f}}}')
