"""Probe: host->device transfer bandwidth through the axon tunnel, and
disk/mmap read speed, to attribute load_params time."""
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def log(msg):
    print(f"[xfer] {msg}", file=sys.stderr, flush=True)


# disk read speed of a pack dir (mmap page-in proxy) — first cached pack
_packs = sorted(REPO.glob(".cache/*.bin.pack/pallas"))
if not _packs:
    log("no pallas pack under .cache/ — skipping disk-read probe "
        "(build one with tools/pack_ckpt.py)")
    sys.exit(0)
pack = _packs[0]
t0 = time.time()
n = 0
for f in sorted(pack.glob("*.npy"))[:6]:
    a = np.load(f, mmap_mode="r")
    n += a.nbytes
    s = 0
    # touch every page
    _ = np.asarray(a[..., ::4096]).sum() if a.ndim else None
log(f"mmap page-touch of {n/1e9:.2f} GB in {time.time()-t0:.1f}s")

t0 = time.time()
f = sorted(pack.glob("*.npy"), key=lambda p: -p.stat().st_size)[0]
sz = f.stat().st_size
with open(f, "rb") as fh:
    while fh.read(1 << 24):
        pass
log(f"sequential read {sz/1e9:.2f} GB in {time.time()-t0:.1f}s "
    f"({sz/1e9/(time.time()-t0):.2f} GB/s)")

import jax
import jax.numpy as jnp

log(f"devices: {jax.devices()}")

for mb in (64, 256, 1024):
    a = np.random.randint(-127, 127, size=(mb << 20,), dtype=np.int8)
    t0 = time.time()
    d = jnp.asarray(a)
    _ = np.asarray(d[:8])
    dt = time.time() - t0
    log(f"transfer {mb} MB (fresh ndarray): {dt:.1f}s ({mb/1024/dt:.3f} GB/s)")

# transfer straight from a read-only mmap (the load_params path)
big = np.load(f, mmap_mode="r")
t0 = time.time()
d = jnp.asarray(big)
_ = np.asarray(d.ravel()[:8])
dt = time.time() - t0
log(f"transfer {big.nbytes/1e9:.2f} GB (mmap): {dt:.1f}s "
    f"({big.nbytes/1e9/dt:.2f} GB/s)")
print('{"ok": true}')
