"""Multi-host plumbing (parallel/multihost.py), exercised for REAL: two OS
processes joined through the actual jax.distributed coordination service,
gloo CPU collectives standing in for DCN, a (dp=2, tp=2) global mesh spanning
both processes' devices, and a cross-process psum through shard_map.

Runs as subprocesses because jax.distributed can only be initialized once
per process (and the test session's jax is already initialized single-host).
"""

import os
import pathlib
import socket
import subprocess
import sys
import textwrap

_REPO = str(pathlib.Path(__file__).resolve().parents[1])

_WORKER = textwrap.dedent("""
    import os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from qwen3_tpu.parallel import multihost
    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=2, process_id=pid)
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = multihost.global_mesh(tp=2)
    assert len(jax.devices()) == 4, jax.devices()
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \\
        {"dp": 2, "tp": 2}, mesh
    fn = jax.jit(jax.shard_map(lambda x: jax.lax.psum(x, "dp"), mesh=mesh,
                               in_specs=P("dp"), out_specs=P()))
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")),
        np.full((1, 4), float(pid + 1), np.float32), (2, 4))
    out = np.asarray(fn(x))
    assert out[0, 0] == 3.0, out            # 1.0 (proc 0) + 2.0 (proc 1)
    print(f"OK pid={pid} primary={multihost.is_primary()}")
""")


def test_two_process_mesh_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ,
               PYTHONPATH=_REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                              ""))
    last = None
    # under full-suite load the 1-core host can serialize the two workers'
    # jax imports past gloo's connect window — retry with a fresh port
    for _ in range(3):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = [subprocess.Popen([sys.executable, str(worker), str(i),
                                   str(port)],
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.PIPE, text=True, env=env)
                 for i in range(2)]
        outs = [p.communicate(timeout=240) for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        last = "\n---\n".join(err[-2000:] for _, err in outs)
    else:
        raise AssertionError(f"workers failed 3 times:\n{last}")
    # gloo logs its peer-connection lines to stdout; the marker is last
    got = sorted(o.strip().splitlines()[-1] for o, _ in outs)
    assert got == ["OK pid=0 primary=True", "OK pid=1 primary=False"], got
