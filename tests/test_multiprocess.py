"""Loopback multi-process cluster test — the TPU-native version of the
reference's run-a-cluster-on-one-machine trick (SURVEY.md §4: default
master addr 127.0.0.1, workers bind random local ports).

Two OS processes form a jax.distributed cluster over localhost, each
contributing CPU devices, and run a psum across the global mesh via the
framework's initialize_cluster()."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
sys.path.insert(0, {repo!r})
from lightctr_tpu.parallel.distributed import initialize_cluster

info = initialize_cluster(
    coordinator_address={coord!r},
    num_processes=2,
    process_id={pid},
)
assert info["process_count"] == 2, info
assert info["global_devices"] == 4, info

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
# each process feeds its local shard; psum must see the global sum 1+2+3+4
local = jnp.asarray([float({pid} * 2 + 1), float({pid} * 2 + 2)]).reshape(2, 1)
global_arr = jax.make_array_from_single_device_arrays(
    (4, 1),
    NamedSharding(mesh, P("data")),
    [jax.device_put(local[i : i + 1], d)
     for i, d in enumerate(jax.local_devices())],
)
total = jax.jit(
    jax.shard_map(lambda x: jax.lax.psum(x, "data"), mesh=mesh,
                  in_specs=P("data"), out_specs=P()),
)(global_arr)
val = float(np.asarray(jax.device_get(total))[0, 0])
assert abs(val - 10.0) < 1e-6, val
print("WORKER_OK", {pid}, val)
"""


@pytest.mark.slow
def test_two_process_loopback_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = []
    for pid in range(2):
        code = _WORKER.format(repo=repo, coord=coord, pid=pid)
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        # drop the TPU plugin path: CPU-only loopback cluster
        env["PYTHONPATH"] = repo
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", code],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                env=env,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-2000:]}"
        assert f"WORKER_OK {pid}" in out
