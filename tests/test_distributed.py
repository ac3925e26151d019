"""Real multi-process jax.distributed smoke test (2 processes on
localhost, CPU backend, 4 virtual devices each -> an 8-device
(2 dp-hosts x 4 tp) pod mesh).

Exercises parallel.distributed.initialize_distributed + make_pod_mesh
the way a 2-host TPU pod launch would (the BASELINE.md >=85% 2-host
north star's bootstrap path): each process initializes against a shared
coordinator, builds the DCN-aware mesh, runs a psum over BOTH axes, and
checks the global result. The reference has no multi-node compute at
all (SURVEY.md §2.3) — this is TPU-native new design.

Runs as subprocesses so the test harness's own JAX runtime is never
re-initialized. Skips cleanly where the distributed service cannot
bind (sandboxed CI).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["QLLM_REPO"])

from qllm_tpu.parallel.distributed import (
    initialize_distributed, is_multihost, make_pod_mesh,
)

pid = initialize_distributed(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PID_IDX"]),
)
assert jax.process_count() == 2, jax.process_count()
assert is_multihost()
assert pid == int(os.environ["PID_IDX"])

mesh = make_pod_mesh()  # defaults: dp = hosts = 2, tp = local = 4
assert mesh.shape == {"dp": 2, "tp": 4}, mesh.shape

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# global [8, 8] array sharded (dp, tp); psum over both axes must see
# every shard, including the DCN (cross-process) dp axis
arr = jax.make_array_from_callback(
    (8, 8),
    NamedSharding(mesh, P("dp", "tp")),
    lambda idx: jnp.ones((4, 2), jnp.float32),
)
total = jax.jit(
    lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
)(arr)
assert float(total) == 64.0, float(total)
print(f"proc {pid} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pod_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    env_base = {
        **os.environ,
        "QLLM_REPO": repo,
        "COORD": coord,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    }
    procs = []
    for i in range(2):
        env = {**env_base, "PID_IDX": str(i)}
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("distributed coordinator timed out (sandboxed env)")
        outs.append(out)
    if any(p.returncode for p in procs):
        msg = "\n---\n".join(outs)
        if "UNAVAILABLE" in msg or "Permission" in msg or "bind" in msg:
            pytest.skip(f"distributed service unavailable here: {msg[-300:]}")
        raise AssertionError(msg)
    assert all("OK" in o for o in outs), outs
