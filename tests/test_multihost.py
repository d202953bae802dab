"""Real multi-process `jax.distributed` bring-up (SURVEY §5 distributed
comm backend): two OS processes, each with 2 virtual CPU devices, join one
coordinator, build one GLOBAL 4-device mesh, and run a psum + a sharded
matmul across process boundaries."""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})

    from inferix_tpu.core.config import ParallelConfig
    from inferix_tpu.parallel.multihost import (
        initialize_multihost, make_global_mesh, is_coordinator)

    ok = initialize_multihost()
    assert ok, "distributed runtime did not initialize"
    assert jax.process_count() == 2
    assert jax.device_count() == 4, jax.device_count()

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_global_mesh(ParallelConfig(dp=2, sp=1, tp=2, pp=1))

    # global array sharded across BOTH processes; psum crosses the boundary
    x = jax.make_array_from_callback(
        (4, 8),
        NamedSharding(mesh, P("dp", "tp")),
        lambda idx: jnp.ones((2, 4)) * (jax.process_index() + 1.0),
    )

    @jax.jit
    def total(v):
        return jnp.sum(v)

    t = float(total(x))
    # rows 0:2 live on process 0 (value 1), rows 2:4 on process 1 (value 2)
    # -> 2*8*1 + 2*8*2 = 48
    assert abs(t - 48.0) < 1e-6, t

    w = jax.device_put(
        jnp.eye(8, dtype=jnp.float32),
        NamedSharding(mesh, P("tp", None)))

    @jax.jit
    def mm(a, b):
        return a @ b

    y = mm(x, w)
    assert y.shape == (4, 8)
    assert abs(float(jnp.sum(y)) - 48.0) < 1e-6
    if is_coordinator():
        print("MULTIHOST_OK", t)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo))
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(pid),
        })
        env.pop("PYTEST_CURRENT_TEST", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
    assert any("MULTIHOST_OK" in o for o in outs), outs
