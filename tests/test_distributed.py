"""True multi-process validation of the distributed runtime
(`parallel/distributed.py`): a 2-process jax.distributed CPU cluster (Gloo
collectives) runs the data-parallel EM over a global (data, component)
mesh and must match the single-process fit — the closest a single machine
gets to a 2-host pod slice (SURVEY §4: the standard JAX fake-cluster
technique)."""
import os
import pathlib
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_data_parallel_em():
    worker = pathlib.Path(__file__).parent / "_distributed_worker.py"
    port = _free_port()
    # the suite's conftest exports XLA_FLAGS=--xla_force_host_platform_
    # device_count=8; the workers model one chip per host, so clear it
    env = {**os.environ, "XLA_FLAGS": ""}
    procs = [subprocess.Popen([sys.executable, str(worker), str(port),
                               str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        assert "WORKER_OK" in out, out[-3000:]
