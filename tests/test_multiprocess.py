"""True multi-process bring-up: 2 CPU processes through the env-var path.

VERDICT r3 #7: `maybe_initialize_distributed` fires on env vars but was never
executed with more than one process — a typo in that path would surface only
on a real pod. This spawns 2 subprocesses that reach
jax.distributed.initialize via mesh_from_config (JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID), build one global (1,4,1) mesh over
2x2 virtual CPU devices, and run a seq-sharded sparse-causal gather whose
ppermute/psum cross the process boundary. Replaces the reference's
`accelerate launch` scaffolding (test_fatezero.py:69-72).
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
CHILD = os.path.join(os.path.dirname(__file__), "_twoprocess_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cpu_bringup():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # child sets its own device count
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert f"RESULT process={pid}" in out, out[-4000:]
