"""Multi-process distributed execution test.

Two OS processes (2 virtual CPU devices each) joined by
``jax.distributed.initialize`` into one 4-device mesh solve the n=100 golden
system across the process boundary — the stand-in for the reference's
jsrun multi-node runs (reference: test_all.py:136-161), exercising
``initialize_distributed`` (parallel/mesh.py) and cross-process collectives
(Gloo on CPU; ICI/DCN on real pods).

Skipped when the coordinator port can't be bound (sandboxed CI).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        try:
            s.bind(("127.0.0.1", 0))
        except OSError:
            pytest.skip("cannot bind local ports in this environment")
        return s.getsockname()[1]


def test_two_process_golden():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "PYTEST_CURRENT_TEST"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2000:]}"
        assert f"GOLDEN_OK process {i}/2" in out, out[-2000:]
