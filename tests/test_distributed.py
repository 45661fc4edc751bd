"""Multi-host bring-up: a REAL 2-process ``jax.distributed`` launch on CPU.

SURVEY.md section 5 (distributed backend) prescribes ``jax.distributed``
multi-host launch; ``parallel.mesh.init_distributed`` existed since round
2 but had no caller. This test spawns two OS processes, each with 2
virtual CPU devices, brings up the 4-device global mesh through
``jax.distributed.initialize``, runs the sharded batched OBCA solve with
each process contributing its local shard, and asserts the gathered
result is identical to a single-process solve (see distributed_worker.py
for the in-worker assertions).
"""

import os
import socket
import subprocess
import sys

import pytest

_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_solve_matches_local():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_DIR, "distributed_worker.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    sums = []
    for out in outs:
        ok = [ln for ln in out.splitlines() if ln.startswith("DIST_OK")]
        assert ok, out
        sums.append(ok[0].split()[1])
    # both processes computed the identical global result
    assert sums[0] == sums[1], sums
