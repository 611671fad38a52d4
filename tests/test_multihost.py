"""Multi-host smoke: a real 2-process jax.distributed CPU cluster.

Proves ``parallel.mesh.initialize_multi_host`` + the DP training step work
when the mesh spans processes (DCN in production, local gRPC here): each
worker holds 2 virtual CPU devices, the 4-device mesh spans both, and one
full training step (rotation -> forward -> loss -> psum grads -> Adam)
executes with sharded batch + replicated params.
"""

import os
import socket
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cpu_cluster(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(_ROOT, "tests", "_multihost_worker.py")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            # Generous: the box has a single core and the two workers
            # (plus any concurrent compile) share it; 420 s flaked under
            # load while the idle-box runtime is ~380 s.
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} rc={p.returncode}:\n{out}"
        assert f"MULTIHOST_OK pid={i}" in out, f"worker {i} output:\n{out}"
        assert f"SYNC_STOP_OK pid={i}" in out, f"worker {i} output:\n{out}"
        assert f"STOP_CONSENSUS_OK pid={i}" in out, f"worker {i} output:\n{out}"
        assert "dryrun_multichip(4): ok" in out
