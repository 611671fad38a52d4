"""Driver-contract regression tests for __graft_entry__.py.

Round 1 shipped a dryrun_multichip that called jax.devices() *before*
updating jax_num_cpu_devices, so the driver's fresh-subprocess invocation
crashed with "config should be updated before backends are initialized"
(MULTICHIP_r01.json, rc=1). These tests invoke the contract exactly the way
the driver does — a fresh subprocess with the container's default
environment (TPU plugin registered by sitecustomize, env vars stomped) —
so that regression can never ship silently again.

The subprocess must never touch the real TPU: dryrun_multichip pins the
CPU backend via jax.config before any backend initialisation.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_fresh(code: str, timeout: int = 600) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # Undo conftest's CPU pin so the subprocess sees the driver's default
    # environment (sitecustomize re-pins the TPU plugin regardless).
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_dryrun_multichip_8_fresh_subprocess():
    proc = _run_fresh(
        "import sys; sys.path.insert(0, '.')\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    assert proc.returncode == 0, (
        f"driver contract failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
    assert "dryrun_multichip(8): ok" in proc.stdout
    # The dryrun must not have initialised the TPU backend.
    assert "Platform 'axon'" not in proc.stderr


def test_dryrun_multichip_runs_on_cpu_backend():
    proc = _run_fresh(
        "import sys; sys.path.insert(0, '.')\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
        "import jax\n"
        "assert jax.devices()[0].platform == 'cpu', jax.devices()\n"
        "print('platform-ok')\n"
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "platform-ok" in proc.stdout
