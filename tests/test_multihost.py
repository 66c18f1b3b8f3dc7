"""Multi-host (DCN) runtime integration: 2 real JAX processes.

The reference never leaves one process; SURVEY.md §5 mandates a
distributed communication backend with multi-host scaling.  This test
spawns two OS processes, each owning 4 virtual CPU devices, joined through
``jax.distributed.initialize`` with gloo CPU collectives into one
(hosts=2, chips=4) mesh.  Each process feeds only its own station's bytes
(feeder fan-out); the sharded WBFM chain's halo exchanges cross the
process boundary; process 0 validates the assembled audio against the
serial chain.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_wbfm(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTEST_CURRENT_TEST")}
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache")
    repo_root = os.path.dirname(os.path.dirname(_WORKER))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", coordinator,
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=repo_root, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))

    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {i} rc={p.returncode}\n{outs[i][-4000:]}")
    assert (tmp_path / "ok").exists(), "process 0 never validated output"
