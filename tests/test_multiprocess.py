"""2-process DCN-path exercise: jax.distributed over a localhost coordinator.

The multi-process branches (``initialize_distributed`` with a real process
group, ``make_array_from_process_local_data`` with ``process_count > 1``)
are dead code under the in-process virtual mesh; this test runs them for
real with two CPU-backend subprocesses (VERDICT r2 next #6).  Reference
counterpart: multinode FSDP via accelerate (pretrain/readme.md:23).
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    repo = Path(__file__).resolve().parent.parent
    worker = Path(__file__).resolve().parent / "multiproc_worker.py"
    port = _free_port()
    procs, outs = [], []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            {
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(rank),
                "PYTHONPATH": str(repo),
            }
        )
        out = tmp_path / f"rank{rank}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), str(out)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                cwd=str(repo),
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    assert {r["rank"] for r in results} == {0, 1}
    # the jitted step all-reduces over the data axis: every process must
    # observe the identical global loss trajectory
    np.testing.assert_allclose(
        results[0]["losses"], results[1]["losses"], rtol=1e-6
    )
    assert len(results[0]["losses"]) == 3
