"""Multi-process (DCN-role) scenario-parallel MPC: 2 OS processes x 4 virtual
CPU devices run ONE global BatchedMpc step over an 8-device mesh, each feeding
its process-local scenario shard (parallel/mesh.py multihost_mesh +
from_process_local — the >=2-host axis of BASELINE.md, SURVEY.md §2c, with
jax.distributed's Gloo backend standing in for DCN).

The workers are separate interpreters (tools/multihost_worker.py): JAX's
distributed runtime cannot be initialized twice in one process, and true
multi-process is the thing under test.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_scenario_mesh():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), "2", str(port), "8", "4"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, err[-3000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for rank, res in enumerate(outs):
        assert res["rank"] == rank
        assert res["global_devices"] == 8
        assert res["global_batch"] == 16          # 2 procs x 8 local scenarios
        assert res["alpha_min"] == 1.0            # every scenario accepted
        assert res["viol"] < 1e-5                 # all converged
    # The fleet reduction (mean over the GLOBAL batch) must agree across
    # hosts. Exact float equality is the invariant under test: the Gloo
    # allreduce is bitwise deterministic and every rank sees the identical
    # reduced value. If a backend/topology change ever breaks bitwise
    # reproducibility, relax to rel-1e-12 — but do so knowingly.
    assert outs[0]["viol"] == outs[1]["viol"]
    assert outs[0]["cost"] == outs[1]["cost"]
