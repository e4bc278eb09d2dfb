"""Two-JAX-process distributed rendezvous test (slow tier).

Executes `parallel/distributed.py` in its intended mode — ≥2 processes,
localhost coordinator, virtual CPU devices per process — and asserts the
global-batch numerics match a single-process run (VERDICT r3 item 5;
SURVEY.md §2.8: the reference's distributed hooks are dead code, so this
capability has no reference counterpart to compare against).

Each worker is a fresh interpreter with the axon sitecustomize disabled
(env -u PALLAS_AXON_POOL_IPS) so it lands on the CPU backend; see
tools/distributed_smoke.py for the worker body.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_rendezvous_matches_single(tmp_path):
    port = _free_port()
    worker = os.path.join(REPO, "tools", "distributed_smoke.py")
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"proc{pid}.json"
        outs.append(out)
        env = {
            k: v for k, v in os.environ.items()
            if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")
        }
        env.update(
            {
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
                "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(pid),
            }
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, "--out", str(out)],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    recs = [json.load(open(o)) for o in outs]
    assert [r["process_index"] for r in recs] == [0, 1]
    for r in recs:
        assert r["process_count"] == 2
        assert r["global_devices"] == 4
        assert r["local_devices"] == 2

    # both processes observe the identical global loss (SPMD: same program,
    # same global batch)
    np.testing.assert_allclose(
        recs[0]["train_stats"]["loss"], recs[1]["train_stats"]["loss"],
        rtol=0, atol=0,
    )

    # single-process oracle on the same deterministic global batch
    oracle_out = tmp_path / "single.json"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, worker, "--single", "--out", str(oracle_out),
         "--total_b", "4"],
        env=env, cwd=REPO, capture_output=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout.decode()[-3000:]
    oracle = json.load(open(oracle_out))

    # 1-device and 4-device programs compile differently (conv algo /
    # reduction order), so allow float-assoc noise; a sharding bug (e.g.
    # a half-batch mean) would be an O(1) divergence, not 1e-4.
    for k in ("loss", "seg_loss", "vote_loss"):
        np.testing.assert_allclose(
            recs[0]["train_stats"][k], oracle["train_stats"][k],
            rtol=1e-3, atol=1e-5,
        )
    np.testing.assert_allclose(
        recs[0]["eval_seg_mean"], oracle["eval_seg_mean"], rtol=1e-3,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        recs[0]["eval_vertex_mean"], oracle["eval_vertex_mean"], rtol=1e-3,
        atol=1e-5,
    )
