"""Real multi-process distributed run (SURVEY §2.4 / STATUS gap #4).

The emulated-mesh tests (test_sharding.py) validate SPMD math on one
process. This test validates the actual multi-host code path
(parallel/distributed.initialize_distributed → jax.distributed.initialize,
gloo CPU collectives): two OS processes, each owning 2 CPU devices, form
one 4-device global mesh and run a data-parallel loss+grad step where each
process feeds only its local batch shard. Both must agree with a
single-process run on the full batch.

On a TPU pod the identical code path runs over ICI/DCN (the mesh layer is
process-count agnostic); gloo stands in for the fabric here.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_data_parallel_grads_match_single_process(tmp_path):
    nproc = 2
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if "axon" not in v.lower() or k == "PATH"
    }
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_mp_worker.py"),
             str(pid), str(nproc), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    # single-process ground truth on the full batch (this pytest process)
    from tests._mp_case import make_case

    case = make_case()
    loss_1, grads_1 = case["grad_fn"](case["params"], *case["batch"])
    l1_1 = float(
        sum(np.abs(np.asarray(g)).sum()
            for g in jax.tree_util.tree_leaves(grads_1))
    )

    for pid in range(nproc):
        with open(tmp_path / f"proc{pid}.json") as f:
            got = json.load(f)
        assert got["pid"] == pid
        np.testing.assert_allclose(got["loss"], float(loss_1), rtol=1e-5)
        np.testing.assert_allclose(got["grad_l1"], l1_1, rtol=5e-5)
        # checkpoint round trip: every process restored the state it saved
        np.testing.assert_allclose(
            got["restored_l1"], got["saved_l1"], rtol=1e-6
        )
        assert got["restored_step"] == 1

    # the collective save produced ONE checkpoint
    assert sorted(os.listdir(tmp_path / "shared_ckpt")) == ["step_1"]

    # single-writer metrics: only the primary host wrote events
    events = tmp_path / "runs" / "mp" / "events.jsonl"
    with open(events) as f:
        records = [json.loads(line) for line in f]
    assert len(records) == 1, records
    assert records[0]["tag"] == "mp/loss"
    np.testing.assert_allclose(records[0]["train"], float(loss_1), rtol=1e-5)
