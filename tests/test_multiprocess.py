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


def _run_workers(script, nproc, tmp_path, timeout=420, extra_args=()):
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
            [sys.executable, os.path.join(REPO, "tests", script),
             str(pid), str(nproc), str(port), str(tmp_path),
             *map(str, extra_args)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"


@pytest.mark.slow
def test_two_process_data_parallel_grads_match_single_process(tmp_path):
    nproc = 2
    _run_workers("_mp_worker.py", nproc, tmp_path)

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


@pytest.mark.slow
def test_two_process_full_eval_official_metrics_match_single_process(
    tmp_path,
):
    """VERDICT r3 item 5: the host-side official metrics (consensus,
    per-answer-type, perQuestionType, submission export) must survive a
    real multi-process eval — each process feeds its own batch slice, the
    per-sample preds are gathered via host_fetch, and the primary's
    results artifact matches a single-process run exactly."""
    nproc = 2
    _run_workers("_mp_eval_worker.py", nproc, tmp_path)

    # single-process ground truth (this pytest process, 1-device mesh)
    from tests._mp_case import make_eval_solver

    solver = make_eval_solver(
        str(tmp_path), store_sub="store_single", results_sub="single",
        data_axis=1,
    )
    loss_1, acc_1 = solver.val(full=True)
    solver.close()

    # every worker computed the same replicated scalars
    for pid in range(nproc):
        with open(tmp_path / f"proc{pid}_eval.json") as f:
            got = json.load(f)
        np.testing.assert_allclose(got["loss"], float(loss_1), rtol=1e-5)
        np.testing.assert_allclose(got["acc"], float(acc_1), atol=1e-9)

    # the primary-written results record matches single-process exactly
    rec_mp = json.loads(
        (tmp_path / "mp" / "results" / "mhb_coAtt.json").read_text()
    )
    rec_1 = json.loads(
        (tmp_path / "single" / "results" / "mhb_coAtt.json").read_text()
    )
    for rec in (rec_mp, rec_1):
        rec.pop("time")
    assert rec_mp.keys() == rec_1.keys()
    assert "vqa_consensus_accuracy" in rec_mp
    assert rec_mp["per_answer_type"] == rec_1["per_answer_type"]
    assert rec_mp["per_question_type"] == rec_1["per_question_type"]
    np.testing.assert_allclose(
        rec_mp["vqa_consensus_accuracy"], rec_1["vqa_consensus_accuracy"],
        atol=1e-12,
    )
    np.testing.assert_allclose(rec_mp["accuracy"], rec_1["accuracy"],
                               atol=1e-12)

    # submission export: identical rows, written once (by the primary)
    preds_mp = json.loads(
        (tmp_path / "mp" / "results"
         / "mhb_coAtt_predictions.json").read_text()
    )
    preds_1 = json.loads(
        (tmp_path / "single" / "results"
         / "mhb_coAtt_predictions.json").read_text()
    )
    assert preds_mp == preds_1
    assert len(preds_mp) == 24


@pytest.mark.slow
def test_four_process_eval_padded_final_batch(tmp_path):
    """4 processes (8-device mesh) and a val split that does NOT divide the
    batch size: the padded final batch's pad rows (repeated question ids)
    must be masked out of the gathered per-sample metrics on every host,
    and the 4-way process_allgather must agree with single-process. The
    2-process test can't see either failure mode."""
    nproc, n_val = 4, 26
    _run_workers("_mp_eval_worker.py", nproc, tmp_path, timeout=600,
                 extra_args=(n_val,))

    from tests._mp_case import make_eval_solver

    solver = make_eval_solver(
        str(tmp_path), store_sub="store_single", results_sub="single",
        data_axis=1, n_val=n_val,
    )
    loss_1, acc_1 = solver.val(full=True)
    solver.close()

    for pid in range(nproc):
        with open(tmp_path / f"proc{pid}_eval.json") as f:
            got = json.load(f)
        np.testing.assert_allclose(got["loss"], float(loss_1), rtol=1e-5)
        np.testing.assert_allclose(got["acc"], float(acc_1), atol=1e-9)

    rec_mp = json.loads(
        (tmp_path / "mp" / "results" / "mhb_coAtt.json").read_text()
    )
    rec_1 = json.loads(
        (tmp_path / "single" / "results" / "mhb_coAtt.json").read_text()
    )
    assert rec_mp["num_examples"] == n_val
    np.testing.assert_allclose(
        rec_mp["vqa_consensus_accuracy"], rec_1["vqa_consensus_accuracy"],
        atol=1e-12,
    )
    assert rec_mp["per_answer_type"] == rec_1["per_answer_type"]

    preds_mp = json.loads(
        (tmp_path / "mp" / "results"
         / "mhb_coAtt_predictions.json").read_text()
    )
    preds_1 = json.loads(
        (tmp_path / "single" / "results"
         / "mhb_coAtt_predictions.json").read_text()
    )
    assert preds_mp == preds_1
    # exactly one row per REAL question — pad rows exported by mistake
    # would show up as extra/duplicate ids
    assert len(preds_mp) == n_val
    assert len({r["question_id"] for r in preds_mp}) == n_val


@pytest.mark.slow
@pytest.mark.parametrize("feed", ["bank", "bank_shard"])
def test_two_process_eval_with_device_feature_bank(tmp_path, feed):
    """ADVICE r4: the device feature bank across real OS processes. Both
    placements upload via parallel/sharding.place_global (remote shards
    are non-addressable — a bare device_put would fail); 'bank_shard'
    additionally runs the ppermute ring gather over a mesh that spans
    processes. Scalars must match the single-process HOST-feed truth
    exactly (the bank is bit-identical to the host feed by construction)."""
    nproc = 2
    _run_workers("_mp_eval_worker.py", nproc, tmp_path,
                 extra_args=(24, feed))

    from tests._mp_case import make_eval_solver

    solver = make_eval_solver(
        str(tmp_path), store_sub="store_single", results_sub="single",
        data_axis=1,
    )
    loss_1, acc_1 = solver.val(full=True)
    solver.close()

    for pid in range(nproc):
        with open(tmp_path / f"proc{pid}_eval.json") as f:
            got = json.load(f)
        np.testing.assert_allclose(got["loss"], float(loss_1), rtol=1e-5)
        np.testing.assert_allclose(got["acc"], float(acc_1), atol=1e-9)
