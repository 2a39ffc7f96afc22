"""The convergence-soak driver (tools/soak.py) must run a family end-to-end
and emit a parseable result record — it is the scripted hardware soak of
VERDICT r2 item 8, so its harness must stay green on CPU.

Training contract under soak: the Solver epoch loop (the counterpart of
reference solver.py:52-117)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_soak_smoke_single_family(tmp_path):
    env = dict(os.environ)
    env["VQA_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "soak.py"),
         "--smoke", "--no_docs", "--families", "iBOWIMG", "--epochs", "2",
         "--workdir", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    rec = next(
        json.loads(line) for line in out.stdout.splitlines()
        if line.startswith("{")
    )
    assert rec["family"] == "iBOWIMG"
    assert rec["finite"]
    assert rec["qa_pairs_per_sec"] > 0
    # per-epoch history came from the metric stream, one record per epoch
    events = os.path.join(str(tmp_path), "runs", "iBOWIMG", "iBOWIMG",
                          "events.jsonl")
    assert os.path.exists(events)


def _load_soak_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "vqa_soak_tool", os.path.join(REPO, "tools", "soak.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_assess_gates_are_scale_invariant():
    """The drift/convergence gates must behave identically for plain-CE
    loss scales (~ln V) and the mhb family's KLD-normalized scale (~ln V /
    V), and accept accuracy as convergence evidence when the loss ratio
    alone is inconclusive."""
    soak = _load_soak_module()

    def eps(losses, accs):
        return [{"step": i, "train_loss": l, "train_acc": a}
                for i, (l, a) in enumerate(zip(losses, accs))]

    # healthy fast learner: both gates pass at either loss scale
    for scale in (1.0, 1e-3):
        r = soak.assess(eps([6.9 * scale, 3.0 * scale], [0.0, 0.3]),
                        num_answer=1000, gate=0.6)
        assert r["drift_ok"] and r["converged"]

    # slow-but-downhill: drift passes, convergence not yet
    r = soak.assess(eps([6.9, 6.5], [0.0, 0.005]), num_answer=1000,
                    gate=0.6)
    assert r["drift_ok"] and not r["converged"]

    # KLD scale with strong accuracy: converged via the accuracy arm
    r = soak.assess(eps([0.0066, 0.0059], [0.0, 0.3]), num_answer=1000,
                    gate=0.6)
    assert r["drift_ok"] and r["converged"]

    # divergence / NaN fail everything
    r = soak.assess(eps([6.9, 7.5], [0.0, 0.0]), num_answer=1000, gate=0.6)
    assert not r["drift_ok"] and not r["converged"]
    r = soak.assess(eps([6.9, float("nan")], [0.0, 0.0]), num_answer=1000,
                    gate=0.6)
    assert not r["finite"] and not r["drift_ok"]


def test_learnable_qa_key_token_v2_invariants():
    """Task key-token-v2 (VERDICT r3 item 4 follow-up): the answer key must
    be content-identifiable, not only position-encoded — hieCoAtten's
    reference-faithful architecture (co-attention over raw word embeddings,
    reference hieCoAtten.py:25-28) has no positional channel, so a task
    keyed purely on position 0 is outside its function class."""
    import numpy as np

    soak = _load_soak_module()
    rng = np.random.default_rng(3)
    vocab_words, num_answers, num_images = 5000, 1000, 512
    qa = soak.make_learnable_qa(rng, 512, 128, q_vocab_words=vocab_words,
                                num_answers=num_answers, max_len=22,
                                num_images=num_images)
    n_keys = 64
    for split in (qa.train, qa.val):
        keys = split.questions[:, 0]
        # key range: dedicated, small, dense gradient per key embedding
        assert keys.min() >= 1 and keys.max() <= n_keys
        assert len(np.unique(keys)) > n_keys // 2
        # fillers: disjoint range above the keys (0 = padding)
        fillers = split.questions[:, 1:]
        fillers = fillers[fillers != 0]
        assert fillers.min() > n_keys
        assert fillers.max() <= vocab_words + 1
        # answers follow the documented formula
        expect = (keys.astype(np.int64) * 7
                  + split.image_ids * 13) % num_answers
        assert np.array_equal(split.answers, expect.astype(np.int32))


def test_learnable_qa_key_only_task():
    """--task key-only-v2 (the capacity-control diagnostic): answers follow
    the marginal formula and ignore image ids entirely."""
    import numpy as np

    soak = _load_soak_module()
    rng = np.random.default_rng(5)
    qa = soak.make_learnable_qa(rng, 256, 64, q_vocab_words=512,
                                num_answers=100, max_len=8, num_images=16,
                                task=soak.TASK_KEY_ONLY)
    for split in (qa.train, qa.val):
        expect = (split.questions[:, 0].astype(np.int64) * 7) % 100
        assert np.array_equal(split.answers, expect.astype(np.int32))


def test_blowup_recorded_not_fatal(tmp_path, monkeypatch):
    """A non-finite train loss aborts the Solver with FloatingPointError —
    the soak's primary detection target. The soak must record that family
    as a failed drift gate and keep going, not die mid-run (a 9-family TPU
    soak losing families 4-9 to family 3's bf16 blowup produces no report
    at all)."""
    soak = _load_soak_module()
    import numpy as np

    from vqa_attention_networks_tpu.train import solver as solver_mod

    class BlowupSolver:
        def __init__(self, *a, **kw):
            pass

        def train(self):
            raise FloatingPointError("non-finite loss at step 3")

        def close(self):
            pass

    monkeypatch.setattr(solver_mod, "Solver", BlowupSolver)

    rng = np.random.default_rng(0)
    qa = soak.make_learnable_qa(rng, 32, 16, q_vocab_words=16,
                                num_answers=8, max_len=8, num_images=4)
    from vqa_attention_networks_tpu.data.feature_store import (
        make_synthetic_feature_store,
    )

    store = make_synthetic_feature_store(
        str(tmp_path / "features"), list(range(4)), num_regions=196,
        channels=64,
    )
    import argparse

    args = argparse.Namespace(
        workdir=str(tmp_path), batch_size=8, epochs=2,
        compute_dtype="float32", seed=0, num_answer=8, gate=0.6,
    )
    r = soak.soak_family("iBOWIMG", qa, store, args, str(tmp_path / "runs"))
    assert r["error"] and "non-finite" in r["error"]
    assert r["finite"] is False
    assert r["drift_ok"] is False and r["converged"] is False


def test_enforced_gate_modes():
    """Per-family gate binding: auto demands convergence only of runs long
    enough (>= 8 epochs) to be entitled to it; the explicit modes hold every
    family to one standard regardless of length (VERDICT r3 item 4)."""
    soak = _load_soak_module()
    short = {"epochs": [{}] * 4, "drift_ok": True, "converged": False}
    long_run = {"epochs": [{}] * 12, "drift_ok": True, "converged": False}
    assert soak.enforced_gate(short, "auto") == "drift"
    assert soak.enforced_gate(long_run, "auto") == "convergence"
    assert soak.enforced_ok(short, "auto") is True
    assert soak.enforced_ok(long_run, "auto") is False
    assert soak.enforced_ok(short, "convergence") is False
    assert soak.enforced_ok(long_run, "drift") is True
    converged_short = dict(short, converged=True)
    assert soak.enforced_ok(converged_short, "convergence") is True


def test_merge_results_replaces_rerun_families(tmp_path):
    """A partial re-run merges into the stored report: re-run families are
    replaced, the rest keep their curves, order follows FAMILIES."""
    soak = _load_soak_module()
    path = tmp_path / "soak_results.json"
    path.write_text(json.dumps({
        "config": {},
        "results": [
            {"family": "iBOWIMG", "epochs": [{}] * 4, "tag": "old"},
            {"family": "mfb", "epochs": [{}] * 4, "tag": "old"},
        ],
    }))
    merged = soak.merge_results(
        [{"family": "mfb", "epochs": [{}] * 12, "tag": "new"}], str(path)
    )
    by_family = {r["family"]: r for r in merged}
    assert by_family["mfb"]["tag"] == "new"
    assert len(by_family["mfb"]["epochs"]) == 12
    assert by_family["iBOWIMG"]["tag"] == "old"
    # report order is FAMILIES order: mfb before iBOWIMG
    assert [r["family"] for r in merged] == ["mfb", "iBOWIMG"]

    # no stored file: the new results stand alone
    alone = soak.merge_results(
        [{"family": "visLstm", "epochs": []}], str(tmp_path / "missing.json")
    )
    assert [r["family"] for r in alone] == ["visLstm"]


def test_redoc_rederives_report(tmp_path, monkeypatch):
    """--redoc regenerates docs + gates from stored curves without
    retraining (lets a gate fix reinterpret an expensive finished run)."""
    soak = _load_soak_module()
    stored = {
        "config": {"epochs": 4, "batch_size": 64,
                   "compute_dtype": "bfloat16", "n_train": 2048,
                   "num_answer": 1000, "platform": "cpu"},
        "results": [{
            "family": "iBOWIMG",
            "compute_dtype": "bfloat16",
            "epochs": [
                {"step": 0, "train_loss": 7.6, "train_acc": 0.0,
                 "val_acc": 0.0},
                {"step": 1, "train_loss": 2.9, "train_acc": 0.17,
                 "val_acc": 0.0},
            ],
            "final_val_acc": 0.0,
            "qa_pairs_per_sec": 376.0,
            "wall_s": 29.0,
        }],
    }
    src = tmp_path / "stored.json"
    src.write_text(json.dumps(stored))
    # write_docs targets REPO/docs — point the module at a sandbox
    monkeypatch.setattr(soak, "REPO", str(tmp_path))
    (tmp_path / "docs").mkdir()
    rc = soak.main(["--redoc", str(src)])
    assert rc == 0
    report = (tmp_path / "docs" / "SOAK.md").read_text()
    assert "iBOWIMG" in report and "PASS" in report
    rederived = json.loads(
        (tmp_path / "docs" / "soak_results.json").read_text()
    )
    assert rederived["results"][0]["drift_ok"] is True
    assert rederived["results"][0]["converged"] is True


def test_merge_lands_each_family_incrementally(tmp_path, monkeypatch):
    """Under --merge a multi-hour soak killed mid-list must keep every
    finished family: docs are rewritten after each one (the TPU soak is
    relay-transfer-bound, ~9 h for the full list — see OPERATIONS.md)."""
    import pytest

    soak = _load_soak_module()
    monkeypatch.setattr(soak, "REPO", str(tmp_path))
    (tmp_path / "docs").mkdir()

    def fake_family(family, qa, store, args, log_dir, task=None):
        if family == "mfb":
            raise KeyboardInterrupt  # the mid-list kill
        return {
            "family": family, "task": task, "num_answer": args.num_answer,
            "gate_threshold": args.gate,
            "compute_dtype": args.compute_dtype, "platform": "tpu",
            "epochs": [{"step": 0, "train_loss": 7.0, "train_acc": 0.0},
                       {"step": 1, "train_loss": 2.0, "train_acc": 0.5}],
            "final_val_acc": 0.0, "qa_pairs_per_sec": 10.0, "wall_s": 1.0,
            "error": None, "finite": True, "drift_ok": True,
            "converged": True, "first_train_loss": 7.0,
            "final_train_loss": 2.0, "final_train_acc": 0.5,
        }

    monkeypatch.setattr(soak, "soak_family", fake_family)
    with pytest.raises(KeyboardInterrupt):
        soak.main(["--smoke", "--merge", "--families", "iBOWIMG,mfb",
                   "--workdir", str(tmp_path / "wd")])

    report = json.loads(
        (tmp_path / "docs" / "soak_results.json").read_text())
    assert [r["family"] for r in report["results"]] == ["iBOWIMG"]
    md = (tmp_path / "docs" / "SOAK.md").read_text()
    assert "iBOWIMG" in md and "| tpu |" in md
