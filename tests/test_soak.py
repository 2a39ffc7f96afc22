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
