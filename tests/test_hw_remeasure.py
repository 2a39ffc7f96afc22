"""The unattended hardware re-measurement driver (tools/hw_remeasure.py)
runs with nobody at the keyboard the moment the TPU relay recovers — a bug
in its control flow costs a day of hardware time, so the control flow is
tested here with stubbed steps (no TPU needed).

Contracts under test: CPU-fallback results must never be recorded as
hardware numbers (preflight + post-step relay probes), a timed-out step
must not leave orphan grandchildren holding the device lease, the summary
is resumable, and a mid-run relay death aborts instead of burning the
remaining step timeouts.
"""

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(monkeypatch, tmp_path):
    spec = importlib.util.spec_from_file_location(
        "hw_remeasure_tool", os.path.join(REPO, "tools", "hw_remeasure.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "SUMMARY", str(tmp_path / "HW_RESULTS.json"))
    monkeypatch.setattr(mod, "LOG_DIR", str(tmp_path / "logs"))
    os.makedirs(mod.LOG_DIR, exist_ok=True)
    return mod


def _echo_step(name, text="hello"):
    return (name, [sys.executable, "-c", f"print('{text}')"], 30, {})


def test_load_summary_normalizes(monkeypatch, tmp_path):
    mod = _load(monkeypatch, tmp_path)
    # missing file
    assert mod._load_summary() == {"steps": {}}
    # corrupt JSON
    with open(mod.SUMMARY, "w") as f:
        f.write("{not json")
    assert mod._load_summary() == {"steps": {}}
    # valid but not a dict
    with open(mod.SUMMARY, "w") as f:
        json.dump([1, 2], f)
    assert mod._load_summary() == {"steps": {}}
    # dict without "steps"
    with open(mod.SUMMARY, "w") as f:
        json.dump({"updated_utc": "x"}, f)
    s = mod._load_summary()
    assert s["steps"] == {} and s["updated_utc"] == "x"


def test_run_step_timeout_kills_grandchildren(monkeypatch, tmp_path):
    """A step that exceeds its timeout is killed along with any
    subprocesses it spawned (start_new_session + killpg): an orphan
    holding the device lease would wedge every later step."""
    mod = _load(monkeypatch, tmp_path)
    pid_file = str(tmp_path / "grandchild.pid")
    # generous step timeout: on a loaded 1-core host interpreter startup
    # alone can take seconds, and the pid file must exist before the kill
    code = (
        "import subprocess, time\n"
        "p = subprocess.Popen(['sleep', '120'])\n"
        f"open({pid_file!r}, 'w').write(str(p.pid))\n"
        "time.sleep(120)\n"
    )
    t0 = time.time()
    rec = mod.run_step("sleeper", [sys.executable, "-c", code], 15, {})
    assert rec["timed_out"] is True and rec["ok"] is False
    assert time.time() - t0 < 60
    assert os.path.exists(pid_file), (
        "step was killed before it even spawned its grandchild — "
        "raise the step timeout"
    )
    grandchild = int(open(pid_file).read())
    # killpg is synchronous; allow a moment for the zombie reap
    for _ in range(50):
        try:
            os.kill(grandchild, 0)
        except ProcessLookupError:
            break
        time.sleep(0.1)
    else:
        raise AssertionError(f"grandchild {grandchild} survived the kill")


def test_preflight_refuses_without_tpu(monkeypatch, tmp_path):
    mod = _load(monkeypatch, tmp_path)
    monkeypatch.setattr(mod, "probe_tpu", lambda *a, **kw: False)
    monkeypatch.setattr(mod, "STEPS", [_echo_step("a")])
    assert mod.main([]) == 3
    assert not os.path.exists(mod.SUMMARY)  # nothing recorded


def test_relay_death_marks_suspect_and_aborts(monkeypatch, tmp_path):
    """Relay dies during step 'a': its exit-0 result must be recorded as
    suspect (the site hook's axon,cpu platform list can silently fall back
    to CPU), and step 'b' must NOT be launched — the summary is resumable,
    so the next run picks up at 'a'."""
    mod = _load(monkeypatch, tmp_path)
    probes = iter([True, False])  # preflight ok, post-step-a dead
    monkeypatch.setattr(mod, "probe_tpu",
                        lambda *a, **kw: next(probes, False))
    monkeypatch.setattr(mod, "STEPS", [_echo_step("a"), _echo_step("b")])
    assert mod.main([]) == 1
    summary = json.load(open(mod.SUMMARY))
    assert summary["steps"]["a"]["ok"] is False
    assert "relay" in summary["steps"]["a"]["error"]
    assert "b" not in summary["steps"]


def test_resumable_skips_recorded_ok(monkeypatch, tmp_path):
    mod = _load(monkeypatch, tmp_path)
    monkeypatch.setattr(mod, "probe_tpu", lambda *a, **kw: True)
    monkeypatch.setattr(mod, "STEPS", [_echo_step("a"), _echo_step("b")])
    prior = {"steps": {"a": {"ok": True, "finished_utc": "2026-01-01"}}}
    with open(mod.SUMMARY, "w") as f:
        json.dump(prior, f)
    assert mod.main([]) == 0
    summary = json.load(open(mod.SUMMARY))
    # a untouched (skipped), b freshly recorded ok
    assert summary["steps"]["a"]["finished_utc"] == "2026-01-01"
    assert summary["steps"]["b"]["ok"] is True
    # --force re-runs a
    assert mod.main(["--force", "--only", "a"]) == 0
    summary = json.load(open(mod.SUMMARY))
    assert summary["steps"]["a"]["finished_utc"] != "2026-01-01"


def test_flip_gate_breach_relands_composed_headline(monkeypatch, tmp_path):
    """bench_precision exiting GATE_BREACH_EXIT=4 (a MEASURED flip-rate
    breach) must trigger the composed-path headline re-measure (VERDICT r3
    item 2: an accuracy-invalid kernel number must never stand as the
    headline), record it as bench_composed, and write the headline_note.
    An ordinary exit-1 crash must NOT demote the headline, the contingency
    is resumable, and a later PASSING gate clears the stale note."""
    mod = _load(monkeypatch, tmp_path)
    monkeypatch.setattr(mod, "probe_tpu", lambda *a, **kw: True)
    breach = ("precision", [sys.executable, "-c",
                            "import sys; print('gate'); sys.exit(4)"],
              30, {})
    crash = ("precision", [sys.executable, "-c",
                           "import sys; print('boom'); sys.exit(1)"],
             30, {})
    composed = (
        "bench_composed",
        [sys.executable, "-c",
         "import os; assert os.environ['VQA_DISABLE_PALLAS'] == '1'; "
         "print('{\"metric\": \"m\", \"value\": 2.0}')"],
        30, {"VQA_DISABLE_PALLAS": "1"},
    )
    monkeypatch.setattr(mod, "COMPOSED_BENCH", composed)

    # 1) an ordinary crash (exit 1) must not trigger the contingency
    monkeypatch.setattr(mod, "STEPS", [crash])
    assert mod.main([]) == 1
    summary = json.load(open(mod.SUMMARY))
    assert "bench_composed" not in summary["steps"]
    assert "headline_note" not in summary

    # 2) a measured breach (exit 4) triggers it
    monkeypatch.setattr(mod, "STEPS", [_echo_step("bench"), breach])
    assert mod.main([]) == 1  # precision failed -> overall fail
    summary = json.load(open(mod.SUMMARY))
    crec = summary["steps"]["bench_composed"]
    assert crec["ok"] is True
    assert {"metric": "m", "value": 2.0} in crec["json"]
    assert "composed" in summary["headline_note"]
    first_utc = crec["finished_utc"]

    # 3) resumed run (no --force — the watcher never passes it; the failed
    # precision step re-runs automatically): the recorded-ok composed
    # bench is skipped, the note stays
    assert mod.main(["--only", "precision"]) == 1
    summary = json.load(open(mod.SUMMARY))
    assert summary["steps"]["bench_composed"]["finished_utc"] == first_utc
    assert "headline_note" in summary

    # 4) the gate passes on a later run: the stale note is cleared
    monkeypatch.setattr(mod, "STEPS", [_echo_step("precision")])
    assert mod.main(["--only", "precision"]) == 0
    summary = json.load(open(mod.SUMMARY))
    assert "headline_note" not in summary

    # 5) a PASSING precision run from scratch creates nothing
    with open(mod.SUMMARY, "w") as f:
        json.dump({"steps": {}}, f)
    assert mod.main([]) == 0
    summary = json.load(open(mod.SUMMARY))
    assert "bench_composed" not in summary["steps"]
    assert "headline_note" not in summary


def test_json_line_extraction(monkeypatch, tmp_path):
    mod = _load(monkeypatch, tmp_path)
    code = ("print('noise'); "
            "print('{\"metric\": \"m\", \"value\": 1.5}')")
    rec = mod.run_step("jl", [sys.executable, "-c", code], 30, {})
    assert rec["ok"] is True
    assert {"metric": "m", "value": 1.5} in rec["json"]


def test_hw_results_md_renders():
    """The human-readable view of the remeasure ledger must render every
    step row and survive missing fields (a step with no tail, a summary
    with a headline_note)."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "vqa_hw_results_md", os.path.join(repo, "tools", "hw_results_md.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    md = mod.render({
        "updated_utc": "2026-08-18T00:00:00Z",
        "headline_note": "composed-path re-land",
        "steps": {
            "bench": {"ok": True, "seconds": 12.1, "tail": ["x: 1"],
                      "finished_utc": "2026-08-18T00:00:00Z"},
            "soak": {"ok": False, "timed_out": True, "seconds": 21600.0},
            "precision": {"ok": False, "exit": 4, "seconds": 10.0},
        },
    })
    assert "| bench |" in md and "| ok |" in md
    assert "TIMEOUT" in md and "FAIL (exit 4)" in md
    assert "composed-path re-land" in md
    assert "(no output captured)" in md
