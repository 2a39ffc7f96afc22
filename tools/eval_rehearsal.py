"""Full-scale official-metrics rehearsal (VERDICT r3 item 5).

The official VQA metrics path (leave-one-out consensus, per-answer-type,
perQuestionType, submission export — train/solver.py val(full=True)) had
only ever processed toy inputs. This tool rehearses it at real-val scale
BEFORE real data arrives: a synthetic VQA-v2-val-sized artifact
(~214k questions — the v2 val split size, 65 question types, 10
annotators per question, 3000-answer vocab) flows through the real
Solver eval, and the host-side metric loop is wall-clocked separately
from the device sweep.

The model is deliberately tiny: the quantity under test is the HOST
metric loop + artifact export (their cost is model-independent), not the
device forward — that is bench.py/bench_train.py's job.

Usage:
  python tools/eval_rehearsal.py                    # full 214k rehearsal
  python tools/eval_rehearsal.py --quick            # 2k smoke (tests)
  python tools/eval_rehearsal.py --out docs/EVAL_SCALE.md

Writes a timing/validation report (markdown + JSON sidecar).

Reference contract being rehearsed: the metric loop of
/root/reference/solver.py:150-182 at the scale the reference's own
results (results/mhb_coAtt.txt) were produced at.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# VQA v2 validation split size (questions); the rehearsal defaults to it
VQA2_VAL_QUESTIONS = 214354


def make_val_scale_qa(rng, n_val, num_answers, q_vocab_words, max_len,
                      num_images, n_qtypes):
    """VQA-v2-val-shaped synthetic QAData: 10 annotators per question with
    a realistic consensus mix (unanimous yes/no answers next to split
    'other' answers), ~65 question types, official answer-type codes."""
    from vqa_attention_networks_tpu.data.prepare import (
        QAData, QASplit, SOFT_WIDTH,
    )

    def _split(n, qid_start=0):
        lengths = rng.integers(3, max_len + 1, size=n).astype(np.int32)
        questions = np.zeros((n, max_len), dtype=np.int32)
        for i, l in enumerate(lengths):
            questions[i, :l] = rng.integers(1, q_vocab_words + 2, size=l)
        answers = rng.integers(0, num_answers, size=n).astype(np.int32)

        # annotator counts: primary answer gets 3..10 of the 10 votes, the
        # remainder split over up to three runner-ups (official artifacts
        # store count/soft_n fractions + the raw in-vocab count soft_n)
        soft_idx = np.full((n, SOFT_WIDTH), -1, dtype=np.int32)
        soft_val = np.zeros((n, SOFT_WIDTH), dtype=np.float32)
        soft_n = np.full(n, 10, dtype=np.int32)
        primary = rng.integers(3, 11, size=n)
        soft_idx[:, 0] = answers
        soft_val[:, 0] = primary / 10.0
        rest = 10 - primary
        for j in range(1, 4):
            take = np.minimum(rest, rng.integers(0, 4, size=n))
            # offset in [1, num_answers-1] guarantees runner != primary
            # (j * offset could be ≡ 0 mod num_answers, silently turning a
            # "split" row into reinforced unanimity)
            runner = (answers + rng.integers(1, num_answers, size=n)) \
                % num_answers
            has = take > 0
            soft_idx[has, j] = runner[has]
            soft_val[has, j] = take[has] / 10.0
            rest = rest - take

        return QASplit(
            questions=questions,
            ques_length=lengths,
            answers=answers,
            image_ids=rng.integers(0, num_images, size=n).astype(np.int64),
            soft_idx=soft_idx,
            soft_val=soft_val,
            soft_n=soft_n,
            answer_types=rng.integers(0, 3, size=n).astype(np.int32),
            question_ids=np.arange(qid_start, qid_start + n,
                                   dtype=np.int64),
            question_types=rng.integers(0, n_qtypes, size=n)
            .astype(np.int32),
        )

    question_vocab = {f"w{i}": i + 1 for i in range(q_vocab_words)}
    question_vocab["UNK"] = q_vocab_words + 1
    answer_vocab = {f"a{i}": i for i in range(num_answers - 1)}
    answer_vocab["UNK"] = num_answers - 1
    qtype_names = [f"what is the {i}" for i in range(n_qtypes)]
    # train split is a stub — only val is swept here
    return QAData(train=_split(64), val=_split(n_val, qid_start=64),
                  answer_vocab=answer_vocab, question_vocab=question_vocab,
                  max_question_length=max_len,
                  question_type_names=qtype_names)


def strip_host_fields(qa):
    """The same QAData minus every host-metric field — the device-only
    sweep that isolates the host metric loop's cost by difference."""
    from dataclasses import replace

    bare_val = replace(qa.val, soft_n=None, answer_types=None,
                       question_ids=None, question_types=None)
    return replace(qa, val=bare_val, question_type_names=None)


def run_val(qa, store, args, tag):
    from vqa_attention_networks_tpu.config import Config
    from vqa_attention_networks_tpu.train.solver import Solver

    cfg = Config(
        model_name=args.model_name,
        q_vocab_size=len(qa.question_vocab) + 1,
        a_vocab_size=len(qa.answer_vocab),
        max_question_length=qa.max_question_length,
        img_feature_channel=store.channels,
        hidden_dim=16, emb_dim=8, mfb_factor=5, mfb_out=8,
        mode="training",
        data_dir=args.workdir,
        batch_size=args.batch_size,
        num_epoch=1,
        checkpoint_every_steps=0,
        results_dir=os.path.join(args.workdir, f"results_{tag}"),
        seed=0,
    ).validate()
    solver = Solver(cfg, qa, store,
                    log_dir=os.path.join(args.workdir, f"runs_{tag}"))
    # warm the compile outside the timed window (one batch, full=False)
    solver.val(full=False)
    t0 = time.perf_counter()
    loss, acc = solver.val(full=True)
    wall = time.perf_counter() - t0
    solver.close()
    return {"tag": tag, "loss": float(loss), "acc": float(acc),
            "wall_s": round(wall, 2),
            "results_dir": cfg.results_dir, "model": cfg.model_name}


def validate_submission(path, n_expected):
    """The official submission schema: a JSON array of
    {"question_id": int, "answer": str}, one row per valid question,
    unique ids."""
    with open(path) as f:
        rows = json.load(f)
    assert isinstance(rows, list), type(rows)
    assert len(rows) == n_expected, (len(rows), n_expected)
    qids = set()
    for r in rows:
        assert set(r.keys()) == {"question_id", "answer"}, r
        assert isinstance(r["question_id"], int), r
        assert isinstance(r["answer"], str), r
        qids.add(r["question_id"])
    assert len(qids) == n_expected, "duplicate question_ids"
    return len(rows)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n_val", type=int, default=VQA2_VAL_QUESTIONS)
    p.add_argument("--num_answer", type=int, default=3000)
    p.add_argument("--q_vocab_words", type=int, default=5000)
    p.add_argument("--qtypes", type=int, default=65)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--num_images", type=int, default=2048)
    p.add_argument("--channels", type=int, default=64)
    p.add_argument("--model_name", default="mhb_coAtt")
    p.add_argument("--workdir", default=None)
    p.add_argument("--out", default=os.path.join(REPO, "docs",
                                                 "EVAL_SCALE.md"))
    p.add_argument("--no_docs", action="store_true")
    p.add_argument("--quick", action="store_true",
                   help="2k questions — smoke-test the harness itself")
    args = p.parse_args(argv)
    if args.quick:
        args.n_val = 2000
        args.num_images = 64
        args.batch_size = 256

    from vqa_attention_networks_tpu.utils.runtime import setup as rt_setup
    rt_setup()
    import jax
    import tempfile

    platform = jax.devices()[0].platform
    args.workdir = args.workdir or tempfile.mkdtemp(prefix="vqa_evalscale_")
    os.makedirs(args.workdir, exist_ok=True)

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    qa = make_val_scale_qa(rng, args.n_val, args.num_answer,
                           args.q_vocab_words, 22, args.num_images,
                           args.qtypes)
    gen_s = time.perf_counter() - t0
    from vqa_attention_networks_tpu.data.feature_store import (
        make_synthetic_feature_store,
    )
    store = make_synthetic_feature_store(
        os.path.join(args.workdir, "features"),
        list(range(args.num_images)),
        num_regions=196, channels=args.channels, seed=0,
    )

    print(f"=== device-only sweep ({args.n_val} questions) ===", flush=True)
    bare = run_val(strip_host_fields(qa), store, args, "device_only")
    print(json.dumps(bare), flush=True)
    print("=== full official-metrics sweep ===", flush=True)
    full = run_val(qa, store, args, "full_metrics")
    print(json.dumps(full), flush=True)

    # the host metric loop's cost is the difference between the sweeps
    host_loop_s = max(full["wall_s"] - bare["wall_s"], 0.0)

    # validate the artifacts the full sweep exported
    rec_path = os.path.join(full["results_dir"], args.model_name + ".json")
    with open(rec_path) as f:
        record = json.load(f)
    assert "vqa_consensus_accuracy" in record, record.keys()
    n_qt = len(record.get("per_question_type", {}))
    assert n_qt == args.qtypes, (n_qt, args.qtypes)
    assert len(record.get("per_answer_type", {})) == 3
    sub_path = os.path.join(full["results_dir"],
                            args.model_name + "_predictions.json")
    n_rows = validate_submission(sub_path, args.n_val)

    summary = {
        "platform": platform,
        "n_val": args.n_val,
        "num_answer": args.num_answer,
        "qtypes": args.qtypes,
        "batch_size": args.batch_size,
        "artifact_gen_s": round(gen_s, 2),
        "device_only_wall_s": bare["wall_s"],
        "full_metrics_wall_s": full["wall_s"],
        "host_metric_loop_s": round(host_loop_s, 2),
        "host_metric_us_per_question": round(
            host_loop_s / args.n_val * 1e6, 1),
        "submission_rows": n_rows,
        "per_question_type_entries": n_qt,
        "consensus_accuracy": record["vqa_consensus_accuracy"],
    }
    print("REHEARSAL " + json.dumps(summary), flush=True)

    if not args.no_docs and not args.quick:
        lines = [
            "# Official-metrics scale rehearsal",
            "",
            "`tools/eval_rehearsal.py` — the official VQA metrics path "
            "(consensus, per-answer-type, perQuestionType, submission "
            "export; `train/solver.py val(full=True)`) run end-to-end at "
            "VQA-v2-val scale on synthetic data, BEFORE real data arrives "
            "(VERDICT r3 item 5). The host metric loop is isolated by "
            "differencing a device-only sweep of the same artifact.",
            "",
            f"Platform: **{platform}** | {args.n_val} questions | "
            f"{args.num_answer} answers | {args.qtypes} question types | "
            f"10 annotators | batch {args.batch_size} | tiny model dims "
            "(the host loop under test is model-independent)",
            "",
            "| quantity | value |",
            "|---|---|",
            f"| device-only full-val sweep | {bare['wall_s']} s |",
            f"| full official-metrics sweep | {full['wall_s']} s |",
            (f"| **host metric loop** (difference) | **{host_loop_s:.2f} s**"
             f" ({summary['host_metric_us_per_question']} µs/question) |"
             if full["wall_s"] > bare["wall_s"] else
             "| **host metric loop** (difference) | **below run-to-run "
             "noise** — the full sweep measured "
             f"{bare['wall_s'] - full['wall_s']:.1f} s *faster* than the "
             "device-only sweep |"),
            f"| submission rows validated | {n_rows} "
            "(schema + unique ids) |",
            f"| perQuestionType entries | {n_qt} |",
            "",
            "The host loop is pure NumPy over the gathered preds — its "
            "cost is independent of model size and mesh layout, and it "
            "overlaps the next batch's device dispatch in steady state. "
            "At these rates the ~214k-question real val sweep spends "
            "seconds, not minutes, on the official metrics.",
            "",
        ]
        with open(args.out, "w") as f:
            f.write("\n".join(lines))
        with open(args.out.replace(".md", ".json"), "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
