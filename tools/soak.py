"""Convergence soak: a multi-epoch synthetic-data training run for EVERY
model family at production dims, recording loss curves and qa-pairs/s.

VERDICT r2 item 8: catches bf16 drift and latent-gradient-class bugs (the
round-2 burn-in found one in the train-fusion backward) before real data
arrives. The training contract being soaked is the Solver loop — the
counterpart of the reference's epoch loop (/root/reference/solver.py:52-117).

Unlike make_synthetic_qa_data (random labels — loss plateaus at uniform),
the soak dataset is LEARNABLE: the answer is a deterministic function of
(key question token, image id), and each image id has a fixed random
feature grid, so a converging model must drive train loss well below the
uniform-entropy floor. The key token is both position-0 AND drawn from a
small dedicated vocab range (task "key-token-v2" — see make_learnable_qa
for why content-identifiability is required for architecture fairness).

Two-tier gate (both scale-invariant, so they work for the mhb family's
KLD-style loss — normalized by a_vocab_size, it starts at ln(V)/V ~ 0.007
where an absolute threshold would be meaningless):

- drift gate (every run): all scalars finite AND final train loss
  < 0.97x first-epoch loss — gradients point downhill, no bf16 blowup.
- convergence gate (runs with >= 8 epochs, i.e. the TPU soak where
  epochs are cheap): final < --gate x first, OR final train accuracy
  >= 20x chance (20/num_answer) — direct evidence of learning that is
  robust to the loss normalization. Short CPU runs report this tier as
  informational only: 4 epochs at production dims is genuinely too few
  for the slower families (the reference trains 18+), and per-family
  gradient correctness is already pinned by tests/test_train_dynamics.py.

Usage:
  python tools/soak.py --workdir /tmp/soak --epochs 12         # TPU dims
  python tools/soak.py --smoke                                  # CPU, tiny
  python tools/soak.py --redoc docs/soak_results.json           # re-derive
      docs from stored curves (no retraining)

Outputs: docs/soak_results.json (+ docs/SOAK.md table) unless --no_docs.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAMILIES = [
    "mfb",
    "mfb-multilayer",
    "mhb",
    "mhb_coAtt",
    "mhb_coAtt+glove",
    "hieCoAtten",
    "visLstm",
    "iBOWIMG",
    "attentionNet",
]


SOAK_TASK = "key-token-v2"
TASK_KEY_ONLY = "key-only-v2"

# Per-family task mapping (used unless --task overrides). Empty: at
# production dims (22 tokens, ~4900-word filler vocab, 2048 samples) every
# family converges on the joint task — including hieCoAtten, whose single
# linear head over [v; q] (reference hieCoAtten.py:52-54) is additively
# separable and cannot express the joint modular argmax analytically, but
# memorizes the training set through the high-dimensional filler
# fingerprint its content attention sees (measured: loss 7.10 -> 2.71, 94x
# chance train accuracy in 12 CPU epochs). TASK_KEY_ONLY remains available
# via --task as the capacity-control diagnostic: in SMALL regimes (tiny
# vocab, 8 tokens), where the fingerprint channel is too weak, hieCoAtten
# needs the marginal task + --dropout_default 0 to show fast learning
# (69% train acc in 10 epochs) — which is how "slow under the reference's
# five-site p=0.5 dropout" was separated from "broken gradients".
FAMILY_TASK = {}


def make_learnable_qa(rng, n_train, n_val, q_vocab_words, num_answers,
                      max_len, num_images, task=SOAK_TASK,
                      val_mode="fresh"):
    """QAData whose answers are predictable from (key_token, image_id).

    Task v2 ("key-token-v2"): the answer-determining KEY token sits at
    position 0 AND is drawn from a small dedicated vocab range
    [1, n_keys], with filler tokens from the disjoint range above it.
    Task v1 keyed the answer on position 0 alone (key drawn from the
    full vocab), which is *provably unlearnable* for position-blind
    families: hieCoAtten — faithful to the reference architecture
    (hieCoAtten.py:25-28) — attends over raw word embeddings with no
    LSTM and no positional encoding, so nothing in its function class
    can distinguish token 0 from the other fillers; its v1 soak result
    of exactly-chance train accuracy was a task-architecture mismatch,
    not a model bug. v2 makes the key content-identifiable — the
    property real VQA questions have (the informative word is a *word*,
    not a position) — while staying position-0 so recurrent families
    see an unchanged task. The small key range also gives every key
    embedding dense gradient (each key recurs ~n/n_keys times) instead
    of the one-shot-memorization regime of a 5000-word key space.
    """
    from vqa_attention_networks_tpu.data.prepare import (
        QAData, QASplit, SOFT_WIDTH,
    )

    # key range capped well below the vocab so the filler range keeps real
    # width (--smoke sets q_vocab_words=64: min(64, vocab) would collapse
    # every filler to the single UNK id)
    n_keys = min(64, max(8, q_vocab_words // 4))

    def _split(n, keys=None, image_ids=None):
        lengths = rng.integers(3, max_len + 1, size=n).astype(np.int32)
        questions = np.zeros((n, max_len), dtype=np.int32)
        for i, l in enumerate(lengths):
            # fillers come from (n_keys, q_vocab_words+1] — disjoint from
            # the key range so the key is identifiable by content alone
            questions[i, 1:l] = rng.integers(
                n_keys + 1, q_vocab_words + 2, size=int(l) - 1
            )
        if keys is None:
            keys = rng.integers(1, n_keys + 1, size=n)
        questions[:, 0] = keys
        if image_ids is None:
            image_ids = rng.integers(0, num_images, size=n).astype(np.int64)
        key_term = questions[:, 0].astype(np.int64) * 7
        if task == TASK_KEY_ONLY:
            answers = (key_term % num_answers).astype(np.int32)
        else:
            answers = ((key_term + image_ids * 13)
                       % num_answers).astype(np.int32)
        soft_idx = np.full((n, SOFT_WIDTH), -1, dtype=np.int32)
        soft_val = np.zeros((n, SOFT_WIDTH), dtype=np.float32)
        soft_idx[:, 0] = answers
        soft_val[:, 0] = 0.9
        soft_idx[:, 1] = (answers + 1) % num_answers
        soft_val[:, 1] = 0.1
        return QASplit(questions=questions, ques_length=lengths,
                       answers=answers, image_ids=image_ids,
                       soft_idx=soft_idx, soft_val=soft_val,
                       soft_n=np.full(n, 10, dtype=np.int32))

    question_vocab = {f"w{i}": i + 1 for i in range(q_vocab_words)}
    question_vocab["UNK"] = q_vocab_words + 1
    answer_vocab = {f"a{i}": i for i in range(num_answers - 1)}
    answer_vocab["UNK"] = num_answers - 1
    train = _split(n_train)
    if val_mode == "seen":
        # generalization-to-seen-pattern arm: val reuses TRAIN
        # (key, image) combinations — whose answers the model can have
        # learned — but with fresh filler tokens and lengths, so val acc
        # measures pattern recall, not memorized full questions. With
        # "fresh" (default) val combos are new and the modular answer map
        # makes them unpredictable by construction (val acc ~= chance is
        # the expected outcome; see docs/SOAK.md).
        pick = rng.integers(0, n_train, size=n_val)
        val = _split(n_val, keys=train.questions[pick, 0],
                     image_ids=train.image_ids[pick])
    else:
        val = _split(n_val)
    return QAData(train=train, val=val,
                  answer_vocab=answer_vocab, question_vocab=question_vocab,
                  max_question_length=max_len)


def soak_family(family, qa, store, args, log_dir, task=SOAK_TASK):
    from vqa_attention_networks_tpu.config import Config
    from vqa_attention_networks_tpu.train.solver import Solver

    # suffix-composed arm families: "mhb_coAtt+glove" feeds GloVe vectors,
    # "mhb_coAtt+pooled" soaks the weight-contracted fast-train mode
    # (Config.dropout_site="pooled"); suffixes keep their own report row
    # under --merge (merge_results keys on the full family string)
    parts = family.split("+")
    model_name = parts[0]
    glove = "glove" in parts[1:]
    extra = {}
    if getattr(args, "dropout_default", None) is not None:
        extra["dropout_default"] = args.dropout_default
    if getattr(args, "device_features", False):
        extra["device_feature_bank"] = True
    if "pooled" in parts[1:] or getattr(
            args, "dropout_site", "prepool") != "prepool":
        extra["dropout_site"] = "pooled"
    cfg = Config(
        model_name=model_name,
        q_vocab_size=len(qa.question_vocab) + 1,
        a_vocab_size=len(qa.answer_vocab),
        max_question_length=qa.max_question_length,
        img_feature_channel=store.channels,
        glove=glove,
        mode="training",
        data_dir=args.workdir,
        batch_size=args.batch_size,
        num_epoch=args.epochs,
        compute_dtype=args.compute_dtype,
        checkpoint_every_steps=0,
        seed=args.seed,
        **extra,
    ).validate()

    glove_table = None
    if glove:
        emb_rng = np.random.default_rng(args.seed + 7)
        glove_table = (
            emb_rng.standard_normal((cfg.q_vocab_size, 300)) * 0.3
        ).astype(np.float32)

    run_dir = os.path.join(log_dir, family.replace("+", "_"))
    # MetricWriter appends: a stale events.jsonl from a previous run in the
    # same --workdir (hw_remeasure pins /tmp/soak_tpu) would merge old
    # epochs into the curves and corrupt the verdicts
    events_path = os.path.join(run_dir, model_name, "events.jsonl")
    if os.path.exists(events_path):
        os.remove(events_path)

    solver = Solver(cfg, qa, store, glove_table=glove_table, log_dir=run_dir)
    t0 = time.time()
    blowup = None
    try:
        solver.train()
    except FloatingPointError as e:
        # non-finite train loss aborts the Solver (solver.py NaN guard) —
        # for the soak that IS the finding: record a failed drift gate for
        # this family instead of killing the remaining families
        blowup = str(e)
    wall = time.time() - t0
    solver.close()

    # per-epoch history from the structured metric stream (utils/logging.py
    # mirrors the reference's tensorboardX tags, solver.py:116-117)
    epochs, qps = [], []
    by_step = {}
    if os.path.exists(events_path):
        with open(events_path) as f:
            for line in f:
                rec = json.loads(line)
                e = by_step.setdefault(rec["step"], {"step": rec["step"]})
                if rec["tag"].endswith("/loss"):
                    e["train_loss"] = rec["train loss"]
                    e["val_loss"] = rec["val loss"]
                elif rec["tag"].endswith("/acc"):
                    e["train_acc"] = rec["train acc"]
                    e["val_acc"] = rec["val acc"]
                elif rec["tag"].endswith("/qa_pairs_per_sec"):
                    e["qps"] = rec["value"]
    for step in sorted(by_step):
        epochs.append(by_step[step])
        qps.append(by_step[step].get("qps", 0.0))

    qps_seen = [q for q in qps if q]
    result = {
        "family": family,
        "task": task,
        # diagnostic-arm honesty: a dropout-off run must be visibly
        # non-production in the stored report, like the task arm already is
        **({"dropout_default": args.dropout_default}
           if getattr(args, "dropout_default", None) is not None else {}),
        **({"dropout_site": "pooled"}
           if extra.get("dropout_site") == "pooled" else {}),
        **({"val_mode": "seen"}
           if getattr(args, "val_mode", "fresh") == "seen" else {}),
        # assessment context pinned per family: a --merge partial re-run
        # overwrites the stored top-level config, so --redoc and the
        # report's "x chance" column must not assess kept families
        # against the re-run's num_answer/gate
        "num_answer": args.num_answer,
        "gate_threshold": args.gate,
        "compute_dtype": args.compute_dtype,
        # per-family platform: a --merge'd report can mix CPU and TPU
        # runs, so the table must say which chip each row ran on
        "platform": getattr(args, "platform_seen", "unknown"),
        "epochs": epochs,
        "final_val_acc": epochs[-1].get("val_acc") if epochs else None,
        "qa_pairs_per_sec": float(np.median(qps_seen)) if qps_seen else 0.0,
        "wall_s": round(wall, 1),
        "error": blowup,
    }
    result.update(assess(epochs, args.num_answer, args.gate))
    if blowup is not None:
        result["finite"] = False
        result["drift_ok"] = result["converged"] = False
    return result


def enforced_gate(result, enforce):
    """Which gate binds for one family's run.

    auto: convergence for runs long enough to demand it (>= 8 epochs,
    VERDICT r2 item 8's tier split), drift otherwise. The explicit modes
    exist so a merged report (families soaked at different lengths) can
    be held to a single standard: --enforce convergence fails any family
    that has not demonstrated learning, regardless of run length.
    """
    n = len(result.get("epochs") or [])
    if enforce == "convergence" or (enforce == "auto" and n >= 8):
        return "convergence"
    return "drift"


def enforced_ok(result, enforce):
    if enforced_gate(result, enforce) == "convergence":
        return bool(result["converged"])
    return bool(result["drift_ok"])


def assess(epochs, num_answer, gate):
    """Scale-invariant health gates over one family's per-epoch curves
    (shared by fresh runs and --redoc re-derivation)."""
    if not epochs:
        return {"first_train_loss": None, "final_train_loss": None,
                "final_train_acc": None, "finite": False,
                "drift_ok": False, "converged": False}
    scalars = [v for e in epochs for k, v in e.items() if k != "step"]
    finite = bool(all(np.isfinite(s) for s in scalars))
    first, final = epochs[0]["train_loss"], epochs[-1]["train_loss"]
    enough = len(epochs) >= 2
    drift_ok = finite and enough and final < 0.97 * first
    acc_floor = 20.0 / num_answer
    converged = (
        finite and enough
        and (final < gate * first
             or epochs[-1].get("train_acc", 0.0) >= acc_floor)
    )
    return {
        "first_train_loss": first,
        "final_train_loss": final,
        "final_train_acc": epochs[-1].get("train_acc"),
        "finite": finite,
        "drift_ok": bool(drift_ok),
        "converged": bool(converged),
    }


def write_docs(results, config, enforce="auto"):
    path_json = os.path.join(REPO, "docs", "soak_results.json")
    with open(path_json, "w") as f:
        json.dump({"config": config, "results": results}, f, indent=1)

    lines = [
        "# Convergence soak report",
        "",
        "Generated by `tools/soak.py` — one multi-epoch learnable-synthetic-"
        "data training run per model family (VERDICT r2 item 8; training "
        "contract: reference solver.py:52-117). Gates (both scale-"
        "invariant): **drift** = all scalars finite and final train loss "
        "< 0.97x first epoch (gradients downhill, no bf16 blowup); "
        "**convergence** = final < 0.6x first OR final train accuracy >= "
        "20x chance (direct evidence of learning, robust to the mhb "
        "family's KLD loss normalization). The *enforced* column is the "
        "gate each family's exit code was held to; per-family gradient "
        "correctness is separately pinned by tests/test_train_dynamics.py.",
        "",
        "The *task* column is the learnable-data version the family was "
        "soaked on. `pos0-v1` keyed the answer on the position-0 token "
        "drawn from the full vocab — provably unlearnable for hieCoAtten, "
        "whose reference-faithful architecture (co-attention over raw "
        "word embeddings, hieCoAtten.py:25-28) has no positional channel "
        "at all, and needlessly slow for every family (a 5000-word key "
        "space puts memorization in the one-shot regime). `key-token-v2` "
        "keeps the key at position 0 but draws it from a dedicated "
        "64-token range disjoint from the fillers, making it "
        "content-identifiable — the property the real VQA task has. "
        "`key-only-v2` (--task) is the marginal diagnostic task (answer "
        "= 7·key mod V) for capacity-control runs at tiny dims "
        "(tools/soak.py FAMILY_TASK comment has the full argument).",
        "",
        "**Why the val-acc column sits near chance (and why that is "
        "expected, not a failure):** the answer map is an arbitrary "
        "modular function `(7·key + 13·image_id) mod V` with no structure "
        "to generalize from — a model can only *memorize* (key, image) "
        "combinations it has trained on. The val split draws fresh "
        "(key, image) pairs, so most val combinations are unseen and "
        "their answers are unpredictable *by construction*; near-chance "
        "val accuracy is the mathematically expected outcome of a "
        "successful run. The soak therefore gates on TRAIN accuracy "
        "(x-chance), which is the correct signal for what this harness "
        "tests: that gradients flow and the optimizer can fit the data "
        "at production dims in production dtype. Generalization to *seen* "
        "combinations is demonstrated separately by the `--val_mode seen` "
        "arm (val questions reuse train (key, image) combos with fresh "
        "filler tokens — see the `val mode` note per row when present).",
        "",
        f"Platform: per-row column (this run: **{config['platform']}**) | "
        f"dtype: "
        f"**{config['compute_dtype']}** | batch {config['batch_size']} | "
        f"{config['n_train']} samples | "
        f"{config['num_answer']} answers | enforcement mode: "
        f"**{enforce}**",
        "",
        "| family | task | platform | epochs | loss first→final | "
        "train acc (x chance) | val acc (x chance) | "
        "qa-pairs/s | wall (s) | drift | converged | enforced |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    def _f(v, spec):
        return format(v, spec) if v is not None else "—"

    for r in results:
        acc = r.get("final_train_acc") or 0.0
        vacc = r.get("final_val_acc")
        gate = enforced_gate(r, enforce)
        ok = enforced_ok(r, enforce)
        num_answer = r.get("num_answer", config["num_answer"])
        task_label = r.get("task", "pos0-v1")
        if r.get("dropout_default") is not None:
            task_label += f" (dropout={r['dropout_default']:g})"
        if r.get("dropout_site"):
            task_label += f" (site={r['dropout_site']})"
        if r.get("val_mode") == "seen":
            task_label += " (val=seen)"
        vcol = (
            f"{vacc:.3f} ({vacc * num_answer:.0f}x)" if vacc is not None
            else "—"
        )
        lines.append(
            f"| {r['family']} | {task_label} | "
            # pre-r4 stored entries predate the per-family field; they
            # were all CPU runs
            f"{r.get('platform', 'cpu')} | "
            f"{len(r.get('epochs') or [])} | "
            f"{_f(r['first_train_loss'], '.4f')} → "
            f"{_f(r['final_train_loss'], '.4f')} | {acc:.3f} "
            f"({acc * num_answer:.0f}x) | {vcol} | "
            f"{r['qa_pairs_per_sec']:.0f} | {r['wall_s']} | "
            f"{'PASS' if r['drift_ok'] else 'FAIL'} | "
            f"{'yes' if r['converged'] else 'not yet'} | "
            f"{gate}: {'PASS' if ok else 'FAIL'} |"
        )
    lines += ["", "Per-epoch curves: `docs/soak_results.json`.", ""]
    with open(os.path.join(REPO, "docs", "SOAK.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"wrote docs/SOAK.md and {path_json}")


def merge_results(new_results, path_json):
    """Replace re-run families in a stored report, keep the rest.

    A partial re-run (e.g. the 4 convergence laggards at 12 epochs,
    VERDICT r3 item 4) must not clobber the other families' curves.
    Family order follows FAMILIES so the report stays stable.
    """
    stored = {}
    if os.path.exists(path_json):
        with open(path_json) as f:
            stored = {r["family"]: r
                      for r in json.load(f).get("results", [])}
    stored.update({r["family"]: r for r in new_results})
    order = {f: i for i, f in enumerate(FAMILIES)}
    return sorted(stored.values(),
                  key=lambda r: order.get(r["family"], len(order)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--families", default=",".join(FAMILIES),
                   help=f"comma list of {FAMILIES}")
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--n_train", type=int, default=8192)
    p.add_argument("--n_val", type=int, default=1024)
    p.add_argument("--num_answer", type=int, default=1000)
    p.add_argument("--q_vocab_words", type=int, default=5000)
    p.add_argument("--num_images", type=int, default=512)
    p.add_argument("--num_regions", type=int, default=196)
    p.add_argument("--channels", type=int, default=2048)
    p.add_argument("--compute_dtype", default="bfloat16",
                   help="bfloat16 soaks the production TPU training dtype")
    p.add_argument("--gate", type=float, default=0.6,
                   help="convergence gate: final train loss must be < "
                        "gate * first-epoch loss (smoke: 0.95 — short runs "
                        "report last-batch loss, which is noisy)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workdir", default=None)
    p.add_argument("--smoke", action="store_true",
                   help="tiny dims for a CPU smoke run")
    p.add_argument("--no_docs", action="store_true")
    p.add_argument("--merge", action="store_true",
                   help="merge this run's families into the existing "
                        "docs/soak_results.json instead of replacing the "
                        "whole report (partial re-runs)")
    p.add_argument("--enforce", default="auto",
                   choices=["auto", "drift", "convergence"],
                   help="which gate binds the exit code per family: auto "
                        "= convergence for >=8-epoch runs, drift below; "
                        "convergence = every family must show learning")
    p.add_argument("--device_features", action="store_true",
                   help="train with Config.device_feature_bank: upload the "
                        "soak's feature store to HBM once and gather "
                        "in-graph. Bit-identical to the host feed "
                        "(tests/test_device_bank_train.py); turns the "
                        "relay-transfer-bound TPU soak (~12 s/step, "
                        "50-200 MB feature upload per step over a ~23 MB/s "
                        "link) compute-bound")
    p.add_argument("--dropout_site", default="prepool",
                   choices=("prepool", "pooled"),
                   help="grid-fusion dropout site (Config.dropout_site): "
                        "'pooled' soaks the weight-contracted fast-train "
                        "mode's convergence (mfb/mhb_coAtt families)")
    p.add_argument("--dropout_default", type=float, default=None,
                   help="override Config.dropout_default (diagnostic: the "
                        "0.5-dropout families learn slowly at soak scale; "
                        "a dropout-off control separates 'slow under "
                        "production noise' from 'broken gradients')")
    p.add_argument("--val_mode", default="fresh",
                   choices=["fresh", "seen"],
                   help="val split combos: fresh = new (key, image) pairs "
                        "(answers unpredictable by construction under the "
                        "modular answer map — val acc ~= chance is the "
                        "expected outcome); seen = val reuses train "
                        "(key, image) combos with fresh filler tokens, so "
                        "val acc demonstrates generalization to seen "
                        "patterns")
    p.add_argument("--task", default="auto",
                   choices=["auto", SOAK_TASK, TASK_KEY_ONLY],
                   help="learnable-data task; auto = per-family mapping "
                        "(FAMILY_TASK; currently the joint task for all "
                        "families), key-only-v2 = the marginal diagnostic")
    p.add_argument("--redoc", default=None, metavar="RESULTS_JSON",
                   help="re-derive docs + gates from a stored "
                        "soak_results.json without retraining")
    args = p.parse_args(argv)

    if args.redoc:
        with open(args.redoc) as f:
            stored = json.load(f)
        config = stored["config"]
        results = []
        for r in stored["results"]:
            r = dict(r)
            r.update(assess(
                r["epochs"],
                r.get("num_answer", config["num_answer"]),
                r.get("gate_threshold", args.gate),
            ))
            results.append(r)
        write_docs(results, config, enforce=args.enforce)
        ok = all(enforced_ok(r, args.enforce) for r in results)
        print(f"SOAK {'PASS' if ok else 'FAIL'} (redoc): "
              f"{sum(r['drift_ok'] for r in results)}/{len(results)} drift-"
              f"ok, {sum(r['converged'] for r in results)} converged")
        return 0 if ok else 1

    if args.smoke:
        args.epochs = min(args.epochs, 3)
        args.batch_size = 32
        args.n_train, args.n_val = 512, 128
        args.num_answer, args.q_vocab_words = 16, 64
        # region count stays 196: Config.validate pins the 14x14 grid
        args.num_images, args.num_regions, args.channels = 32, 196, 256
        args.compute_dtype = "float32"
        if args.gate == p.get_default("gate"):
            args.gate = 0.95

    from vqa_attention_networks_tpu.utils.runtime import setup as rt_setup
    rt_setup()
    import jax
    args.platform_seen = jax.devices()[0].platform

    args.workdir = args.workdir or tempfile.mkdtemp(prefix="vqa_soak_")
    os.makedirs(args.workdir, exist_ok=True)

    qa_by_task = {}

    def qa_for(task):
        if task not in qa_by_task:
            rng = np.random.default_rng(args.seed)
            qa_by_task[task] = make_learnable_qa(
                rng, args.n_train, args.n_val, args.q_vocab_words,
                args.num_answer, qa_max_len(args), args.num_images,
                task=task, val_mode=getattr(args, "val_mode", "fresh"))
        return qa_by_task[task]

    from vqa_attention_networks_tpu.data.feature_store import (
        make_synthetic_feature_store,
    )
    store = make_synthetic_feature_store(
        os.path.join(args.workdir, "features"),
        list(range(args.num_images)),
        num_regions=args.num_regions, channels=args.channels,
        seed=args.seed,
    )

    results = []
    ok = True
    for family in args.families.split(","):
        family = family.strip()
        task = (FAMILY_TASK.get(family.split("+")[0], SOAK_TASK)
                if args.task == "auto" else args.task)
        print(f"=== soak {family} (task {task}) ===", flush=True)
        r = soak_family(family, qa_for(task), store, args,
                        os.path.join(args.workdir, "runs"), task=task)
        print(json.dumps({k: v for k, v in r.items() if k != "epochs"}),
              flush=True)
        results.append(r)
        # smoke (3 tiny epochs) checks the harness + numerics; otherwise
        # the per-family enforced gate binds (convergence for >=8-epoch
        # runs under auto — the tier split from VERDICT r2 item 8)
        if args.smoke:
            ok &= r["finite"]
        else:
            ok &= enforced_ok(r, args.enforce)
        # under --merge, land each family as it completes: a multi-hour
        # TPU soak killed mid-list must keep its finished families
        # (docs are rewritten from the merged store, so this is
        # idempotent and the final write below stays correct)
        if args.merge and not args.no_docs:
            write_docs(
                merge_results(
                    results,
                    os.path.join(REPO, "docs", "soak_results.json")),
                {"epochs": args.epochs, "batch_size": args.batch_size,
                 "compute_dtype": args.compute_dtype,
                 "n_train": args.n_train,
                 "num_answer": args.num_answer,
                 "platform": args.platform_seen},
                enforce=args.enforce)

    if not args.no_docs:
        doc_results = results
        if args.merge:
            doc_results = merge_results(
                results, os.path.join(REPO, "docs", "soak_results.json"))
        write_docs(doc_results, {
            "epochs": args.epochs, "batch_size": args.batch_size,
            "compute_dtype": args.compute_dtype, "n_train": args.n_train,
            "num_answer": args.num_answer, "platform": args.platform_seen,
        }, enforce=args.enforce)
    print(f"SOAK {'PASS' if ok else 'FAIL'}: "
          f"{sum(r['drift_ok'] for r in results)}/{len(results)} families "
          f"drift-ok, {sum(r['converged'] for r in results)} converged")
    return 0 if ok else 1


def qa_max_len(args):
    # production questions pad to 22 tokens (reference utils.py:171,201)
    return 8 if args.smoke else 22


if __name__ == "__main__":
    sys.exit(main())
