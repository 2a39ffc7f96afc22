"""Generate a synthetic corpus in the official VQA-v2 JSON schema.

For end-to-end CLI drives and scale rehearsals of the preprocessing path:
writes ``<out_dir>/vqa/v2_OpenEnded_mscoco_{split}2014_questions.json``
and ``v2_mscoco_{split}2014_annotations.json`` with every field the
pipeline consumes — ``multiple_choice_answer``, ``answer_type``,
``question_type``, and the 10-annotator ``answers`` list (the schema the
reference loads in utils.py:100-150; miniature spec:
tests/test_prepare.py:_mini_vqa_json).

Usage:
  python tools/gen_corpus.py <out_dir> [--n_train N] [--n_val N] [--seed S]

Real-data scale: --n_train 443757 --n_val 214354 (the actual VQA v2 split
sizes) exercises prepare_data at day-one volume.
"""

import argparse
import json
import os
import random
import sys

COLORS = ["black", "white", "brown", "blue", "red", "green", "yellow",
          "orange", "purple", "gray"]
COUNTS = ["1", "2", "3", "4", "5", "6"]
OBJECTS = ["cat", "dog", "sky", "car", "tree", "bird", "man", "woman",
           "plate", "horse", "bus", "kite", "pizza", "clock", "bench"]
PLACES = ["table", "street", "field", "beach", "kitchen", "park"]
VERBS = ["sleeping", "running", "eating", "flying", "standing", "sitting"]


def make_rows(rng, n, qid0, img0):
    rows = []
    n_images = max(4, n // 3)  # VQA's own shape: ~3 questions per image
    for i in range(n):
        qid = qid0 + i
        img = img0 + rng.randrange(n_images)
        kind = rng.randrange(5)
        obj = rng.choice(OBJECTS)
        if kind == 0:
            q = f"What color is the {obj} on the {rng.choice(PLACES)}?"
            ans, atype, qtype = rng.choice(COLORS), "other", "what color is the"
        elif kind == 1:
            q = f"Is the {obj} {rng.choice(VERBS)}?"
            ans, atype, qtype = rng.choice(["yes", "no"]), "yes/no", "is the"
        elif kind == 2:
            q = f"How many {obj}s are there in the picture?"
            ans, atype, qtype = rng.choice(COUNTS), "number", "how many"
        elif kind == 3:
            q = f"What is the {obj} doing near the {rng.choice(PLACES)}?"
            ans, atype, qtype = rng.choice(VERBS), "other", "what is the"
        else:
            q = f"Does the {obj} look {rng.choice(VERBS)}?"
            ans, atype, qtype = rng.choice(["yes", "no"]), "yes/no", "does the"
        # dissenters drawn INDIVIDUALLY from a pool that includes yes/no:
        # real annotator lists carry 3-way splits and yes-vs-no
        # disagreement, and those are exactly the c-in-{1..9} partial-
        # credit branches of the leave-one-out consensus metric this
        # corpus exists to exercise
        k = rng.randrange(6, 11)
        pool = COLORS + COUNTS + VERBS + ["yes", "no"]
        ten = [ans] * k + [rng.choice(pool) for _ in range(10 - k)]
        rng.shuffle(ten)
        rows.append((qid, img, q, ans, atype, qtype, ten))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--n_train", type=int, default=400)
    p.add_argument("--n_val", type=int, default=120)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--version", type=int, default=2)
    args = p.parse_args(argv)

    rng = random.Random(args.seed)
    vqa = os.path.join(args.out_dir, "vqa")
    os.makedirs(vqa, exist_ok=True)
    for split, n, qid0, img0 in (("train", args.n_train, 1, 10),
                                 ("val", args.n_val, 10_000_000, 500_000)):
        rows = make_rows(rng, n, qid0, img0)
        qs = {"questions": [
            {"question_id": q, "image_id": i, "question": t}
            for q, i, t, *_ in rows]}
        anns = {"annotations": [
            {"question_id": q, "image_id": i, "multiple_choice_answer": a,
             "answer_type": at, "question_type": qt,
             "answers": [{"answer": x} for x in ten]}
            for q, i, _, a, at, qt, ten in rows]}
        base = f"v{args.version}"
        with open(os.path.join(
                vqa, f"{base}_OpenEnded_mscoco_{split}2014_questions.json"),
                "w") as f:
            json.dump(qs, f)
        with open(os.path.join(
                vqa, f"{base}_mscoco_{split}2014_annotations.json"),
                "w") as f:
            json.dump(anns, f)
    print(f"corpus at {vqa}: {args.n_train} train / {args.n_val} val")
    return 0


if __name__ == "__main__":
    sys.exit(main())
