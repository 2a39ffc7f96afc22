"""Exploratory data analysis of the VQA question/annotation JSON.

Script counterpart of the reference's ``qa_features.ipynb`` (SURVEY C23):
question-type and answer-type histograms plus basic corpus stats, printed as
text tables and optionally saved as JSON.

Usage:
    python tools/eda.py --data_dir data --version 2 [--split train] [--out eda.json]
"""

import argparse
import collections
import json
from os.path import join


def analyse(data_dir: str, version: int, split: str) -> dict:
    from vqa_attention_networks_tpu.data.prepare import json_paths

    q_path, a_path = json_paths(data_dir, version, split)

    with open(q_path) as f:
        questions = json.load(f)["questions"]
    with open(a_path) as f:
        annotations = json.load(f)["annotations"]

    answer_types = collections.Counter(a["answer_type"] for a in annotations)
    question_types = collections.Counter(
        a.get("question_type", "?") for a in annotations
    )
    top_answers = collections.Counter(
        a["multiple_choice_answer"].lower() for a in annotations
    )
    lengths = collections.Counter(
        len(q["question"].split()) for q in questions
    )

    return {
        "split": split,
        "num_questions": len(questions),
        "num_annotations": len(annotations),
        "num_images": len({q["image_id"] for q in questions}),
        "answer_types": dict(answer_types),
        "question_types": dict(question_types.most_common(30)),
        "top_answers": dict(top_answers.most_common(30)),
        "question_length_histogram": dict(sorted(lengths.items())),
    }


def _print_hist(title: str, items, total: int) -> None:
    print(f"\n{title}")
    for key, count in items:
        bar = "#" * int(50 * count / max(total, 1))
        print(f"  {str(key):24s} {count:8d} {bar}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", default="data")
    parser.add_argument("--version", type=int, default=2)
    parser.add_argument("--split", default="train", help="train|val")
    parser.add_argument("--out", default=None, help="write stats JSON here")
    args = parser.parse_args(argv)

    stats = analyse(args.data_dir, args.version, args.split)
    print(f"split={stats['split']}  questions={stats['num_questions']}  "
          f"images={stats['num_images']}")
    _print_hist("answer types", stats["answer_types"].items(),
                stats["num_annotations"])
    _print_hist("top question types",
                list(stats["question_types"].items())[:15],
                stats["num_annotations"])
    _print_hist("top answers", list(stats["top_answers"].items())[:15],
                stats["num_annotations"])

    if args.out:
        with open(args.out, "w") as f:
            json.dump(stats, f, indent=2)
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
