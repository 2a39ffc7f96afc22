"""One-command reproduction of the reference's published accuracies.

The reference repo's only benchmark numbers are four VQA-v2 val accuracies
(results/*.txt, SURVEY.md §6; best: mhb_coAtt 0.555084). This driver runs
the complete chain that produces them — weight conversion, QA preprocessing,
feature extraction for both COCO splits, optional GloVe table, 18-epoch
training, full-split evaluation — and gates each result against the
published number (BASELINE.md: within 0.1%).

It needs the real inputs the execution environment does not ship:
  <data_dir>/vqa/v2_OpenEnded_mscoco_{train,val}2014_questions.json
  <data_dir>/vqa/v2_mscoco_{train,val}2014_annotations.json
  <data_dir>/vqa/{train,val}2014/           (COCO images)
  --resnet_weights resnet152.pth|.npz       (torchvision pretrained)
  --glove_vectors glove.840B.300d.txt       (optional, mhb_coAtt+glove)

Every step is idempotent (skipped when its artifact exists; --force redoes
all). Run `--dry_run` to see the plan without executing.

Usage:
  python tools/reproduce.py --data_dir /path/to/data \
      --resnet_weights resnet152.pth --models mhb_coAtt,mfb
"""

import argparse
import json
import os
import subprocess
import sys

# published numbers this chain must land within 0.1% of (reference
# results/*.txt; SURVEY.md §6)
PUBLISHED = {
    "mfb": 0.532577,
    "mfb-multilayer": 0.533251,
    "mhb": 0.515296,
    "mhb_coAtt": 0.555084,
}
GATE = 0.001  # absolute accuracy budget (BASELINE.md "within 0.1%")


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, dry):
    print("+ " + " ".join(cmd), flush=True)
    if dry:
        return
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(cmd, check=True, env=env)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--models", default="mhb_coAtt",
                   help=f"comma list of {sorted(PUBLISHED)}")
    p.add_argument("--resnet_weights", default=None,
                   help="torchvision resnet152 state_dict (.pth or "
                        "pre-converted .npz)")
    p.add_argument("--glove_vectors", default=None,
                   help="glove.840B.300d-style text file (enables --glove "
                        "for mhb_coAtt, the reference's best setting)")
    p.add_argument("--num_answer", type=int, default=1000)
    p.add_argument("--version", type=int, default=2)
    p.add_argument("--compute_dtype", default="bfloat16",
                   help="bfloat16 (TPU fast path) | float32 (closest to the "
                        "reference's CUDA f32 numerics)")
    p.add_argument("--num_epoch", type=int, default=18)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--extract_batch", type=int, default=32)
    p.add_argument("--force", action="store_true")
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args(argv)

    d = args.data_dir
    models = [m.strip() for m in args.models.split(",") if m.strip()]
    unknown = [m for m in models if m not in PUBLISHED]
    if unknown:
        sys.exit(f"no published accuracy for {unknown}; "
                 f"choose from {sorted(PUBLISHED)}")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    # ---- preconditions --------------------------------------------------
    # raw inputs are only needed by the steps that will actually run: a
    # re-invocation with the QA artifact + feature stores already built
    # (e.g. after deleting ~50 GB of raw COCO images) must not be blocked
    from vqa_attention_networks_tpu.data.prepare import (
        qa_artifact_path as _qap,
    )

    need_json = args.force or not os.path.exists(
        _qap(d, args.version, args.num_answer) + ".npz"
    )
    missing = []
    for split in ("train", "val"):
        if need_json:
            for f in (f"v{args.version}_OpenEnded_mscoco_{split}2014_"
                      "questions.json",
                      f"v{args.version}_mscoco_{split}2014_annotations.json"):
                if not os.path.exists(os.path.join(d, "vqa", f)):
                    missing.append(f"vqa/{f}")
        need_feats = args.force or not os.path.exists(
            os.path.join(d, f"resnet152_{split}", "features.bin")
        )
        if need_feats and not os.path.isdir(
            os.path.join(d, "vqa", f"{split}2014")
        ):
            missing.append(f"vqa/{split}2014/ (COCO images)")
    if missing and not args.dry_run:
        sys.exit("missing inputs under --data_dir:\n  " +
                 "\n  ".join(missing))
    if missing:
        print("NOTE (dry run): missing inputs:\n  " + "\n  ".join(missing))

    py = [sys.executable, "-m"]
    pkg = "vqa_attention_networks_tpu.cli"
    from vqa_attention_networks_tpu.data.prepare import qa_artifact_path

    qa_base = qa_artifact_path(d, args.version, args.num_answer)

    # ---- 1. pretrained weights -> npz -----------------------------------
    weights_npz = None
    if args.resnet_weights:
        if args.resnet_weights.endswith(".npz"):
            weights_npz = args.resnet_weights
        else:
            weights_npz = os.path.join(d, "resnet152_weights.npz")
            if args.force or not os.path.exists(weights_npz):
                # paths go through argv, never spliced into source (a quote
                # or backslash in a path would be a SyntaxError otherwise)
                run([sys.executable, "-c",
                     "import sys; "
                     f"from {pkg}.extract_features import convert_weights; "
                     "convert_weights(sys.argv[1:])",
                     args.resnet_weights, weights_npz], args.dry_run)
    else:
        print("WARNING: no --resnet_weights. Features will come from a "
              "RANDOM trunk and accuracies will NOT reproduce "
              "(extract_image_features.py:22 uses pretrained resnet152).")

    # ---- 2. QA preprocessing --------------------------------------------
    if args.force or not os.path.exists(qa_base + ".npz"):
        run(py + [f"{pkg}.prepare_data", "--data_dir", d,
                  "--num_answer", str(args.num_answer),
                  "--version", str(args.version)], args.dry_run)

    # ---- 3. feature extraction (both splits) ----------------------------
    for split in ("train", "val"):
        out = os.path.join(d, f"resnet152_{split}")
        if not args.force and os.path.exists(
                os.path.join(out, "features.bin")):
            continue
        cmd = py + [f"{pkg}.extract_features", "--split", split,
                    "--output_dir", d,
                    "--image_dir", os.path.join(d, "vqa", f"{split}2014"),
                    "--batch_size", str(args.extract_batch)]
        if weights_npz:
            cmd += ["--weights", weights_npz]
        run(cmd, args.dry_run)

    # ---- 4. GloVe table (optional) ---------------------------------------
    use_glove = bool(args.glove_vectors)
    if use_glove:
        table = os.path.join(d, "glove_table.npy")
        if args.force or not os.path.exists(table):
            run(py + [f"{pkg}.build_glove",
                      "--vocab", qa_base + ".vocab.json",
                      "--out", table,
                      "--vectors", args.glove_vectors], args.dry_run)

    # ---- 5. train + evaluate each model ----------------------------------
    verdicts = {}
    for model in models:
        base = py + [f"{pkg}.train", "--model_name", model,
                     "--data_dir", d,
                     "--num_answer", str(args.num_answer),
                     "--version", str(args.version),
                     "--batch_size", str(args.batch_size),
                     "--compute_dtype", args.compute_dtype]
        if model == "mhb_coAtt" and use_glove:
            base += ["--glove", "1"]
        res = os.path.join("results", f"{model}.json")
        if args.force or not os.path.exists(res):
            # --resume makes an interrupted 18-epoch run continue from its
            # last checkpoint instead of restarting epoch 0
            run(base + ["--num_epoch", str(args.num_epoch), "--resume"],
                args.dry_run)
            run(base + ["--mode", "testing"], args.dry_run)
        else:
            print(f"skipping {model}: {res} exists (use --force to redo)")

        if args.dry_run or not os.path.exists(res):
            continue
        with open(res) as f:
            got = json.load(f)["accuracy_reference_denominator"]
        want = PUBLISHED[model]
        ok = abs(got - want) <= GATE
        verdicts[model] = (got, want, ok)

    if verdicts:
        print("\n=== reproduction verdicts (gate: ±0.1% absolute) ===")
        for model, (got, want, ok) in verdicts.items():
            print(f"  {model:16s} got {got:.6f}  published {want:.6f}  "
                  f"{'PASS' if ok else 'FAIL'}")
        if not all(ok for _, _, ok in verdicts.values()):
            sys.exit(1)


if __name__ == "__main__":
    main()
