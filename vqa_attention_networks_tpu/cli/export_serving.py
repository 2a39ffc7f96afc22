"""Export an AOT serving artifact (StableHLO graph + metadata sidecar).

Build-box half of the deployment story (aot.py): lower the fixed-batch
serving forward for a target platform and write it to disk. The serving
box then runs ``cli.serve --aot_artifact <dir>`` — no model re-tracing,
and a pinned serving graph that library upgrades cannot silently change.

Drive:
  python -m vqa_attention_networks_tpu.cli.export_serving \\
      --data_dir data --model_name mhb_coAtt --batch_size 64 \\
      --out models/mhb_coAtt/serving_aot [--platforms tpu]
"""

import argparse
import json

import jax

from vqa_attention_networks_tpu.aot import save_serving_artifact
from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.data.feature_store import open_feature_store
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.utils import checkpoint as ckpt


def main(argv=None) -> None:
    from vqa_attention_networks_tpu.utils.runtime import setup as _rt_setup
    _rt_setup()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, default="mhb_coAtt")
    parser.add_argument("--model_dir", type=str, default="./models")
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument("--vocab", type=str, default=None)
    parser.add_argument("--feature_type", type=str, default="resnet152")
    parser.add_argument("--version", type=int, default=2)
    parser.add_argument("--num_answer", type=int, default=1000)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--topk", type=int, default=5)
    parser.add_argument("--platforms", type=str, default=None,
                        help="comma list (e.g. 'tpu'); default = the "
                             "current backend")
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args(argv)

    vocab_path = args.vocab or (
        f"{args.data_dir}/qa_v{args.version}_{args.num_answer}answers_all"
        ".vocab.json"
    )
    with open(vocab_path) as f:
        vocab = json.load(f)
    store = open_feature_store(args.data_dir, args.feature_type)

    cfg = Config(
        model_name=args.model_name,
        q_vocab_size=vocab["question_vocab"]["UNK"] + 1,
        a_vocab_size=len(vocab["answer_vocab"]),
        max_question_length=vocab["max_question_length"],
        img_feature_channel=store.channels,
        compute_dtype="bfloat16",
    ).validate()
    model = get_model(cfg.model_name)
    template = model.init(jax.random.PRNGKey(0), cfg)
    params = ckpt.load_weights(f"{args.model_dir}/{cfg.model_name}", template)

    platforms = (
        tuple(p.strip() for p in args.platforms.split(",") if p.strip())
        if args.platforms else None
    )
    # the artifact's feature-input dtype must match the store the serving
    # box will gather from: int8 stores serve the quantized feed
    input_dtype = "int8" if getattr(store, "quantized", False) else "float16"
    out = save_serving_artifact(
        args.out, cfg, params, args.batch_size, args.topk, platforms,
        input_dtype,
    )
    print(f"serving artifact written to {out} (input_dtype={input_dtype})")


if __name__ == "__main__":
    main()
