"""Convert a reference ``models/<name>.pth`` into this framework's
weights checkpoint.

The reference's only training artifact is a torch state_dict written by
``clean_state_dict`` (reference solver.py:184-190, utils.py:12-19). This
tool imports it (utils/torch_import.py) and writes the orbax weights
layout every serving/predict path here loads — after which the converted
model works with ``cli.predict``, ``cli.serve`` and ``cli.evaluate``
unchanged:

    python -m tools.import_torch --model_name mhb_coAtt \
        --torch_checkpoint /path/mhb_coAtt.pth \
        --vocab data/qa_v2_1000answers_all.vocab.json --out ./models

(Evaluation can also consume the .pth directly:
``python -m vqa_attention_networks_tpu.cli.evaluate --torch_checkpoint ...``.)
"""

import argparse
import json

import jax

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.utils import checkpoint as ckpt
from vqa_attention_networks_tpu.utils.torch_import import (
    import_state_dict,
    load_pth,
)


def main(argv=None) -> None:
    from vqa_attention_networks_tpu.utils.runtime import setup as _rt_setup
    _rt_setup()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, required=True)
    parser.add_argument("--torch_checkpoint", type=str, required=True)
    parser.add_argument("--vocab", type=str, required=True,
                        help="the .vocab.json artifact the model was "
                             "trained against (sizes every projection)")
    parser.add_argument("--out", type=str, default="./models",
                        help="weights land in <out>/<model_name>/weights")
    parser.add_argument("--img_feature_channel", type=int, default=2048)
    parser.add_argument("--image_first", type=int, default=0)
    parser.add_argument("--glove", type=int, default=0)
    parser.add_argument("--glove_table", type=str, default=None,
                        help="data/glove_table.npy for --glove 1 (the "
                             "frozen table is a framework param with no "
                             ".pth counterpart)")
    args = parser.parse_args(argv)

    with open(args.vocab) as f:
        vocab = json.load(f)
    cfg = Config(
        model_name=args.model_name,
        q_vocab_size=vocab["question_vocab"]["UNK"] + 1,
        a_vocab_size=len(vocab["answer_vocab"]),
        max_question_length=vocab["max_question_length"],
        img_feature_channel=args.img_feature_channel,
        image_first=bool(args.image_first),
        glove=bool(args.glove),
    ).validate()

    model = get_model(cfg.model_name)
    if cfg.glove:
        if not args.glove_table:
            # the .pth has no GloVe entries; importing without a real table
            # would silently bake a ZERO table into the written checkpoint
            raise SystemExit(
                "--glove 1 needs --glove_table (build data/glove_table.npy "
                "with cli.build_glove): the .pth carries no GloVe vectors"
            )
        import numpy as np

        template = model.init(jax.random.PRNGKey(0), cfg,
                              glove_table=np.load(args.glove_table))
    else:
        template = model.init(jax.random.PRNGKey(0), cfg)

    params = import_state_dict(
        cfg.model_name, load_pth(args.torch_checkpoint), template
    )
    path = ckpt.save_weights(f"{args.out}/{cfg.model_name}", params)
    print(f"imported {args.torch_checkpoint} -> {path}")


if __name__ == "__main__":
    main()
