"""Export a framework weights checkpoint as a reference ``models/<name>.pth``.

The inverse of ``tools/import_torch.py``: takes the orbax weights this
framework trains/saves (utils/checkpoint.py) and writes a torch state_dict
in the exact layout the reference's loaders expect — ``clean_state_dict``
keys (reference solver.py:184-190, utils.py:12-19), loadable by
``predict_pytorch.py:70-79`` / ``train_models.py:58-60``. A model trained
here can be handed back to a reference user unchanged:

    python -m tools.export_torch --model_name mhb_coAtt \
        --model_dir ./models --vocab data/qa_v2_1000answers_all.vocab.json \
        --out mhb_coAtt.pth

Layout conversion (dense->conv1d transposes, LSTM gate order and bias
pairs, BatchNorm running stats) is utils/torch_import.py:export_state_dict,
which round-trips bit-exactly through import_state_dict
(tests/test_torch_import.py).
"""

import argparse
import json

import jax

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.utils import checkpoint as ckpt
from vqa_attention_networks_tpu.utils.torch_import import export_state_dict


def main(argv=None) -> None:
    from vqa_attention_networks_tpu.utils.runtime import setup as _rt_setup
    _rt_setup()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, required=True)
    parser.add_argument("--model_dir", type=str, default="./models",
                        help="directory holding <model_name>/weights (the "
                             "train CLI's save layout)")
    parser.add_argument("--vocab", type=str, required=True,
                        help="the .vocab.json artifact the model was "
                             "trained against (sizes every projection)")
    parser.add_argument("--out", type=str, default=None,
                        help="output path (default <model_name>.pth)")
    parser.add_argument("--img_feature_channel", type=int, default=2048)
    parser.add_argument("--image_first", type=int, default=0)
    parser.add_argument("--glove", type=int, default=0)
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
    template = model.init(jax.random.PRNGKey(0), cfg)
    params = ckpt.load_weights(f"{args.model_dir}/{cfg.model_name}", template)

    state = export_state_dict(cfg.model_name, params)

    import torch

    out = args.out or f"{cfg.model_name}.pth"
    torch.save({k: torch.from_numpy(v.copy()) for k, v in state.items()}, out)
    print(f"exported {len(state)} tensors -> {out}")


if __name__ == "__main__":
    main()
