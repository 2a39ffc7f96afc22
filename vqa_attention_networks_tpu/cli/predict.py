"""Single-image prediction CLI (counterpart of predict_pytorch.py:15-94).

Flow: image -> jit-compiled CNN feature grid -> tokenize question
(LEFT-aligned, the training encode — see the documented deviation at the
encode site below) -> model forward -> print the argmax answer and the
top-5 (predict_pytorch.py:85-91).

The reference's predict path is stale (imports modules that don't exist,
predict_pytorch.py:3,11); this one runs against checkpoints written by the
train CLI. The CNN is the ResNet-152 trunk by default (what the trained
models consume — [196, 2048] grids); ``--backbone vgg19`` reproduces the
reference's VGG19 tap (predict_pytorch.py:34-37).
"""

import argparse
import json

import jax
import numpy as np

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.data.text import encode_question
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.utils import checkpoint as ckpt


def main(argv=None) -> None:
    from vqa_attention_networks_tpu.utils.runtime import setup as _rt_setup
    _rt_setup()
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_path", type=str, default="data/cat.jpg")
    parser.add_argument("--model_name", type=str, default="mhb_coAtt")
    parser.add_argument("--model_dir", type=str, default="./models")
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument("--vocab", type=str, default=None,
                        help="path to the .vocab.json artifact")
    parser.add_argument("--question", type=str,
                        default="Which animal is this?")
    parser.add_argument("--backbone", type=str, default="resnet152",
                        help="resnet152|vgg19")
    parser.add_argument("--weights", type=str, default=None,
                        help=".npz of torchvision backbone state_dict")
    parser.add_argument("--topk", type=int, default=5)
    parser.add_argument("--dump_attention", type=str, default=None,
                        help="write the attention maps the family exposes "
                             "at eval time (hieCoAtten av/aq region/word "
                             "maps, mfb glimpse logits) to this .npz; "
                             "mhb_coAtt's fused eval path does not "
                             "materialise its glimpse logits")
    parser.add_argument("--image_first", type=int, default=0,
                        help="MUST match the flag the checkpoint was "
                             "trained with (visLstm token order)")
    parser.add_argument("--glove", type=int, default=0,
                        help="set 1 for checkpoints trained with --glove 1 "
                             "(mhb_coAtt: doubled LSTM input + glove table)")
    parser.add_argument("--glove_table", type=str, default=None,
                        help="data/glove_table.npy — required with "
                             "--glove 1 --torch_checkpoint (the .pth has "
                             "no GloVe vectors)")
    parser.add_argument("--torch_checkpoint", type=str, default=None,
                        help="a reference models/<name>.pth state_dict to "
                             "predict with, imported in place of the orbax "
                             "checkpoint under --model_dir")
    args = parser.parse_args(argv)

    print(f"Image: {args.image_path}")
    print(f"Question: {args.question}")

    vocab_path = args.vocab or f"{args.data_dir}/qa_v2_1000answers_all.vocab.json"
    with open(vocab_path) as f:
        vocab = json.load(f)
    q_vocab = vocab["question_vocab"]
    max_len = vocab["max_question_length"]
    ans_of = {i: a for a, i in vocab["answer_vocab"].items()}

    # ---- image -> feature grid (models/extractor.py — the ONE
    # implementation shared with serving's /predict_image, so predict-time
    # and served features cannot drift apart in preprocessing) ------------
    from PIL import Image

    from vqa_attention_networks_tpu.models.extractor import GridExtractor

    try:
        extractor = GridExtractor(args.backbone, args.weights or None,
                                  warmup=False)
    except ValueError as e:
        raise SystemExit(str(e))
    if extractor.random_weights:
        print("WARNING: random backbone (no --weights)")
    feats = extractor.from_pil(Image.open(args.image_path))[None]
    channels = extractor.channels

    # ---- question -> LEFT-aligned ids, the TRAINING encode (prepare.py) --
    # Documented deviation: the reference's predict script right-aligns
    # (predict_pytorch.py:61-66) while its training prep left-aligns — a
    # skew in its (import-broken) predict path, not a behavior to keep.
    # Models gather the last-valid LSTM state at ques_length-1; a
    # right-aligned encode would point that into the leading pad run.
    ids = np.asarray(
        [encode_question(args.question, q_vocab, max_len)], np.int32
    )
    qlen = np.asarray([max(int((ids != 0).sum()), 1)], np.int32)

    # ---- model ------------------------------------------------------------
    cfg = Config(
        model_name=args.model_name,
        q_vocab_size=vocab["question_vocab"]["UNK"] + 1,
        a_vocab_size=len(vocab["answer_vocab"]),
        max_question_length=max_len,
        img_feature_channel=channels,
        image_first=bool(args.image_first),
        glove=bool(args.glove),
    ).validate()
    model = get_model(cfg.model_name)
    if cfg.glove and cfg.model_name == "mhb_coAtt":
        glove_table = None
        if args.torch_checkpoint:
            # a reference .pth has NO glove entries (the reference looks
            # vectors up via spaCy at load time, data_loader.py:18-23) —
            # without a real table the import would silently zero half the
            # LSTM input and predict garbage
            if not args.glove_table:
                raise SystemExit(
                    "--glove 1 with --torch_checkpoint needs --glove_table "
                    "(build data/glove_table.npy with cli.build_glove): the "
                    ".pth carries no GloVe vectors"
                )
            import numpy as _np

            glove_table = _np.load(args.glove_table)
        # template needs the glove_table leaf; orbax checkpoints supply the
        # real (frozen) vectors at restore
        template = model.init(jax.random.PRNGKey(0), cfg,
                              glove_table=glove_table)
    else:
        template = model.init(jax.random.PRNGKey(0), cfg)
    if args.torch_checkpoint:
        from vqa_attention_networks_tpu.utils.torch_import import (
            import_state_dict, load_pth,
        )
        params = import_state_dict(
            cfg.model_name, load_pth(args.torch_checkpoint), template
        )
        _predict(args, model, params, cfg, feats, ids, qlen, ans_of)
        return
    try:
        params = ckpt.load_weights(
            f"{args.model_dir}/{cfg.model_name}", template
        )
    except Exception as e:  # orbax raises deep tensorstore shape errors
        if "not compatible with the stored shape" in str(e):
            raise SystemExit(
                f"checkpoint under {args.model_dir}/{cfg.model_name} was "
                f"trained with different shapes than this invocation "
                f"implies (q_vocab={cfg.q_vocab_size}, "
                f"a_vocab={cfg.a_vocab_size}, "
                f"img_channels={cfg.img_feature_channel} from "
                f"--backbone {args.backbone}) — pass the vocab artifact "
                f"the model was trained with, and the backbone whose "
                f"features it consumed (resnet152-trained checkpoints "
                f"cannot read vgg19's 512-channel grids)"
            )
        raise

    _predict(args, model, params, cfg, feats, ids, qlen, ans_of)


def _predict(args, model, params, cfg, feats, ids, qlen, ans_of) -> None:
    logits, aux = model.apply(params, cfg, feats, ids, ques_length=qlen)
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
    order = np.argsort(-probs)

    print("Ans:", ans_of[int(order[0])])
    print("Top Answers")
    for i in order[: args.topk]:
        print(f"  {ans_of[int(i)]}  ({probs[i]:.4f})")

    if args.dump_attention:
        # everything the family exposes except training-only BN stats
        # (hieCoAtten: av [196] region / aq [T] word maps — the reference's
        # returned attention maps, hieCoAtten.py:55; mfb: the 2-glimpse
        # attention logits). None entries are train-only captures the eval
        # graph skips (mhb_coAtt's fused attention never materialises them).
        maps = {
            k: np.asarray(v)[0]
            for k, v in aux.items()
            if k != "batch_stats" and v is not None
        }
        if maps and cfg.model_name in ("mfb", "mfb-multilayer") \
                and cfg.keep_reference_quirks:
            # under the preserved reference quirk the glimpse pooling is
            # UNIFORM (softmax over a singleton axis, mfb.py:84,118) — flag
            # the dump so viewers don't present the logits as the weights
            # the model actually pooled with
            maps["uniform_quirk"] = np.asarray(True)
        if maps:
            np.savez(args.dump_attention, **maps)
            shapes = ", ".join(f"{k} {v.shape}" for k, v in maps.items())
            print(f"Attention maps -> {args.dump_attention} ({shapes})")
        else:
            print(f"{cfg.model_name} exposes no attention maps; "
                  "nothing written")


if __name__ == "__main__":
    main()
