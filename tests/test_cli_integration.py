"""End-to-end CLI integration: prepare -> train -> evaluate -> predict
through the real argparse entry points (SURVEY section 3 call stacks),
on synthetic data with a tiny random backbone."""

import json
import os

import numpy as np
import pytest

from vqa_attention_networks_tpu.data.feature_store import (
    make_synthetic_feature_store,
)
from vqa_attention_networks_tpu.data.prepare import (
    load_qa_data,
    qa_artifact_path,
)

from tests.test_prepare import _mini_vqa_json


@pytest.fixture()
def workspace(tmp_path, monkeypatch):
    """A data_dir with prepared QA artifact + synthetic feature store."""
    data_dir = _mini_vqa_json(tmp_path)
    monkeypatch.chdir(tmp_path)

    from vqa_attention_networks_tpu.cli import prepare_data

    prepare_data.main(["--data_dir", data_dir, "--num_answer", "5"])
    qa = load_qa_data(qa_artifact_path(data_dir, 2, 5))

    image_ids = sorted(set(qa.train.image_ids) | set(qa.val.image_ids))
    make_synthetic_feature_store(
        os.path.join(data_dir, "resnet152_all"), image_ids,
        num_regions=196, channels=2048,
    )
    return data_dir, qa


def test_train_evaluate_predict_cli(workspace, tmp_path, monkeypatch):
    data_dir, qa = workspace

    from vqa_attention_networks_tpu.cli import predict, train

    common = [
        "--model_name", "iBOWIMG",
        "--data_dir", data_dir,
        "--num_answer", "5",
        "--batch_size", "4",
    ]
    # rename artifact path contract: train CLI expects the default store name
    train.main(common + ["--mode", "training", "--num_epoch", "1"])
    assert os.path.exists("models/iBOWIMG/weights")

    train.main(common + ["--mode", "testing"])
    results = open("results/iBOWIMG.txt").read()
    assert results.startswith("Evaluation accuracy: ")
    sidecar = json.load(open("results/iBOWIMG.json"))
    assert 0.0 <= sidecar["accuracy"] <= 1.0
    assert "top3_accuracy" in sidecar
    # official perQuestionType breakdown (fixture carries question_type);
    # counts reconcile with the split size
    per_q = sidecar["per_question_type"]
    assert set(per_q) <= {"how many", "is the", "what color is the"}
    assert (sum(v["num_examples"] for v in per_q.values())
            == sidecar["num_examples"])
    # consensus buckets reconcile with the split-level consensus (the
    # official accPerQuesType metric)
    consensus_sum = sum(
        v["vqa_consensus_accuracy"] * v["num_examples"]
        for v in per_q.values()
    )
    np.testing.assert_allclose(
        consensus_sum,
        sidecar["vqa_consensus_accuracy"] * sidecar["num_examples"],
        atol=1e-6,
    )

    # predict on a generated image with a tiny random backbone
    from PIL import Image

    img_path = str(tmp_path / "cat.jpg")
    Image.fromarray(
        (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    ).save(img_path)

    from vqa_attention_networks_tpu.models import resnet

    real_init = resnet.random_init
    monkeypatch.setattr(
        resnet, "random_init",
        lambda rng, **kw: real_init(rng, stages=(1, 1, 1, 1)),
    )

    predict.main([
        "--image_path", img_path,
        "--model_name", "iBOWIMG",
        "--model_dir", "./models",
        "--vocab", qa_artifact_path(data_dir, 2, 5) + ".vocab.json",
        "--question", "What color is the cat?",
        # iBOWIMG exposes no attention maps: the flag must no-op cleanly
        "--dump_attention", str(tmp_path / "att.npz"),
    ])
    assert not os.path.exists(tmp_path / "att.npz")


def test_predict_dumps_attention_maps(tmp_path):
    """--dump_attention writes the family's aux maps (hieCoAtten av/aq)."""
    import argparse

    import jax

    from vqa_attention_networks_tpu.cli.predict import _predict
    from vqa_attention_networks_tpu.config import Config
    from vqa_attention_networks_tpu.models import get_model

    cfg = Config(
        model_name="hieCoAtten", q_vocab_size=20, a_vocab_size=6,
        hidden_dim=8, emb_dim=8, embed_size=8, img_feature_channel=16,
        max_question_length=5, mfb_factor=5, mfb_out=8,
    ).validate()
    model = get_model("hieCoAtten")
    params = model.init(jax.random.PRNGKey(0), cfg)
    feats = np.zeros((1, 196, 16), np.float32)
    ids = np.asarray([[3, 4, 0, 0, 0]], np.int32)
    qlen = np.asarray([2], np.int32)
    out = tmp_path / "att.npz"
    args = argparse.Namespace(topk=2, dump_attention=str(out))
    _predict(args, model, params, cfg, feats, ids, qlen,
             {i: f"a{i}" for i in range(6)})
    maps = np.load(out)
    assert maps["av"].shape == (196,)
    assert maps["aq"].shape == (5,)

    # mhb_coAtt's fused eval path returns None aux entries (train-only
    # captures): the flag must no-op, not crash on np.asarray(None)
    cfg2 = Config(
        model_name="mhb_coAtt", q_vocab_size=20, a_vocab_size=6,
        hidden_dim=8, emb_dim=8, embed_size=8, img_feature_channel=16,
        max_question_length=5, mfb_factor=5, mfb_out=8,
    ).validate()
    model2 = get_model("mhb_coAtt")
    params2 = model2.init(jax.random.PRNGKey(0), cfg2)
    out2 = tmp_path / "att2.npz"
    args2 = argparse.Namespace(topk=2, dump_attention=str(out2))
    _predict(args2, model2, params2, cfg2, feats, ids, qlen,
             {i: f"a{i}" for i in range(6)})
    assert not out2.exists()


def test_torch_checkpoint_through_cli(workspace, tmp_path):
    """A reference-layout .pth drives evaluation directly
    (``--torch_checkpoint``) and converts to a served orbax checkpoint
    (tools/import_torch.py) — the trained-reference-weights path."""
    torch = pytest.importorskip("torch")
    data_dir, qa = workspace

    e = 512  # Config.embed_size default (networks.py:8 iBOWIMG embed)
    g = torch.Generator().manual_seed(0)

    def rnd(*shape):
        return torch.randn(*shape, generator=g)

    sd = {
        "img_emb.weight": rnd(e, 2048), "img_emb.bias": rnd(e),
        "img_bn.weight": rnd(e), "img_bn.bias": rnd(e),
        "img_bn.running_mean": rnd(e),
        "img_bn.running_var": rnd(e).abs() + 0.5,
        "img_bn.num_batches_tracked": torch.tensor(7),
        "que_emb.weight": rnd(qa.q_vocab_size, e),
        "fc.weight": rnd(qa.a_vocab_size, 2 * e),
        "fc.bias": rnd(qa.a_vocab_size),
    }
    pth = str(tmp_path / "iBOWIMG.pth")
    torch.save(sd, pth)

    from vqa_attention_networks_tpu.cli import evaluate

    evaluate.main([
        "--model_name", "iBOWIMG", "--data_dir", data_dir,
        "--num_answer", "5", "--batch_size", "4",
        "--torch_checkpoint", pth,
    ])
    results = open("results/iBOWIMG.txt").read()
    assert results.startswith("Evaluation accuracy: ")

    import tools.import_torch as it

    it.main([
        "--model_name", "iBOWIMG", "--torch_checkpoint", pth,
        "--vocab", qa_artifact_path(data_dir, 2, 5) + ".vocab.json",
        "--out", str(tmp_path / "imported_models"),
    ])
    assert os.path.exists(str(tmp_path / "imported_models/iBOWIMG/weights"))

    # the converted weights round-trip through the standard loader and
    # match the importer's tree exactly
    from vqa_attention_networks_tpu.utils import checkpoint as ckpt
    from vqa_attention_networks_tpu.utils.torch_import import (
        import_state_dict,
    )
    import jax
    from vqa_attention_networks_tpu.config import Config
    from vqa_attention_networks_tpu.models import get_model

    cfg = Config(
        model_name="iBOWIMG", q_vocab_size=qa.q_vocab_size,
        a_vocab_size=qa.a_vocab_size,
        max_question_length=qa.max_question_length,
    ).validate()
    template = get_model("iBOWIMG").init(jax.random.PRNGKey(0), cfg)
    want = import_state_dict(
        "iBOWIMG", {k: v.numpy() for k, v in sd.items()}, template
    )
    got = ckpt.load_weights(str(tmp_path / "imported_models/iBOWIMG"), template)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        want, got,
    )


def test_evaluate_mode_detection_is_token_wise(monkeypatch):
    # "--model_name" contains "--mode" as a substring: the old check
    # skipped appending "--mode testing" and silently ran a full TRAINING
    # (overwriting the weights under evaluation)
    from vqa_attention_networks_tpu.cli import evaluate as ev

    captured = {}
    monkeypatch.setattr(ev, "_train_main", lambda a: captured.update(argv=a))

    ev.main(["--model_name", "hieCoAtten"])
    assert captured["argv"][-2:] == ["--mode", "testing"]

    ev.main(["--model_name", "mhb", "--mode", "training"])
    assert captured["argv"].count("--mode") == 1
    assert "testing" not in captured["argv"]

    ev.main(["--mode=testing"])
    assert captured["argv"] == ["--mode=testing"]
