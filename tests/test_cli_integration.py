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
    ])


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
