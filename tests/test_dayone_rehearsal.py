"""Day-one real-data rehearsal (VERDICT r3 item 7).

One chain that flows REFERENCE-FORMAT inputs through the ENTIRE real
pipeline, so the first run on real VQA-v2 data exercises zero first-ever
code paths:

  official-schema VQA-v2 JSON  (questions + annotations, both splits)
    -> cli.prepare_data                  (QA artifact + vocab)
  torchvision-layout resnet152 state_dict saved with torch.save (.pth)
    -> cli.extract_features.convert_weights   (.pth -> .npz)
    -> cli.extract_features for BOTH splits from COCO-named JPEGs at the
       production 448 resolution              (14x14x2048 feature stores)
    -> cli.train --mode training              (2 epochs)
    -> cli.train --mode testing               (full eval: official
       consensus + per-type + perQuestionType + submission export)
    -> tools.export_torch                     (reference-loadable .pth)
    -> cli.predict --torch_checkpoint         (image+question -> answer)

This is exactly the `tools/reproduce.py` step list (reference chain:
extract_image_features.py:28-85, train_models.py:35-70) with miniature
inputs; the trunk is depth-reduced (full 152 layers at 448 is minutes on
this CPU) — the conversion/padding semantics it rehearses are per-layer,
not per-depth, and tests/test_torch_parity.py pins full-depth parity
separately.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("PIL")

from tests.test_prepare import _mini_vqa_json  # noqa: E402
from tests.test_torch_parity import (  # noqa: E402
    _randomize_state_dict,
    _ResNetTrunk,
)

MODEL = "iBOWIMG"  # cheapest family at production dims; the chain under
#                    test (artifacts, extraction, eval metrics, .pth
#                    round-trip) is family-independent and every family's
#                    import/export parity is pinned by test_torch_import.py


@pytest.mark.slow
def test_dayone_real_data_chain(tmp_path, monkeypatch, capsys):
    from PIL import Image

    data_dir = _mini_vqa_json(tmp_path)
    monkeypatch.chdir(tmp_path)

    # ---- 1. QA preprocessing on the official-schema JSON ----------------
    from vqa_attention_networks_tpu.cli import extract_features as ex
    from vqa_attention_networks_tpu.cli import predict, prepare_data, train
    from vqa_attention_networks_tpu.data.prepare import qa_artifact_path

    prepare_data.main(["--data_dir", data_dir, "--num_answer", "5"])
    vocab_path = qa_artifact_path(data_dir, 2, 5) + ".vocab.json"
    assert os.path.exists(vocab_path)

    # ---- 2. a real-FORMAT torchvision state_dict, saved by torch --------
    torch.manual_seed(0)
    trunk = _ResNetTrunk(layers=(1, 1, 1, 1)).eval()
    _randomize_state_dict(trunk, seed=5)
    pth = str(tmp_path / "resnet152.pth")
    torch.save(trunk.state_dict(), pth)

    # ---- 3. .pth -> .npz via the shipped converter -----------------------
    npz = str(tmp_path / "resnet152.npz")
    ex.convert_weights([pth, npz])

    # ---- 4. feature extraction, both splits, production 448 resolution --
    split_ids = {"train": [10, 11, 12, 14], "val": [13]}
    rng = np.random.default_rng(0)
    for split, ids in split_ids.items():
        img_dir = tmp_path / f"imgs_{split}"
        img_dir.mkdir()
        for i in ids:
            arr = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
            Image.fromarray(arr).save(
                img_dir / f"COCO_{split}2014_{i:012d}.jpg"
            )
        ex.main([
            "--split", split, "--image_dir", str(img_dir),
            "--output_dir", data_dir, "--batch_size", "2",
            "--weights", npz,
        ])
    from vqa_attention_networks_tpu.data.feature_store import FeatureStore

    store = FeatureStore(os.path.join(data_dir, "resnet152_train"))
    assert sorted(store.row_of) == split_ids["train"]
    assert store.gather([10], dtype=np.float32).shape == (1, 196, 2048)

    # ---- 5. train through the CLI (combined train+val stores) -----------
    common = [
        "--model_name", MODEL, "--data_dir", data_dir,
        "--num_answer", "5", "--batch_size", "4",
    ]
    train.main(common + ["--mode", "training", "--num_epoch", "2"])
    assert os.path.exists(f"models/{MODEL}/weights")

    # ---- 6. full eval: official metrics + submission export -------------
    train.main(common + ["--mode", "testing"])
    rec = json.load(open(f"results/{MODEL}.json"))
    assert "vqa_consensus_accuracy" in rec
    assert 0.0 <= rec["vqa_consensus_accuracy"] <= 1.0
    assert set(rec["per_answer_type"]) <= {"yes/no", "number", "other"}
    assert rec["per_question_type"], rec.keys()  # ~official breakdown
    sub = json.load(open(f"results/{MODEL}_predictions.json"))
    assert {r["question_id"] for r in sub} == {5, 6}  # the val questions
    for r in sub:
        assert isinstance(r["answer"], str)

    # ---- 7. export a reference-loadable .pth, predict with it -----------
    import tools.export_torch as export_torch

    out_pth = str(tmp_path / f"{MODEL}_trained.pth")
    export_torch.main([
        "--model_name", MODEL, "--model_dir", "./models",
        "--vocab", vocab_path, "--out", out_pth,
    ])
    # the export is a real torch-loadable file in the reference layout
    sd = torch.load(out_pth, map_location="cpu", weights_only=True)
    assert any(k.endswith("weight") for k in sd)

    capsys.readouterr()
    predict.main([
        "--model_name", MODEL,
        "--image_path",
        str(tmp_path / "imgs_train" / f"COCO_train2014_{10:012d}.jpg"),
        "--question", "What color is the cat?",
        "--vocab", vocab_path,
        "--weights", npz,
        "--torch_checkpoint", out_pth,
        "--topk", "2",
    ])
    out = capsys.readouterr().out
    assert "What color is the cat?" in out
    # top-k answers printed from the 5-word vocab
    assert any(w in out for w in ("black", "yes", "two", "blue", "UNK"))

    # ---- 8. the reference's BEST config (mhb_coAtt + GloVe,
    # train_models.py:27-33) through the same chain (VERDICT r4 item 5):
    # an 840B-FORMAT vectors text file -> cli.build_glove -> train with
    # the device feature bank ON -> full eval -> predict. Real-data day
    # must exercise zero first-ever paths for the flagship config.
    from vqa_attention_networks_tpu.cli import build_glove

    vocab = json.load(open(vocab_path))["question_vocab"]
    rng2 = np.random.default_rng(9)
    glove_txt = tmp_path / "glove.840B.300d.txt"
    with open(glove_txt, "w") as f:
        # 840B quirks the parser must survive: a token containing a space
        # (". ."), and a malformed short line
        f.write(". . " + " ".join(["0.1"] * 300) + "\n")
        f.write("truncated 0.5 0.5\n")
        for w in vocab:
            vec = rng2.standard_normal(300)
            f.write(w + " " + " ".join(f"{v:.4f}" for v in vec) + "\n")
    glove_npy = os.path.join(data_dir, "glove_table.npy")
    build_glove.main([
        "--vocab", vocab_path, "--vectors", str(glove_txt),
        "--out", glove_npy,
    ])
    table = np.load(glove_npy)
    assert table.shape[1] == 300 and np.abs(table[1:]).sum() > 0

    flagship = [
        "--model_name", "mhb_coAtt", "--data_dir", data_dir,
        "--num_answer", "5", "--batch_size", "4", "--glove", "1",
        "--device_feature_bank", "1",
    ]
    train.main(flagship + ["--mode", "training", "--num_epoch", "1"])
    assert os.path.exists("models/mhb_coAtt/weights")
    train.main(flagship + ["--mode", "testing"])
    rec = json.load(open("results/mhb_coAtt.json"))
    assert "vqa_consensus_accuracy" in rec
    sub = json.load(open("results/mhb_coAtt_predictions.json"))
    assert {r["question_id"] for r in sub} == {5, 6}

    capsys.readouterr()
    predict.main([
        "--model_name", "mhb_coAtt",
        "--image_path",
        str(tmp_path / "imgs_train" / f"COCO_train2014_{10:012d}.jpg"),
        "--question", "What color is the cat?",
        "--vocab", vocab_path,
        "--weights", npz,
        "--glove", "1",
        "--glove_table", glove_npy,
        "--topk", "2",
    ])
    out = capsys.readouterr().out
    assert "What color is the cat?" in out
