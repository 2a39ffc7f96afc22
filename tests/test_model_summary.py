"""tools/model_summary.py: XLA cost analysis per family at tiny dims."""

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from vqa_attention_networks_tpu.config import Config


def _tiny(name, **kw):
    return Config(
        model_name=name,
        q_vocab_size=30,
        a_vocab_size=8,
        hidden_dim=16,
        emb_dim=8,
        embed_size=16,
        img_feature_channel=32,
        max_question_length=6,
        mfb_factor=5,
        mfb_out=8,
        **kw,
    ).validate()


def test_summarize_counts_and_flops():
    from model_summary import summarize

    row = summarize(_tiny("iBOWIMG"), batch=4)
    assert row["model"] == "iBOWIMG"
    # embedding (30*16) alone puts the count in the hundreds; flops and
    # bytes must be positive and per-sample (batch divided out)
    assert row["params"] > 400
    assert row["flops_per_sample"] > 0
    assert row["bytes_accessed_per_sample"] > 0


def test_summarize_glove_variant_labels():
    from model_summary import summarize

    row = summarize(_tiny("mhb_coAtt", glove=True), batch=2)
    assert row["model"] == "mhb_coAtt+glove"
    # the frozen glove table (q_vocab x emb) is part of the param tree
    base = summarize(_tiny("mhb_coAtt"), batch=2)
    assert row["params"] > base["params"]


def test_main_writes_artifacts(tmp_path, capsys):
    from model_summary import main

    # patch production Config defaults away by driving summarize directly is
    # cheaper; main() is exercised with the two cheapest families at the
    # default (production) dims would be slow, so restrict via --families and
    # tiny dims is not reachable from the CLI — instead just check the
    # writer path with monkeypatched summarize.
    import model_summary as ms

    orig = ms.summarize
    ms.summarize = lambda cfg, batch: {
        "model": cfg.model_name, "params": 10, "params_mb_f32": 0.0,
        "batch": batch, "flops_per_sample": 1e6,
        "bytes_accessed_per_sample": 2e6,
    }
    try:
        main(["--families", "iBOWIMG,visLstm", "--out_dir", str(tmp_path)])
    finally:
        ms.summarize = orig
    data = json.loads((tmp_path / "model_summary.json").read_text())
    assert [m["model"] for m in data["models"]] == ["iBOWIMG", "visLstm"]
    md = (tmp_path / "MODELS.md").read_text()
    assert "| iBOWIMG |" in md and "| visLstm |" in md


def test_main_rejects_glove_on_non_flagship(tmp_path):
    from model_summary import main

    with pytest.raises(SystemExit, match="only mhb_coAtt"):
        main(["--families", "mfb+glove", "--out_dir", str(tmp_path)])
