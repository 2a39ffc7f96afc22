"""Boundary conditions a production deployment actually hits.

Each case names the failure it guards against; none of these paths exist
in the reference (its DataLoader drops nothing and its eval divides by a
constant), so the contracts are this framework's own."""

import jax
import numpy as np
import pytest

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.data.feature_store import (
    make_synthetic_feature_store,
)
from vqa_attention_networks_tpu.data.prepare import make_synthetic_qa_data
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.serve import InferenceEngine


def _cfg(**kw):
    base = dict(
        model_name="iBOWIMG", q_vocab_size=12, a_vocab_size=3,
        max_question_length=6, img_feature_channel=8,
        compute_dtype="bfloat16",
    )
    base.update(kw)
    return Config(**base).validate()


def test_topk_wider_than_answer_vocab_is_clamped():
    # --topk 5 (the serving default) with a 3-answer vocab (yes/no-filtered
    # prepare artifact) must serve, not die in lax.top_k at server start
    cfg = _cfg(a_vocab_size=3)
    params = get_model("iBOWIMG").init(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(cfg, params, batch_size=4, topk=5)
    assert engine.topk == 3
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 196, 8)).astype(np.float16)
    ques = rng.integers(1, 12, size=(2, 6)).astype(np.int32)
    preds = engine.predict_batch(feats, ques, np.asarray([3, 6], np.int32))
    assert len(preds) == 2
    assert len(preds[0].top_ids) == 3
    # clamped top-k still covers the whole vocab: probs sum to ~1
    assert abs(sum(float(p) for p in preds[0].top_probs) - 1.0) < 1e-2


@pytest.mark.parametrize("qlen_value", [1, 6])
def test_extreme_question_lengths(qlen_value):
    # qlen=1 (single-word question) and qlen=max_len (full question, the
    # last-valid gather reads index T-1, one past which is out of bounds)
    cfg = _cfg(model_name="mhb_coAtt", hidden_dim=16, emb_dim=8,
               mfb_factor=2, mfb_out=4)
    model = get_model("mhb_coAtt")
    params = model.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    img = rng.standard_normal((2, 196, 8)).astype(np.float32)
    ques = rng.integers(1, 12, size=(2, 6)).astype(np.int32)
    qlen = np.asarray([qlen_value, qlen_value], np.int32)
    logits, _ = model.apply(params, cfg, img, ques, ques_length=qlen,
                            train=False)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_batch_size_one_trains_and_evaluates(tmp_path):
    # batch 1: BN unbiased-variance n/(n-1) clamps, eval denominators
    # stay finite, and the final "partial batch" logic is exercised on
    # every batch
    from vqa_attention_networks_tpu.train.solver import Solver

    qa = make_synthetic_qa_data(
        np.random.default_rng(0), n_train=5, n_val=3, num_images=4,
        num_answers=4, q_vocab_words=10, max_len=6,
    )
    store = make_synthetic_feature_store(
        str(tmp_path / "f"), sorted(set(qa.train.image_ids)
                                    | set(qa.val.image_ids)),
        num_regions=196, channels=8,
    )
    cfg = Config(
        model_name="iBOWIMG", q_vocab_size=qa.q_vocab_size,
        a_vocab_size=qa.a_vocab_size, max_question_length=6,
        img_feature_channel=8, batch_size=1, num_epoch=1,
        checkpoint_every_steps=0, data_dir=str(tmp_path),
    ).validate()
    solver = Solver(cfg, qa, store, log_dir=str(tmp_path / "runs"))
    metrics = solver.train()
    assert np.isfinite(metrics["train_loss"])
    loss, acc = solver.val(full=True)
    assert np.isfinite(loss) and 0.0 <= acc <= 1.0
    solver.close()


def test_all_unk_question_serves():
    # every word out of vocab -> all-UNK ids; qlen is still >= 1 and the
    # forward must return a usable distribution
    from vqa_attention_networks_tpu.data.text import encode_question

    vocab = {"what": 1, "is": 2, "UNK": 3}
    ids = encode_question("xylophone quantum banana", vocab, 6)
    assert ids[:3] == [3, 3, 3]
    cfg = _cfg(q_vocab_size=4, a_vocab_size=3)
    params = get_model("iBOWIMG").init(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(cfg, params, batch_size=2, topk=2)
    feats = np.zeros((1, 196, 8), np.float16)
    preds = engine.predict_batch(
        feats, np.asarray([ids], np.int32), np.asarray([3], np.int32)
    )
    assert abs(sum(float(p) for p in preds[0].top_probs)) <= 1.0 + 1e-3
