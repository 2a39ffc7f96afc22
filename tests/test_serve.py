"""Inference engine: padding, masking, streaming pipeline."""

import jax
import numpy as np

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.serve import InferenceEngine


def _engine(batch_size=8):
    cfg = Config(
        model_name="iBOWIMG", q_vocab_size=30, a_vocab_size=12,
        hidden_dim=16, emb_dim=8, embed_size=16, img_feature_channel=32,
        max_question_length=7,
    )
    params = get_model("iBOWIMG").init(jax.random.PRNGKey(0), cfg)
    return InferenceEngine(cfg, params, batch_size=batch_size, topk=3), cfg


def _request(rng, n, cfg):
    img = rng.standard_normal((n, 196, cfg.img_feature_channel)).astype(
        np.float32
    )
    ques = rng.integers(0, cfg.q_vocab_size, size=(n, 7)).astype(np.int32)
    return img, ques


def test_partial_batch_padded_and_unpadded_results_match():
    engine, cfg = _engine()
    rng = np.random.default_rng(0)
    img, ques = _request(rng, 5, cfg)
    preds = engine.predict_batch(img, ques)
    assert len(preds) == 5
    full_img, full_ques = (
        np.concatenate([img, img[:3]]), np.concatenate([ques, ques[:3]])
    )
    preds_full = engine.predict_batch(full_img, full_ques)
    for a, b in zip(preds, preds_full[:5]):
        assert a.answer_id == b.answer_id
        np.testing.assert_array_equal(a.top_ids, b.top_ids)


def test_topk_is_sorted_probabilities():
    engine, cfg = _engine()
    rng = np.random.default_rng(1)
    img, ques = _request(rng, 4, cfg)
    for p in engine.predict_batch(img, ques):
        assert p.top_probs.shape == (3,)
        assert (np.diff(p.top_probs) <= 1e-6).all()
        assert p.answer_id == p.top_ids[0]


def test_streaming_matches_batch():
    engine, cfg = _engine()
    rng = np.random.default_rng(2)
    reqs = [_request(rng, 8, cfg) for _ in range(3)]
    direct = [engine.predict_batch(i, q) for i, q in reqs]
    streamed = list(
        engine.predict_stream((i, q, None) for i, q in reqs)
    )
    assert len(streamed) == 3
    for d_batch, s_batch in zip(direct, streamed):
        for d, s in zip(d_batch, s_batch):
            assert d.answer_id == s.answer_id
