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


def test_data_parallel_engine_matches_single_device():
    """data_parallel=N serves a batch sharded over the emulated 8-device
    mesh (params replicated, inputs split on dim 0 — the reference's
    nn.DataParallel analog, solver.py:34-36) with predictions identical
    to the single-device engine."""
    cfg = Config(
        model_name="iBOWIMG", q_vocab_size=30, a_vocab_size=12,
        hidden_dim=16, emb_dim=8, embed_size=16, img_feature_channel=32,
        max_question_length=7,
    )
    params = get_model("iBOWIMG").init(jax.random.PRNGKey(0), cfg)
    single = InferenceEngine(cfg, params, batch_size=8, topk=3)
    sharded = InferenceEngine(cfg, params, batch_size=8, topk=3,
                              data_parallel=8)

    rng = np.random.default_rng(7)
    img, ques = _request(rng, 8, cfg)
    a = single.predict_batch(img, ques)
    b = sharded.predict_batch(img, ques)
    for x, y in zip(a, b):
        assert x.answer_id == y.answer_id
        np.testing.assert_array_equal(x.top_ids, y.top_ids)
        np.testing.assert_allclose(x.top_probs, y.top_probs, rtol=1e-5)

    # partial batches ride the same pad path
    a = single.predict_batch(img[:3], ques[:3])
    b = sharded.predict_batch(img[:3], ques[:3])
    for x, y in zip(a, b):
        assert x.answer_id == y.answer_id


def test_data_parallel_engine_validation():
    cfg = Config(
        model_name="iBOWIMG", q_vocab_size=30, a_vocab_size=12,
        hidden_dim=16, emb_dim=8, embed_size=16, img_feature_channel=32,
        max_question_length=7,
    )
    params = get_model("iBOWIMG").init(jax.random.PRNGKey(0), cfg)
    with np.testing.assert_raises(ValueError):  # 7 does not divide 8
        InferenceEngine(cfg, params, batch_size=8, data_parallel=7)
    with np.testing.assert_raises(ValueError):  # more shards than devices
        InferenceEngine(cfg, params, batch_size=64, data_parallel=64)
    with np.testing.assert_raises(ValueError):  # AOT is single-device
        InferenceEngine(cfg, params, batch_size=8, data_parallel=8,
                        artifact_dir="/nonexistent")


def test_data_parallel_int8_feed_matches_single_device():
    """The quantized feed has a different input arity (features + scales);
    its DP in_shardings must line up with serving_forward's signature."""
    cfg = Config(
        model_name="iBOWIMG", q_vocab_size=30, a_vocab_size=12,
        hidden_dim=16, emb_dim=8, embed_size=16, img_feature_channel=32,
        max_question_length=7,
    )
    params = get_model("iBOWIMG").init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    img8 = rng.integers(-127, 128, (8, 196, 32), dtype=np.int8)
    scale = (np.abs(rng.standard_normal((8, 32))) * 0.01 + 1e-3).astype(
        np.float16
    )
    ques = rng.integers(0, 30, (8, 7)).astype(np.int32)
    e1 = InferenceEngine(cfg, params, batch_size=8, topk=3,
                         input_dtype="int8")
    e8 = InferenceEngine(cfg, params, batch_size=8, topk=3,
                         input_dtype="int8", data_parallel=8)
    a = e1.predict_batch(img8, ques, feature_scale=scale)
    b = e8.predict_batch(img8, ques, feature_scale=scale)
    for x, y in zip(a, b):
        assert x.answer_id == y.answer_id
        np.testing.assert_array_equal(x.top_ids, y.top_ids)


def _int8_engine(batch_size=8):
    cfg = Config(
        model_name="iBOWIMG", q_vocab_size=30, a_vocab_size=12,
        hidden_dim=16, emb_dim=8, embed_size=16, img_feature_channel=32,
        max_question_length=7,
    )
    params = get_model("iBOWIMG").init(jax.random.PRNGKey(0), cfg)
    return InferenceEngine(
        cfg, params, batch_size=batch_size, topk=3, input_dtype="int8"
    ), cfg


def _quantized_pool(rng, n_images, cfg):
    from vqa_attention_networks_tpu.data.feature_store import (
        quantize_features,
    )

    feats = rng.standard_normal(
        (n_images, 196, cfg.img_feature_channel)
    ).astype(np.float32)
    rows, scale, _ = quantize_features(feats)
    return rows, scale.astype(np.float16)


def test_device_cache_matches_per_request_int8_feed():
    """predict_batch_by_id (device-bank gather) must equal predict_batch
    fed the same quantized rows — hits and misses alike."""
    engine, cfg = _int8_engine()
    rng = np.random.default_rng(3)
    rows, scale = _quantized_pool(rng, 6, cfg)

    fetch_calls = []

    def fetch(ids):
        fetch_calls.append(list(ids))
        return rows[ids], scale[ids]

    cache = engine.attach_feature_cache(capacity=6, fetch=fetch)
    ids = np.array([0, 1, 1, 4, 0], dtype=np.int64)
    ques = rng.integers(0, cfg.q_vocab_size, size=(5, 7)).astype(np.int32)

    by_id = engine.predict_batch_by_id(ids, ques)
    direct = engine.predict_batch(
        rows[ids], ques, feature_scale=scale[ids]
    )
    for a, b in zip(by_id, direct):
        assert a.answer_id == b.answer_id
        np.testing.assert_array_equal(a.top_ids, b.top_ids)
        np.testing.assert_allclose(a.top_probs, b.top_probs, rtol=1e-6)
    # one fetch, only the distinct missing ids
    assert fetch_calls == [[0, 1, 4]]
    assert cache.misses == 3 and cache.hits == 2

    # second call: all hits, no fetch
    by_id2 = engine.predict_batch_by_id(ids, ques)
    assert fetch_calls == [[0, 1, 4]]
    assert cache.hits == 7
    for a, b in zip(by_id2, by_id):
        assert a.answer_id == b.answer_id


def test_device_cache_lru_eviction_and_refetch():
    engine, cfg = _int8_engine()
    rng = np.random.default_rng(4)
    rows, scale = _quantized_pool(rng, 5, cfg)
    fetched = []

    def fetch(ids):
        fetched.extend(ids)
        return rows[ids], scale[ids]

    cache = engine.attach_feature_cache(capacity=2, fetch=fetch)
    ques = rng.integers(0, cfg.q_vocab_size, size=(1, 7)).astype(np.int32)

    engine.predict_batch_by_id([0], ques)   # bank: {0}
    engine.predict_batch_by_id([1], ques)   # bank: {0, 1}
    engine.predict_batch_by_id([0], ques)   # touch 0 -> LRU victim is 1
    engine.predict_batch_by_id([2], ques)   # evicts 1; bank: {0, 2}
    assert cache.evictions == 1
    preds_1 = engine.predict_batch_by_id([1], ques)  # re-fetch 1, evicts 0
    assert fetched == [0, 1, 2, 1]
    # parity survives eviction + re-fetch
    direct = engine.predict_batch(rows[[1]], ques, feature_scale=scale[[1]])
    assert preds_1[0].answer_id == direct[0].answer_id

    # a batch with more distinct images than capacity must refuse
    import pytest

    with pytest.raises(ValueError, match="distinct images"):
        engine.predict_batch_by_id([0, 1, 2], np.repeat(ques, 3, axis=0))


def test_device_cache_stream_matches_batch():
    engine, cfg = _int8_engine()
    rng = np.random.default_rng(5)
    rows, scale = _quantized_pool(rng, 8, cfg)

    def fetch(ids):
        return rows[ids], scale[ids]

    engine.attach_feature_cache(capacity=8, fetch=fetch)
    reqs = []
    for _ in range(3):
        ids = rng.integers(0, 8, size=(8,))
        ques = rng.integers(0, cfg.q_vocab_size, size=(8, 7)).astype(
            np.int32
        )
        reqs.append((ids, ques))
    direct = [engine.predict_batch_by_id(i, q) for i, q in reqs]
    streamed = list(
        engine.predict_stream_by_id((i, q, None) for i, q in reqs)
    )
    for batch_a, batch_b in zip(direct, streamed):
        for a, b in zip(batch_a, batch_b):
            assert a.answer_id == b.answer_id


def test_device_cache_miss_upload_batches_by_binary_chunks():
    """A batch's misses ship in log2-many power-of-two scatter chunks
    (binary decomposition of the miss count), not one dispatch per image
    and with ZERO padding bytes — eviction-regime batches carry O(100)
    misses on transfer-bound links, so both dispatch count and dead
    bytes matter (pad-to-power-of-two measured a 1.5x regression)."""
    engine, cfg = _int8_engine()
    rng = np.random.default_rng(6)
    rows, scale = _quantized_pool(rng, 8, cfg)
    cache = engine.attach_feature_cache(
        capacity=8, fetch=lambda ids: (rows[ids], scale[ids])
    )
    calls = []
    orig = cache._put_rows
    cache._put_rows = lambda bank, r, i: calls.append(r.shape) or orig(
        bank, r, i
    )
    ques = rng.integers(0, cfg.q_vocab_size, size=(5, 7)).astype(np.int32)
    preds = engine.predict_batch_by_id([0, 5, 2, 2, 7], ques)  # 4 distinct
    assert calls == [(4, 196, cfg.img_feature_channel)]  # one chunk
    calls.clear()
    engine.predict_batch_by_id([1, 3, 4], ques[:3])  # 3 misses -> 2 + 1
    assert calls == [(2, 196, cfg.img_feature_channel),
                     (1, 196, cfg.img_feature_channel)]
    direct = engine.predict_batch(
        rows[[0, 5, 2, 2, 7]], ques, feature_scale=scale[[0, 5, 2, 2, 7]]
    )
    for a, b in zip(preds, direct):
        assert a.answer_id == b.answer_id


def test_device_cache_requires_int8_jit_engine():
    import pytest

    engine_f16, _ = _engine()
    with pytest.raises(ValueError, match="int8"):
        engine_f16.attach_feature_cache(4, fetch=lambda ids: None)
