"""Mesh-sharded DeviceFeatureCache: bank rows split over the 1-D 'data'
serving mesh (serve.py DeviceFeatureCache(mesh=...), ring gather in
aot.serving_forward_banked_sharded).

Why this exists: one chip's HBM caps the single-device bank — VQA-val
traffic (~40k images x 392 KB int8) is ~15.7 GB and does not fit beside
the model on 16 GB, forcing the measured eviction regime
(docs/BENCHMARKS.md serve-by-id curve). Sharding the bank over D data
shards multiplies capacity by D; these tests pin that the sharded bank
is prediction-identical to the single-device bank and to the per-request
int8 feed, that LRU bookkeeping is placement-independent, and that
capacity rounds up to a shardable multiple. Runs on the emulated
8-device CPU mesh (tests/conftest.py).
"""

import jax
import numpy as np

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.serve import InferenceEngine


def _cfg():
    return Config(
        model_name="iBOWIMG", q_vocab_size=30, a_vocab_size=12,
        hidden_dim=16, emb_dim=8, embed_size=16, img_feature_channel=32,
        max_question_length=7,
    )


def _engines(batch_size=8):
    cfg = _cfg()
    params = get_model("iBOWIMG").init(jax.random.PRNGKey(0), cfg)
    single = InferenceEngine(
        cfg, params, batch_size=batch_size, topk=3, input_dtype="int8"
    )
    sharded = InferenceEngine(
        cfg, params, batch_size=batch_size, topk=3, input_dtype="int8",
        data_parallel=jax.device_count(),
    )
    return single, sharded, cfg


def _quantized_pool(rng, n_images, cfg):
    from vqa_attention_networks_tpu.data.feature_store import (
        quantize_features,
    )

    feats = rng.standard_normal(
        (n_images, 196, cfg.img_feature_channel)
    ).astype(np.float32)
    rows, scale, _ = quantize_features(feats)
    return rows, scale.astype(np.float16)


def test_sharded_bank_matches_single_device_bank_and_direct_feed():
    single, sharded, cfg = _engines()
    rng = np.random.default_rng(11)
    rows, scale = _quantized_pool(rng, 16, cfg)

    def fetch(ids):
        return rows[ids], scale[ids]

    single.attach_feature_cache(capacity=16, fetch=fetch)
    bank = sharded.attach_feature_cache(capacity=16, fetch=fetch)
    assert bank.capacity == 16  # 8 | 16: no rounding needed
    # slot blocks live one-per-device on the 8-device mesh
    assert len(bank.rows.sharding.device_set) == jax.device_count()

    ids = np.array([0, 3, 3, 9, 15, 0, 7, 12], dtype=np.int64)
    ques = rng.integers(0, cfg.q_vocab_size, size=(8, 7)).astype(np.int32)
    a = single.predict_batch_by_id(ids, ques)
    b = sharded.predict_batch_by_id(ids, ques)
    direct = sharded.predict_batch(rows[ids], ques,
                                   feature_scale=scale[ids])
    for x, y, z in zip(a, b, direct):
        assert x.answer_id == y.answer_id == z.answer_id
        np.testing.assert_array_equal(x.top_ids, y.top_ids)
        np.testing.assert_array_equal(y.top_ids, z.top_ids)
        np.testing.assert_allclose(y.top_probs, z.top_probs, rtol=1e-6)

    # second call: pure hits, still identical
    b2 = sharded.predict_batch_by_id(ids, ques)
    assert sharded._cache.misses == 6 and sharded._cache.hits == 10
    for x, y in zip(b, b2):
        assert x.answer_id == y.answer_id


def test_sharded_bank_eviction_parity_and_stats():
    """LRU eviction over the sharded bank: slots are global ids, so the
    bookkeeping is placement-independent — parity with the per-request
    feed must survive evict + re-fetch on every shard."""
    _, sharded, cfg = _engines()
    rng = np.random.default_rng(12)
    rows, scale = _quantized_pool(rng, 24, cfg)
    fetched = []

    def fetch(ids):
        fetched.extend(int(i) for i in ids)
        return rows[ids], scale[ids]

    bank = sharded.attach_feature_cache(capacity=8, fetch=fetch)
    ques = rng.integers(0, cfg.q_vocab_size, size=(8, 7)).astype(np.int32)

    for lo in (0, 8, 16, 4):  # 3 disjoint batches then a re-visit
        ids = np.arange(lo, lo + 8, dtype=np.int64)
        preds = sharded.predict_batch_by_id(ids, ques)
        direct = sharded.predict_batch(rows[ids], ques,
                                       feature_scale=scale[ids])
        for p, d in zip(preds, direct):
            assert p.answer_id == d.answer_id
            np.testing.assert_array_equal(p.top_ids, d.top_ids)
    # batches 2-4 each evicted a full bank's worth
    assert bank.evictions == 24
    assert fetched == list(range(24)) + list(range(4, 12))


def test_sharded_bank_capacity_rounds_up_to_mesh_multiple():
    _, sharded, cfg = _engines()
    rng = np.random.default_rng(13)
    rows, scale = _quantized_pool(rng, 8, cfg)
    bank = sharded.attach_feature_cache(
        capacity=5, fetch=lambda ids: (rows[ids], scale[ids])
    )
    assert bank.capacity == jax.device_count()  # 5 -> 8 on the 8-dev mesh
    ques = rng.integers(0, cfg.q_vocab_size, size=(8, 7)).astype(np.int32)
    ids = np.arange(8, dtype=np.int64)
    preds = sharded.predict_batch_by_id(ids, ques)
    direct = sharded.predict_batch(rows[ids], ques, feature_scale=scale[ids])
    for p, d in zip(preds, direct):
        assert p.answer_id == d.answer_id


def test_sharded_bank_stream_matches_batch():
    _, sharded, cfg = _engines()
    rng = np.random.default_rng(14)
    rows, scale = _quantized_pool(rng, 12, cfg)
    sharded.attach_feature_cache(
        capacity=8, fetch=lambda ids: (rows[ids], scale[ids])
    )
    reqs = []
    for _ in range(3):
        ids = rng.integers(0, 12, size=(8,))
        ques = rng.integers(0, cfg.q_vocab_size, size=(8, 7)).astype(
            np.int32
        )
        reqs.append((ids, ques))
    direct = [sharded.predict_batch_by_id(i, q) for i, q in reqs]
    # streaming re-runs the same ids: reset so LRU state matches
    streamed = list(
        sharded.predict_stream_by_id((i, q, None) for i, q in reqs)
    )
    for batch_a, batch_b in zip(direct, streamed):
        for a, b in zip(batch_a, batch_b):
            assert a.answer_id == b.answer_id
