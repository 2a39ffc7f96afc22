"""Batch pipeline: static shapes, valid-masked padding, soft labels,
prefetch, deterministic shuffling."""

import numpy as np

from vqa_attention_networks_tpu.data.dataset import VqaBatches, prefetch
from vqa_attention_networks_tpu.data.feature_store import (
    make_synthetic_feature_store,
)
from vqa_attention_networks_tpu.data.prepare import make_synthetic_qa_data


def _pipeline(tmp_path, n=37, batch_size=8, soft=False, shuffle=False, seed=0):
    qa = make_synthetic_qa_data(
        np.random.default_rng(0), n_train=n, n_val=8, num_images=5
    )
    store = make_synthetic_feature_store(
        str(tmp_path / "feat"),
        image_ids=sorted(set(qa.train.image_ids) | set(qa.val.image_ids)),
        num_regions=4,
        channels=16,
    )
    return qa, VqaBatches(
        qa.train, store, batch_size=batch_size,
        num_answers=qa.a_vocab_size, soft_answer=soft,
        shuffle=shuffle, seed=seed,
    )


def test_static_shapes_and_final_padding(tmp_path):
    qa, batches = _pipeline(tmp_path, n=37, batch_size=8)
    all_batches = list(batches.epoch())
    assert len(all_batches) == 5  # ceil(37/8)
    for b in all_batches:
        assert b.image_features.shape == (8, 4, 16)  # ALWAYS batch_size
        assert b.questions.shape == (8, qa.max_question_length)
    # final batch: 37 - 32 = 5 valid rows
    assert all_batches[-1].valid.sum() == 5
    assert all(b.valid.all() for b in all_batches[:-1])


def test_total_valid_rows_covers_split_once(tmp_path):
    qa, batches = _pipeline(tmp_path, n=37)
    total = sum(int(b.valid.sum()) for b in batches.epoch())
    assert total == 37


def test_soft_labels_densified(tmp_path):
    qa, batches = _pipeline(tmp_path, soft=True)
    b = next(batches.epoch())
    assert b.soft_answers.shape == (8, qa.a_vocab_size)
    np.testing.assert_allclose(b.soft_answers.sum(1), 1.0, rtol=1e-5)
    # argmax of the soft vector == the dominant annotator answer
    np.testing.assert_array_equal(b.soft_answers.argmax(1), b.answers)


def test_shuffle_deterministic_per_seed(tmp_path):
    _, b1 = _pipeline(tmp_path, shuffle=True, seed=7)
    _, b2 = _pipeline(tmp_path, shuffle=True, seed=7)
    q1 = np.concatenate([b.questions for b in b1.epoch()])
    q2 = np.concatenate([b.questions for b in b2.epoch()])
    np.testing.assert_array_equal(q1, q2)
    # successive epochs differ (reshuffle)
    q3 = np.concatenate([b.questions for b in b1.epoch()])
    assert not np.array_equal(q1, q3)


def test_prefetch_preserves_order_and_propagates_errors(tmp_path):
    _, batches = _pipeline(tmp_path)
    direct = [b.answers.copy() for b in batches.epoch()]
    _, batches2 = _pipeline(tmp_path)
    threaded = [b.answers.copy() for b in prefetch(batches2.epoch())]
    for a, b in zip(direct, threaded):
        np.testing.assert_array_equal(a, b)

    def boom():
        yield from batches.epoch()
        raise RuntimeError("producer failed")

    import pytest

    with pytest.raises(RuntimeError, match="producer failed"):
        list(prefetch(boom()))


def test_combined_feature_store_routes_by_image_id(tmp_path):
    from vqa_attention_networks_tpu.data.feature_store import (
        CombinedFeatureStore,
        make_synthetic_feature_store,
        open_feature_store,
    )

    a = make_synthetic_feature_store(
        str(tmp_path / "resnet152_train"), image_ids=[1, 2, 3],
        num_regions=4, channels=8, seed=1,
    )
    b = make_synthetic_feature_store(
        str(tmp_path / "resnet152_val"), image_ids=[10, 11],
        num_regions=4, channels=8, seed=2,
    )
    combo = CombinedFeatureStore([a, b])
    assert len(combo) == 5
    got = combo.gather([10, 2, 11, 1])
    np.testing.assert_array_equal(got[0], b.gather([10])[0])
    np.testing.assert_array_equal(got[1], a.gather([2])[0])
    np.testing.assert_array_equal(got[3], a.gather([1])[0])

    opened = open_feature_store(str(tmp_path))
    assert isinstance(opened, CombinedFeatureStore)
    np.testing.assert_array_equal(opened.gather([3]), a.gather([3]))


def test_writer_clamps_out_of_f16_range(tmp_path, capsys):
    """The store writer must clamp (not overflow to inf) f32 features that
    exceed the f16 range — infs become NaN losses downstream."""
    from vqa_attention_networks_tpu.data.feature_store import (
        FeatureStore,
        FeatureStoreWriter,
    )

    feats = np.zeros((2, 4, 8), np.float32)
    feats[0, 0, 0] = 1e6
    feats[1, 1, 1] = -1e6
    feats[0, 2, 2] = 123.5
    with FeatureStoreWriter(
        str(tmp_path / "s"), num_regions=4, channels=8
    ) as w:
        w.append_batch([7, 9], feats)
        assert w.clamped == 2
    assert "clamped" in capsys.readouterr().out
    got = np.asarray(FeatureStore(str(tmp_path / "s")).features[:])
    assert np.isfinite(got.astype(np.float32)).all()
    lim = np.finfo(np.float16).max
    assert got[0, 0, 0] == lim and got[1, 1, 1] == -lim
    assert got[0, 2, 2] == np.float16(123.5)


def test_prefetch_producer_stops_when_consumer_abandons():
    # breaking out of the consumer loop must release the producer thread
    # (previously it blocked forever on q.put, pinning depth+1 batches)
    import threading
    import time

    from vqa_attention_networks_tpu.data.dataset import prefetch

    alive = {"n": 0}

    def slow_source():
        for i in range(1000):
            alive["n"] = i
            yield i

    before = threading.active_count()
    gen = prefetch(slow_source(), depth=2)
    assert next(gen) == 0
    gen.close()  # consumer abandons
    deadline = time.monotonic() + 5
    while threading.active_count() > before and time.monotonic() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_parallel_epoch_bitwise_matches_serial(tmp_path):
    # thread-pool assembly (parallel_epoch) must yield the IDENTICAL batch
    # stream as epoch(): same order, same contents, same final-batch
    # padding — resume determinism depends on it
    _, batches = _pipeline(tmp_path, n=37, batch_size=8, soft=True,
                           shuffle=True, seed=3)
    serial = list(batches.epoch(epoch_index=2))
    par = list(batches.parallel_epoch(epoch_index=2, workers=4))
    assert len(par) == len(serial)
    for a, b in zip(serial, par):
        np.testing.assert_array_equal(a.image_features, b.image_features)
        np.testing.assert_array_equal(a.questions, b.questions)
        np.testing.assert_array_equal(a.answers, b.answers)
        np.testing.assert_array_equal(a.valid, b.valid)
        np.testing.assert_array_equal(a.soft_answers, b.soft_answers)

    # mid-epoch resume (start_batch) must match too
    serial_r = list(batches.epoch(epoch_index=2, start_batch=2))
    par_r = list(batches.parallel_epoch(epoch_index=2, start_batch=2,
                                        workers=3))
    assert len(par_r) == len(serial_r)
    np.testing.assert_array_equal(serial_r[0].questions, par_r[0].questions)

    # workers=1 degrades to the serial path
    one = list(batches.parallel_epoch(epoch_index=2, workers=1))
    np.testing.assert_array_equal(one[0].questions, serial[0].questions)


def test_parallel_epoch_survives_consumer_abandonment(tmp_path):
    _, batches = _pipeline(tmp_path, n=64, batch_size=4)
    it = batches.parallel_epoch(epoch_index=0, workers=4)
    next(it)
    it.close()  # must not hang waiting on queued futures
