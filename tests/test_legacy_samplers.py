"""Legacy manual batch samplers (SURVEY C5 twins of utils.py:21-57)."""

import numpy as np

from vqa_attention_networks_tpu.data.legacy_samplers import (
    sample_batch_hard,
    sample_batch_soft,
)
from vqa_attention_networks_tpu.data.prepare import make_synthetic_qa_data


def _setup():
    qa = make_synthetic_qa_data(np.random.default_rng(0), n_train=10, n_val=4,
                                num_images=3)
    image_ids = sorted(set(qa.train.image_ids))
    bank = np.random.default_rng(1).standard_normal((len(image_ids), 4, 8))
    id_map = {img_id: row for row, img_id in enumerate(image_ids)}
    return qa, bank, id_map


def test_hard_sampler_reads_source_bank():
    qa, bank, id_map = _setup()
    feats, qs, ans = sample_batch_hard(0, 4, bank, id_map, qa.train)
    assert feats.shape == (4, 4, 8)
    # the reference's self-shadowing bug read from an EMPTY buffer
    # (utils.py:27,33); ours must return the actual bank rows
    for i in range(4):
        row = id_map[int(qa.train.image_ids[i])]
        np.testing.assert_array_equal(feats[i], bank[row])
    np.testing.assert_array_equal(ans, qa.train.answers[:4])
    np.testing.assert_array_equal(qs, qa.train.questions[:4])


def test_soft_sampler_densifies():
    qa, bank, id_map = _setup()
    feats, qs, soft, ans = sample_batch_soft(
        0, 4, bank, id_map, qa.train, num_answers=qa.a_vocab_size
    )
    assert soft.shape == (4, qa.a_vocab_size)
    np.testing.assert_allclose(soft.sum(1), 1.0, rtol=1e-5)
    np.testing.assert_array_equal(soft.argmax(1), ans)


def test_wraparound_and_partial_batches():
    qa, bank, id_map = _setup()
    # batch 2 of size 4 over 10 rows: rows 8..9 (partial, reference
    # semantics: ei = min(len, si+bs), utils.py:23-24)
    feats, qs, ans = sample_batch_hard(2, 4, bank, id_map, qa.train)
    assert len(ans) == 2
    # batch 3 wraps: (3*4) % 10 = 2 -> rows 2..5
    _, _, ans_wrap = sample_batch_hard(3, 4, bank, id_map, qa.train)
    np.testing.assert_array_equal(ans_wrap, qa.train.answers[2:6])
