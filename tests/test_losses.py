"""Loss semantics vs PyTorch's criteria (the reference's exact losses,
solver.py:26-29): KLDivLoss(mean) on log-softmax outputs and
CrossEntropyLoss."""

import numpy as np
import pytest

from vqa_attention_networks_tpu.train.losses import (
    correct_count,
    cross_entropy,
    soft_cross_entropy,
    topk_correct_count,
)


@pytest.fixture(scope="module")
def torch():
    # imported lazily INSIDE tests: importing torch at collection time loads
    # its OMP runtime alongside XLA:CPU for the whole session
    return pytest.importorskip("torch")


def test_soft_cross_entropy_matches_torch_kldiv(torch):
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((6, 9)).astype(np.float32)
    soft = rng.random((6, 9)).astype(np.float32)
    soft = soft / soft.sum(1, keepdims=True)
    # zero out some targets to exercise 0*log0
    soft[:, 3] = 0.0

    got = float(soft_cross_entropy(logits, soft))

    lt = torch.tensor(logits)
    st = torch.tensor(soft)
    want = torch.nn.KLDivLoss()(
        torch.nn.functional.log_softmax(lt, dim=1), st
    ).item()
    # f32 log/exp noise between XLA-CPU and torch kernels: ~3e-5 relative
    assert got == pytest.approx(want, rel=1e-3)


def test_cross_entropy_matches_torch(torch):
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((5, 7)).astype(np.float32)
    labels = rng.integers(0, 7, size=5).astype(np.int32)
    got = float(cross_entropy(logits, labels))
    want = torch.nn.CrossEntropyLoss()(
        torch.tensor(logits), torch.tensor(labels, dtype=torch.long)
    ).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_valid_mask_zeroes_pad_rows():
    logits = np.array([[10.0, 0.0], [0.0, 10.0]], np.float32)
    labels = np.array([0, 0], np.int32)
    valid = np.array([True, False])
    # only row 0 (correct) counts
    assert float(correct_count(logits, labels, valid)) == 1.0
    # padded CE equals CE over the valid row alone
    full = float(cross_entropy(logits[:1], labels[:1]))
    masked = float(cross_entropy(logits, labels, valid))
    assert masked == pytest.approx(full, rel=1e-6)


def test_topk_counts():
    logits = np.array(
        [[0.1, 0.5, 0.4, 0.0], [0.9, 0.05, 0.03, 0.02]], np.float32
    )
    labels = np.array([2, 3], np.int32)
    assert float(topk_correct_count(logits, labels, k=3)) == 1.0  # row 0 only
    assert float(topk_correct_count(logits, labels, k=4)) == 2.0


def test_soft_bce_finite_at_full_confidence():
    # a fully-confident model (log_p == 0 for one class) must yield a
    # finite loss: log1p(-exp(log_p)) returned -inf whenever exp() rounded
    # to 1.0 (1 ulp of f32 exp error, or any bf16 log_p in (-2^-8, 0])
    import jax.numpy as jnp

    from vqa_attention_networks_tpu.train.losses import soft_bce

    logits = jnp.asarray([[50.0, -50.0, -50.0]], jnp.float32)  # p ~ [1,0,0]
    soft = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    loss = soft_bce(logits, soft)
    assert bool(jnp.isfinite(loss))

    logits16 = jnp.asarray([[8.0, -8.0, -8.0]], jnp.bfloat16)
    loss16 = soft_bce(logits16, soft.astype(jnp.bfloat16))
    assert bool(jnp.isfinite(loss16))


def test_vqa_consensus_scores():
    """Official VQA accuracy with the official leave-one-out averaging:
    score(c of 10) = (c*min((c-1)/3,1) + (10-c)*min(c/3,1)) / 10.
    Raw counts come back exactly as soft_val * soft_n (the in-vocab count
    stored in the artifact — the fractions alone cannot distinguish a
    unanimous 1/1 from a unanimous 10/10)."""
    import numpy as np

    from vqa_attention_networks_tpu.train.losses import vqa_consensus_scores

    def official(c, t=10.0):
        return (c * min((c - 1) / 3.0, 1.0)
                + (t - c) * min(c / 3.0, 1.0)) / t

    W = 4
    # row 0: all 10 in vocab, counts [6, 3, 1]  -> values /10
    # row 1: 5 in vocab,      counts [3, 2]     -> values /5
    # row 2: all OOV (zero row, soft_n 0)
    # row 3: unanimous 10/10  (value 1.0 — ambiguous without soft_n)
    # row 4: unanimous 1/1    (value 1.0, 9 OOV annotators)
    soft_idx = np.full((5, W), -1, np.int32)
    soft_val = np.zeros((5, W), np.float32)
    soft_idx[0, :3] = [0, 1, 2]; soft_val[0, :3] = [0.6, 0.3, 0.1]
    soft_idx[1, :2] = [1, 0];    soft_val[1, :2] = [0.6, 0.4]
    soft_idx[3, 0] = 2;          soft_val[3, 0] = 1.0
    soft_idx[4, 0] = 2;          soft_val[4, 0] = 1.0
    soft_n = np.array([10, 5, 0, 10, 1], np.int32)

    # predictions: count 6, count 2, anything, count 10, count 1
    preds = np.array([0, 0, 0, 2, 2])
    scores = vqa_consensus_scores(soft_idx, soft_val, preds, soft_n)
    np.testing.assert_allclose(
        scores,
        [official(6), official(2), 0.0, official(10), official(1)],
        atol=1e-9,
    )
    # spot values: 6/10 -> 1.0, 2/10 -> 0.6, 1/10 -> 0.3
    np.testing.assert_allclose(scores[[0, 1, 4]], [1.0, 0.6, 0.3],
                               atol=1e-9)

    # predicted answer not among the annotator answers -> 0
    scores = vqa_consensus_scores(soft_idx, soft_val,
                                  np.array([3, 3, 3, 3, 3]), soft_n)
    np.testing.assert_allclose(scores, np.zeros(5), atol=1e-9)

    # the official subset averaging: count 3 is NOT a full point
    soft_idx_b = np.array([[0, 1, -1, -1]], np.int32)
    soft_val_b = np.array([[0.3, 0.7, 0.0, 0.0]], np.float32)
    scores = vqa_consensus_scores(soft_idx_b, soft_val_b, np.array([0]),
                                  np.array([10]))
    np.testing.assert_allclose(scores, [0.9], atol=1e-6)  # not 1.0
