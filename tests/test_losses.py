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
    """Official VQA accuracy min(count/3, 1): raw annotator counts come
    back exactly as soft * soft_n (the in-vocab count stored in the
    artifact — the normalized fractions alone cannot distinguish a
    unanimous 1/1 from a unanimous 10/10)."""
    import numpy as np

    from vqa_attention_networks_tpu.train.losses import vqa_consensus_scores

    # row 0: all 10 in vocab, counts [6, 3, 1]  -> values /10
    # row 1: 5 in vocab,      counts [3, 2]     -> values /5
    # row 2: all OOV (zero row, soft_n 0)
    # row 3: unanimous 10/10  (value 1.0 — ambiguous without soft_n)
    # row 4: unanimous 1/1    (value 1.0 — same fraction, count 1)
    soft = np.zeros((5, 4), np.float32)
    soft[0, :3] = [0.6, 0.3, 0.1]
    soft[1, :2] = [0.6, 0.4]
    soft[3, 2] = 1.0
    soft[4, 2] = 1.0
    soft_n = np.array([10, 5, 0, 10, 1], np.int32)

    preds = np.array([0, 1, 0, 2, 2])
    scores = vqa_consensus_scores(soft, preds, soft_n)
    np.testing.assert_allclose(
        scores, [1.0, 2 / 3, 0.0, 1.0, 1 / 3], atol=1e-9
    )

    # predicted answer has annotator count 0 -> score 0
    scores = vqa_consensus_scores(soft, np.array([3, 3, 3, 3, 3]), soft_n)
    np.testing.assert_allclose(scores, np.zeros(5), atol=1e-9)

    # count-1 and count-3 boundaries at n=10
    soft_b = np.zeros((2, 4), np.float32)
    soft_b[0, 0] = 0.1   # count 1 -> 1/3
    soft_b[0, 1] = 0.9
    soft_b[1, 0] = 0.3   # count 3 -> exactly 1.0
    soft_b[1, 1] = 0.7
    scores = vqa_consensus_scores(
        soft_b, np.array([0, 0]), np.array([10, 10])
    )
    np.testing.assert_allclose(scores, [1 / 3, 1.0], atol=1e-6)
