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
