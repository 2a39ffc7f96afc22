"""Device-resident feature bank for TRAINING (Config.device_feature_bank).

The bank uploads the whole feature store to HBM once; batches carry row
indices and the gather (+ int8 dequant) runs in-graph. The contract is
bit-identical training vs the host feed: the bank stores exactly the bytes
the host would ship (int8 rows + f16 scales, or f16 rows) and applies the
same dequant expression, so loss/accuracy curves must match EXACTLY — any
drift means the feeds diverged. Counterpart of serving's DeviceFeatureCache
(serve.py); the enabler for compute-bound TPU soaks behind a slow relay
link (per-step feature upload was the wall, docs/OPERATIONS.md).
"""

import numpy as np
import pytest

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.data.dataset import VqaBatches
from vqa_attention_networks_tpu.data.feature_store import (
    make_synthetic_feature_store,
    quantize_store,
)
from vqa_attention_networks_tpu.data.prepare import make_synthetic_qa_data
from vqa_attention_networks_tpu.parallel import make_mesh
from vqa_attention_networks_tpu.train.solver import Solver


def _qa():
    return make_synthetic_qa_data(
        np.random.default_rng(0), n_train=96, n_val=24, num_images=6
    )


def _store(tmp_path, qa, quantized):
    ids = sorted(set(qa.train.image_ids) | set(qa.val.image_ids))
    f16 = make_synthetic_feature_store(
        str(tmp_path / "feat"), image_ids=ids, num_regions=196, channels=32
    )
    if not quantized:
        return f16
    return quantize_store(str(tmp_path / "feat"), str(tmp_path / "feat_q"))


def _cfg(tmp_path, qa, tag, **kw):
    return Config(
        model_name="iBOWIMG",
        q_vocab_size=qa.q_vocab_size,
        a_vocab_size=qa.a_vocab_size,
        hidden_dim=16,
        emb_dim=8,
        embed_size=16,
        img_feature_channel=32,
        max_question_length=qa.max_question_length,
        batch_size=16,
        num_epoch=2,
        checkpoint_every_steps=0,
        out_dir=str(tmp_path / f"models_{tag}"),
        results_dir=str(tmp_path / f"results_{tag}"),
        **kw,
    ).validate()


def _run(tmp_path, qa, store, tag, mesh=None, **cfg_kw):
    cfg = _cfg(tmp_path, qa, tag, **cfg_kw)
    solver = Solver(
        cfg, qa, store, mesh=mesh or make_mesh(data=1, model=1),
        log_dir=str(tmp_path / f"runs_{tag}"),
    )
    metrics = solver.train()
    loss, acc = solver.val(full=True)
    solver.close()
    return metrics, loss, acc


@pytest.mark.parametrize("quantized", [False, True],
                         ids=["f16_store", "int8_store"])
def test_bank_training_bit_identical_to_host_feed(tmp_path, quantized):
    qa = _qa()
    store = _store(tmp_path, qa, quantized)
    m_host, loss_h, acc_h = _run(tmp_path, qa, store, "host")
    m_bank, loss_b, acc_b = _run(
        tmp_path, qa, store, "bank", device_feature_bank=True
    )
    # same bytes + same on-device dequant => exact equality, not allclose
    assert m_bank["train_loss"] == m_host["train_loss"]
    assert m_bank["train_acc"] == m_host["train_acc"]
    assert loss_b == loss_h and acc_b == acc_h


def test_bank_on_data_parallel_mesh_matches_host_feed(tmp_path):
    # replicated bank + 'data'-sharded rows: the in-graph gather shards on
    # the batch axis. On the SAME 2-device mesh the bank and host feeds see
    # identical bytes in identical layouts, so training and full eval must
    # agree exactly (1-vs-N mesh equivalence of the host feed itself is
    # pinned separately in tests/test_sharding.py).
    qa = _qa()
    store = _store(tmp_path, qa, quantized=True)
    mesh2 = make_mesh(data=2, model=1)
    m_host, loss_h, acc_h = _run(tmp_path, qa, store, "dp2_host", mesh=mesh2)
    m_bank, loss_b, acc_b = _run(
        tmp_path, qa, store, "dp2_bank", mesh=make_mesh(data=2, model=1),
        device_feature_bank=True,
    )
    assert m_bank["train_loss"] == m_host["train_loss"]
    assert m_bank["train_acc"] == m_host["train_acc"]
    assert loss_b == loss_h and acc_b == acc_h


def test_bank_over_budget_raises_with_guidance(tmp_path):
    qa = _qa()
    store = _store(tmp_path, qa, quantized=False)
    cfg = _cfg(
        tmp_path, qa, "budget",
        device_feature_bank=True,
        device_feature_bank_budget=1024,  # 1 KiB — nothing fits
    )
    with pytest.raises(ValueError, match="quantize_store"):
        Solver(cfg, qa, store, mesh=make_mesh(data=1, model=1),
               log_dir=str(tmp_path / "runs_budget"))


def test_rows_mode_batches_carry_indices_not_bytes(tmp_path):
    qa = _qa()
    store = _store(tmp_path, qa, quantized=True)
    batches = VqaBatches(
        qa.train, store, batch_size=16, num_answers=qa.a_vocab_size,
        soft_answer=False, shuffle=False, feature_dtype=np.int8,
        device_bank=True,
    )
    b = next(batches.epoch(0))
    assert b.image_features is None and b.feature_scale is None
    assert b.image_rows is not None and b.image_rows.dtype == np.int32
    assert b.image_rows.shape == (16,)
    # indices resolve to the same rows the host gather would use
    want, _ = store.gather_rows_quantized(b.image_rows)
    got, _ = store.gather_rows_quantized(
        store.rows_for(qa.train.image_ids[:16])
    )
    np.testing.assert_array_equal(want, got)
