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


@pytest.mark.parametrize("quantized", [False, True],
                         ids=["f16_store", "int8_store"])
def test_sharded_bank_bit_identical_to_host_and_replicated(
    tmp_path, quantized
):
    # Config.device_feature_bank_shard: bank rows split over the 'data'
    # axis, gather = ppermute ring over ICI. Each row is filled by exactly
    # one owner with the replicated lookup's expression (via `where`, no
    # float adds), so all three feeds must agree EXACTLY. The 6-image
    # store is NOT divisible by data=4, so this also exercises the
    # zero-row padding path.
    qa = _qa()
    store = _store(tmp_path, qa, quantized)
    mesh = make_mesh(data=4, model=2)
    m_host, loss_h, acc_h = _run(tmp_path, qa, store, "sh_host", mesh=mesh)
    m_repl, loss_r, acc_r = _run(
        tmp_path, qa, store, "sh_repl", mesh=make_mesh(data=4, model=2),
        device_feature_bank=True,
    )
    m_shrd, loss_s, acc_s = _run(
        tmp_path, qa, store, "sh_shrd", mesh=make_mesh(data=4, model=2),
        device_feature_bank=True, device_feature_bank_shard=True,
    )
    assert m_shrd["train_loss"] == m_host["train_loss"] == m_repl["train_loss"]
    assert m_shrd["train_acc"] == m_host["train_acc"] == m_repl["train_acc"]
    assert loss_s == loss_h == loss_r and acc_s == acc_h == acc_r


def test_combined_store_bank_uses_dense_rows(tmp_path):
    # A CombinedFeatureStore's row handles are (store << 40) | row — they
    # neither fit int32 nor index a concatenated table. The bank path must
    # densify them (store.dense_rows / all_rows); before the fix the cast
    # to int32 silently truncated every handle from the second store.
    from vqa_attention_networks_tpu.data.feature_store import (
        CombinedFeatureStore,
    )

    qa = _qa()
    ids = sorted(set(qa.train.image_ids) | set(qa.val.image_ids))
    assert len(ids) >= 4
    s0 = make_synthetic_feature_store(
        str(tmp_path / "f0"), image_ids=ids[:2], num_regions=196, channels=32
    )
    s1 = make_synthetic_feature_store(
        str(tmp_path / "f1"), image_ids=ids[2:], num_regions=196, channels=32
    )
    store = CombinedFeatureStore([s0, s1])
    # dense handles must round-trip to the same bytes gather_rows returns
    enc = store.rows_for(ids)
    dense = store.dense_rows(enc)
    assert dense.max() < len(store) and dense.min() >= 0
    table = store.gather_rows(store.all_rows(), dtype=np.float32)
    np.testing.assert_array_equal(
        table[dense], store.gather_rows(enc, dtype=np.float32)
    )
    m_host, loss_h, acc_h = _run(tmp_path, qa, store, "comb_host")
    m_bank, loss_b, acc_b = _run(
        tmp_path, qa, store, "comb_bank", device_feature_bank=True
    )
    assert m_bank["train_loss"] == m_host["train_loss"]
    assert m_bank["train_acc"] == m_host["train_acc"]
    assert loss_b == loss_h and acc_b == acc_h


def test_f32_compute_bank_stays_f16_resident(tmp_path):
    # ADVICE r4: an f16-native store must stay f16 in HBM under f32
    # compute (the in-graph upcast is exact) — half the bank bytes.
    qa = _qa()
    store = _store(tmp_path, qa, quantized=False)
    cfg = _cfg(tmp_path, qa, "f16res", device_feature_bank=True,
               compute_dtype="float32")
    solver = Solver(cfg, qa, store, mesh=make_mesh(data=1, model=1),
                    log_dir=str(tmp_path / "runs_f16res"))
    kind, table, scale, lookup = solver._bank
    assert kind == "f" and table.dtype == np.float16
    # and the lookup still emits the f32 the host feed would ship
    import jax.numpy as jnp

    out = lookup(table, np.zeros(4, np.int32))
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(out),
        store.gather_rows(np.zeros(4, np.int64), dtype=np.float32),
    )
    solver.close()


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
