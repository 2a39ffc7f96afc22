"""Distributed correctness on 8 emulated devices (SURVEY.md section 4):
sharded runs must match the single-device run bit-for-bit in expectation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_params,
)
from vqa_attention_networks_tpu.train.losses import soft_cross_entropy

N, T, L, D = 16, 7, 196, 32
Q_VOCAB, A_VOCAB = 25, 11


def _cfg():
    return Config(
        model_name="mhb_coAtt", q_vocab_size=Q_VOCAB, a_vocab_size=A_VOCAB,
        hidden_dim=16, emb_dim=8, img_feature_channel=D,
        max_question_length=T, mfb_factor=5, mfb_out=8,
    )


def _data(rng):
    img = rng.standard_normal((N, L, D)).astype(np.float32)
    ques = rng.integers(0, Q_VOCAB, size=(N, T)).astype(np.int32)
    soft = rng.random((N, A_VOCAB)).astype(np.float32)
    soft /= soft.sum(1, keepdims=True)
    return img, ques, soft


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_loss_and_grads_match_single_device(mesh_shape):
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    cfg = _cfg()
    model = get_model("mhb_coAtt")
    params = model.init(jax.random.PRNGKey(0), cfg)
    img, ques, soft = _data(np.random.default_rng(0))

    def loss_fn(p, img, ques, soft):
        logits, _ = model.apply(p, cfg, img, ques, train=False)
        return soft_cross_entropy(logits, soft)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    # single device
    loss_1, grads_1 = grad_fn(params, img, ques, soft)

    # sharded: batch over 'data', fusion projections over 'model'
    data, model_par = mesh_shape
    mesh = make_mesh(data=data, model=model_par)
    p_sh = shard_params(mesh, params, cfg.fusion_dim)
    img_sh, ques_sh, soft_sh = shard_batch(mesh, (img, ques, soft))
    loss_8, grads_8 = grad_fn(p_sh, img_sh, ques_sh, soft_sh)

    np.testing.assert_allclose(float(loss_1), float(loss_8), rtol=1e-5)
    flat_1 = jax.tree_util.tree_leaves(grads_1)
    flat_8 = jax.tree_util.tree_leaves(grads_8)
    for a, b in zip(flat_1, flat_8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        )


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_bf16_inference_path_on_tp_mesh(mesh_shape):
    """The bf16 eval path routes through grid_fuse_weight_contracted
    (ops/fusion.py), whose w.reshape(D, O, K) runs under a fusion-axis
    'model'-sharded weight. It must compile + execute on a >1-'model' mesh
    and agree with the single-device result."""
    assert len(jax.devices()) >= 8
    cfg = Config(
        model_name="mhb_coAtt", q_vocab_size=Q_VOCAB, a_vocab_size=A_VOCAB,
        hidden_dim=16, emb_dim=8, img_feature_channel=D,
        max_question_length=T, mfb_factor=5, mfb_out=8,
        compute_dtype="bfloat16",
    ).validate()
    model = get_model("mhb_coAtt")
    params = model.init(jax.random.PRNGKey(0), cfg)
    img, ques, _ = _data(np.random.default_rng(1))
    img16 = img.astype(np.float16)  # the f16 feed the bf16 config ships

    def fwd(p, img, ques):
        logits, _ = model.apply(p, cfg, img, ques, train=False)
        return logits

    fwd_j = jax.jit(fwd)
    logits_1 = np.asarray(fwd_j(params, img16, ques))

    data, model_par = mesh_shape
    mesh = make_mesh(data=data, model=model_par)
    p_sh = shard_params(mesh, params, cfg.fusion_dim)
    img_sh, ques_sh = shard_batch(mesh, (img16, ques))
    logits_8 = np.asarray(fwd_j(p_sh, img_sh, ques_sh))

    # bf16 compute: identical op sequence, but collective reduction order may
    # differ — tolerance at the bf16 resolution of the logits
    np.testing.assert_allclose(logits_1, logits_8, rtol=2e-2, atol=2e-2)


def test_tp_sharding_places_fusion_axis():
    cfg = _cfg()
    model = get_model("mhb_coAtt")
    params = model.init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(mesh, params, cfg.fusion_dim)
    # the wide projections are column-sharded over 'model'
    spec = sharded["ques_proj1"]["w"].sharding.spec
    assert spec[-1] == "model"
    # small layers stay replicated
    spec2 = sharded["lstm"]["w_hh"].sharding.spec
    assert all(s is None for s in spec2)


def test_remat_and_grad_accum_compose_with_spmd(tmp_path):
    # --remat and --grad_accum_steps must not change results under SPMD:
    # one solver train step on a (4,2) mesh with both enabled matches the
    # same step on a (1,1) mesh (same seed/data), up to collective
    # reduction-order noise
    from vqa_attention_networks_tpu.data.feature_store import (
        make_synthetic_feature_store,
    )
    from vqa_attention_networks_tpu.data.prepare import make_synthetic_qa_data
    from vqa_attention_networks_tpu.train.solver import Solver

    def build(sub, mesh_shape):
        rng = np.random.default_rng(0)
        qa = make_synthetic_qa_data(rng, n_train=96, n_val=24, num_images=6)
        store = make_synthetic_feature_store(
            str(tmp_path / sub),
            image_ids=sorted(set(qa.train.image_ids) | set(qa.val.image_ids)),
            num_regions=196, channels=32,
        )
        cfg = Config(
            model_name="mhb_coAtt", q_vocab_size=qa.q_vocab_size,
            a_vocab_size=qa.a_vocab_size, hidden_dim=16, emb_dim=8,
            img_feature_channel=32,
            max_question_length=qa.max_question_length, mfb_factor=5,
            mfb_out=8, batch_size=16, num_epoch=1, checkpoint_every_steps=0,
            remat=True, grad_accum_steps=2,
            data_parallel=mesh_shape[0], model_parallel=mesh_shape[1],
        ).validate()
        mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
        return Solver(cfg, qa, store, mesh=mesh,
                      log_dir=str(tmp_path / sub / "runs"))

    import optax

    results = []
    for sub, shape in (("single", (1, 1)), ("mesh", (4, 2))):
        solver = build(sub, shape)
        # sgd(1.0) makes (init - new) == the accumulated gradients: Adam
        # would amplify f32 noise on near-zero-gradient leaves into
        # full-lr sign flips, hiding the SPMD property under test
        solver.tx = optax.sgd(1.0)
        solver.opt_state = solver.tx.init(solver.params)
        batch = next(solver.batches["train"].epoch())
        dev = solver._device_batch(batch)
        key = jax.random.fold_in(solver._rng_base, 0)
        init = jax.device_get(solver.params)
        params, _, loss, correct = solver._train_step(
            solver.params, solver.opt_state, *dev, key
        )
        grads = jax.tree_util.tree_map(
            lambda a, b: np.asarray(a) - np.asarray(b), init,
            jax.device_get(params),
        )
        results.append((grads, float(loss), float(correct)))

    (g1, l1, c1), (g8, l8, c8) = results
    assert c1 == c8
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-6)


def test_full_val_host_metrics_on_mesh(tmp_path):
    # the host-side eval metrics (official consensus, per-answer-type
    # breakdown, submission export) must survive SPMD: fetching the
    # per-sample preds of a (4,2)-sharded eval step is a cross-shard
    # gather, and every figure must match the (1,1) run exactly
    import json
    import os

    from vqa_attention_networks_tpu.data.feature_store import (
        make_synthetic_feature_store,
    )
    from vqa_attention_networks_tpu.data.prepare import make_synthetic_qa_data
    from vqa_attention_networks_tpu.train.solver import Solver

    records = []
    for sub, shape in (("single", (1, 1)), ("mesh", (4, 2))):
        rng = np.random.default_rng(0)
        qa = make_synthetic_qa_data(rng, n_train=32, n_val=24, num_images=4)
        store = make_synthetic_feature_store(
            str(tmp_path / sub / "feat"),
            image_ids=sorted(set(qa.train.image_ids) | set(qa.val.image_ids)),
            num_regions=196, channels=32,
        )
        cfg = Config(
            model_name="mhb_coAtt", q_vocab_size=qa.q_vocab_size,
            a_vocab_size=qa.a_vocab_size, hidden_dim=16, emb_dim=8,
            img_feature_channel=32,
            max_question_length=qa.max_question_length, mfb_factor=5,
            mfb_out=8, batch_size=8, num_epoch=1, checkpoint_every_steps=0,
            data_parallel=shape[0], model_parallel=shape[1],
            out_dir=str(tmp_path / sub / "models"),
            results_dir=str(tmp_path / sub / "results"),
        ).validate()
        mesh = make_mesh(data=shape[0], model=shape[1])
        solver = Solver(cfg, qa, store, mesh=mesh,
                        log_dir=str(tmp_path / sub / "runs"))
        solver.val(full=True)
        rdir = tmp_path / sub / "results"
        record = json.loads((rdir / "mhb_coAtt.json").read_text())
        preds = json.loads((rdir / "mhb_coAtt_predictions.json").read_text())
        records.append((record, preds))

    (rec1, preds1), (rec8, preds8) = records
    assert rec1["num_examples"] == rec8["num_examples"] == 24
    assert "vqa_consensus_accuracy" in rec1
    assert set(rec1["per_answer_type"]) == set(rec8["per_answer_type"])
    np.testing.assert_allclose(rec1["accuracy"], rec8["accuracy"], atol=1e-9)
    np.testing.assert_allclose(
        rec1["vqa_consensus_accuracy"], rec8["vqa_consensus_accuracy"],
        atol=1e-9,
    )
    assert preds1 == preds8  # identical ids AND identical answer strings
