"""End-to-end slice (SURVEY.md section 7.2): synthetic data -> Solver train
steps -> eval -> checkpoint -> restore, all statically shaped on CPU."""

import numpy as np
import pytest

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.data.feature_store import (
    make_synthetic_feature_store,
)
from vqa_attention_networks_tpu.data.prepare import make_synthetic_qa_data
from vqa_attention_networks_tpu.parallel import make_mesh
from vqa_attention_networks_tpu.train.solver import Solver


def _setup(tmp_path, model_name, **cfg_kw):
    rng = np.random.default_rng(0)
    qa = make_synthetic_qa_data(rng, n_train=96, n_val=24, num_images=6)
    store = make_synthetic_feature_store(
        str(tmp_path / "feat"),
        image_ids=sorted(set(qa.train.image_ids) | set(qa.val.image_ids)),
        num_regions=196,
        channels=32,
    )
    base_kw = dict(
        model_name=model_name,
        q_vocab_size=qa.q_vocab_size,
        a_vocab_size=qa.a_vocab_size,
        hidden_dim=16,
        emb_dim=8,
        embed_size=16,
        img_feature_channel=32,
        max_question_length=qa.max_question_length,
        mfb_factor=5,
        mfb_out=8,
        batch_size=16,
        num_epoch=2,
        checkpoint_every_steps=0,
        out_dir=str(tmp_path / "models"),
        results_dir=str(tmp_path / "results"),
    )
    base_kw.update(cfg_kw)
    cfg = Config(**base_kw).validate()
    mesh = make_mesh(data=1, model=1)
    solver = Solver(cfg, qa, store, mesh=mesh, log_dir=str(tmp_path / "runs"))
    return solver, qa


def test_train_eval_checkpoint_roundtrip(tmp_path):
    # iBOWIMG: cheapest model (no recurrence) — exercises every layer of the
    # stack including batch-norm state threading.
    solver, _ = _setup(tmp_path, "iBOWIMG")
    metrics = solver.train()
    assert np.isfinite(metrics["train_loss"])
    # batchnorm running stats moved away from init
    assert float(np.abs(np.asarray(solver.params["img_bn"]["mean"])).max()) > 0

    loss, acc = solver.val(full=True)
    assert np.isfinite(loss) and 0.0 <= acc <= 1.0
    # results artifact in the reference's format (solver.py:179-182)
    txt = (tmp_path / "results" / "iBOWIMG.txt").read_text()
    assert txt.startswith("Evaluation accuracy: ")

    # JSON sidecar carries the official per-answer-type breakdown (synthetic
    # answer_types spread over all three codes) and it reconciles exactly
    # with the split-level exact-match accuracy
    import json

    record = json.loads(
        (tmp_path / "results" / "iBOWIMG.json").read_text()
    )
    per_type = record["per_answer_type"]
    assert set(per_type) <= {"yes/no", "number", "other"}
    n_sum = sum(v["num_examples"] for v in per_type.values())
    assert n_sum == record["num_examples"]
    correct_sum = sum(
        v["accuracy"] * v["num_examples"] for v in per_type.values()
    )
    np.testing.assert_allclose(
        correct_sum, record["accuracy"] * record["num_examples"], atol=1e-6
    )
    consensus_sum = sum(
        v["vqa_consensus_accuracy"] * v["num_examples"]
        for v in per_type.values()
    )
    np.testing.assert_allclose(
        consensus_sum,
        record["vqa_consensus_accuracy"] * record["num_examples"],
        atol=1e-6,
    )

    # official leaderboard-submission export: one row per val question,
    # unique ids, every answer a real vocab word
    preds = json.loads(
        (tmp_path / "results" / "iBOWIMG_predictions.json").read_text()
    )
    assert len(preds) == record["num_examples"]
    qids = [p["question_id"] for p in preds]
    assert len(set(qids)) == len(qids)
    vocab = set(solver._answer_words.values())
    assert all(p["answer"] in vocab for p in preds)

    # checkpoint -> perturb -> restore -> identical params
    path = solver.save()
    before = np.asarray(solver.params["fc"]["w"])
    solver.params["fc"]["w"] = solver.params["fc"]["w"] * 0.0
    solver.restore()
    after = np.asarray(solver.params["fc"]["w"])
    np.testing.assert_array_equal(before, after)
    assert path


def test_soft_answer_training_step(tmp_path):
    # flagship loss path: soft cross-entropy (KLDiv semantics)
    solver, _ = _setup(tmp_path, "mhb_coAtt", num_epoch=1)
    assert solver.cfg.soft_answer
    metrics = solver.train()
    assert np.isfinite(metrics["train_loss"])
    assert metrics["train_loss"] > 0


def test_loss_decreases_when_learnable(tmp_path):
    # iBOWIMG on a tiny dataset should fit: loss after 8 epochs < first epoch
    import glob
    import json

    solver, _ = _setup(tmp_path, "iBOWIMG", num_epoch=8)
    solver.train()
    events = []
    for path in glob.glob(str(tmp_path / "runs" / "**" / "events.jsonl"),
                          recursive=True):
        with open(path) as f:
            events += [json.loads(line) for line in f]
    losses = [e["train loss"] for e in events if "train loss" in e]
    assert len(losses) == 8
    assert losses[-1] < losses[0]


def test_early_stopping_trains_past_best_and_saves(tmp_path):
    # Regression for the donation crash: the best-params snapshot must be a
    # materialised copy (the analog of the reference's copy.deepcopy,
    # solver.py:62). An aliasing snapshot dies with "Array has been deleted"
    # at save() after the next donated train step.
    import jax

    solver, _ = _setup(
        tmp_path, "iBOWIMG", num_epoch=10, early_stopping=True, patience=2
    )
    # Scripted val losses: epoch 0 is the best; every later epoch is worse,
    # so training continues (donating params) past the snapshot and then
    # early-stops once patience is exhausted.
    scripted = iter([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0])
    real_val = solver.val

    def fake_val(full=False):
        if full:
            return real_val(full=True)
        _, acc = real_val()
        return next(scripted), acc

    solver.val = fake_val
    solver.train()
    assert solver.i_patience >= solver.cfg.patience
    assert solver.best_params is not None
    # the snapshot must still be readable after donated steps ran
    best = [np.asarray(x) for x in jax.tree_util.tree_leaves(solver.best_params)]
    final = [np.asarray(x) for x in jax.tree_util.tree_leaves(solver.params)]
    assert any(not np.array_equal(b, f) for b, f in zip(best, final)), (
        "best snapshot should differ from the final (worse) params"
    )
    # final save exports the best snapshot (solver.py:184-190 semantics)
    path = solver.save()
    assert path
    from vqa_attention_networks_tpu.utils import checkpoint as ckpt

    exported = ckpt.load_weights(
        str(tmp_path / "models" / "iBOWIMG"), solver.best_params
    )
    for a, b in zip(jax.tree_util.tree_leaves(exported), best):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_early_stop_state_survives_restore(tmp_path):
    solver, _ = _setup(
        tmp_path, "iBOWIMG", num_epoch=2, early_stopping=True, patience=5
    )
    solver.train()
    assert solver.best_params is not None
    min_loss, patience = solver.min_val_loss, solver.i_patience
    solver.save_checkpoint()

    fresh, _ = _setup(
        tmp_path, "iBOWIMG", num_epoch=2, early_stopping=True, patience=5
    )
    fresh.restore()
    assert fresh.min_val_loss == min_loss
    assert fresh.i_patience == patience
    assert fresh.best_params is not None
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(fresh.best_params),
        jax.tree_util.tree_leaves(solver.best_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_glove_training_path(tmp_path):
    # GloVe table installed as a frozen buffer; on-device gather; trains
    import jax
    import numpy as np

    from vqa_attention_networks_tpu.data.glove import random_glove_table

    solver, qa = _setup(tmp_path, "mhb_coAtt", num_epoch=1, glove=True,
                        emb_dim=8)
    # rebuild with a real (random) table
    from vqa_attention_networks_tpu.parallel import make_mesh
    from vqa_attention_networks_tpu.train.solver import Solver

    table = random_glove_table(qa.question_vocab, dim=8)
    solver = Solver(solver.cfg, qa, solver.batches["train"].store,
                    glove_table=table, mesh=make_mesh(data=1, model=1),
                    log_dir=str(tmp_path / "runs_glove"))
    np.testing.assert_array_equal(
        np.asarray(solver.params["glove_table"]), table
    )
    metrics = solver.train()
    assert np.isfinite(metrics["train_loss"])
    # the frozen table must not move under Adam
    np.testing.assert_array_equal(
        np.asarray(solver.params["glove_table"]), table
    )


def test_checkpoint_retention_keeps_newest_n(tmp_path):
    solver, _ = _setup(
        tmp_path, "iBOWIMG", num_epoch=3, checkpoint_every_steps=2,
        keep_checkpoints=2,
    )
    solver.train()
    solver.save()
    from vqa_attention_networks_tpu.utils import checkpoint as ckpt

    steps = ckpt.all_steps(str(tmp_path / "models" / "iBOWIMG"))
    assert len(steps) == 2, steps
    assert steps[-1] == solver.step  # the final save is the newest
    # the retained latest checkpoint still restores
    solver.restore()


def test_nan_loss_aborts_with_diagnostic(tmp_path):
    solver, _ = _setup(tmp_path, "iBOWIMG", num_epoch=1)
    # poison the params: training from NaN weights yields a NaN loss
    import jax

    solver.params = jax.tree_util.tree_map(
        lambda x: x * float("nan"), solver.params
    )
    with pytest.raises(FloatingPointError, match="non-finite train loss"):
        solver.train()


def test_remat_gradients_match(tmp_path):
    # jax.checkpoint must change memory usage only: one train step with and
    # without remat from identical init yields identical params (flagship:
    # LSTM scan + fusion + dropout — the rng path must thread through remat)
    import jax

    results = []
    for remat in (False, True):
        solver, _ = _setup(
            tmp_path / ("remat" if remat else "base"), "mhb_coAtt",
            num_epoch=1, remat=remat,
        )
        batch = next(solver.batches["train"].epoch())
        dev = solver._device_batch(batch)
        key = jax.random.fold_in(solver._rng_base, 0)
        params, _, loss, _ = solver._train_step(
            solver.params, solver.opt_state, *dev, key
        )
        results.append((jax.device_get(params), float(loss)))

    (p0, l0), (p1, l1) = results
    assert l0 == l1
    flat0 = jax.tree_util.tree_leaves(p0)
    flat1 = jax.tree_util.tree_leaves(p1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_array_equal(a, b)


def test_grad_accum_matches_manual_average(tmp_path):
    # accumulation spec: one step with grad_accum_steps=2 accumulates the
    # average of the two half-batch gradients (dropout keys fold_in(rng, i)).
    # Compare the GRADIENTS, not post-Adam params: swapping the transform
    # for sgd(1.0) makes (params - params_new) == the accumulated grads.
    # (Adam would turn f32 noise on a near-zero gradient into a full-lr
    # sign-flipped update, making param comparison meaningless.)
    import jax
    import optax

    solver, _ = _setup(tmp_path / "accum", "mhb_coAtt", num_epoch=1,
                       grad_accum_steps=2)
    solver.tx = optax.sgd(1.0)  # before the first _train_step call = traced
    solver.opt_state = solver.tx.init(solver.params)
    batch = next(solver.batches["train"].epoch())
    dev = solver._device_batch(batch)
    key = jax.random.fold_in(solver._rng_base, 0)
    init_params = jax.device_get(solver.params)
    params_new, _, loss_accum, _ = solver._train_step(
        solver.params, solver.opt_state, *dev, key
    )
    grads_accum = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a) - np.asarray(b), init_params,
        jax.device_get(params_new),
    )

    # manual twin from the same init (fresh solver, same seed => same params)
    ref, _ = _setup(tmp_path / "ref", "mhb_coAtt", num_epoch=1)
    img, ques, answers, qlen, valid, soft = [np.asarray(x) for x in dev]
    n = img.shape[0] // 2

    def half_grads(i):
        sl = slice(i * n, (i + 1) * n)

        def loss_fn(p):
            logits, _ = ref.model.apply(
                p, ref.cfg, img[sl], ques[sl], ques_length=qlen[sl],
                train=True, rng=jax.random.fold_in(key, i),
            )
            return ref._loss(logits, answers[sl], soft[sl], valid[sl])

        return jax.value_and_grad(loss_fn)(ref.params)

    (l0, g0), (l1, g1) = half_grads(0), half_grads(1)
    grads_manual = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g0, g1)

    np.testing.assert_allclose(
        float(loss_accum), (float(l0) + float(l1)) / 2, rtol=1e-6
    )
    flat_a, tree_a = jax.tree_util.tree_flatten(grads_accum)
    flat_m, tree_m = jax.tree_util.tree_flatten(jax.device_get(grads_manual))
    assert tree_a == tree_m
    for a, b in zip(flat_a, flat_m):
        # atol ~ param_magnitude * f32 eps: the params-subtraction recovery
        # of the accumulated grads quantises at the PARAM's magnitude
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=2e-6)


def test_grad_accum_bn_stats_apply_momentum_per_microbatch(tmp_path):
    # torch applies BN momentum once per FORWARD: under grad_accum_steps=a
    # the running stats must see a sequential EMA applications per optimizer
    # step (one per microbatch), not a single one from the last microbatch
    import jax

    from vqa_attention_networks_tpu.train.solver import BN_MOMENTUM

    solver, _ = _setup(tmp_path / "accum", "iBOWIMG", num_epoch=1,
                       grad_accum_steps=2, dropout_default=0.0)
    batch = next(solver.batches["train"].epoch())
    dev = solver._device_batch(batch)
    key = jax.random.fold_in(solver._rng_base, 0)
    init_stats = {k: np.asarray(solver.params["img_bn"][k])
                  for k in ("mean", "var")}
    # snapshot before the step: params are donated
    w = np.asarray(solver.params["img_emb"]["w"], np.float64)
    b = np.asarray(solver.params["img_emb"]["b"], np.float64)
    params_new, _, _, _ = solver._train_step(
        solver.params, solver.opt_state, *dev, key
    )

    # manual twin: per-microbatch batch stats EMA'd sequentially
    img, ques, answers, qlen, valid, soft = [np.asarray(x) for x in dev]
    n = img.shape[0] // 2
    run = dict(init_stats)
    for i in range(2):
        sl = slice(i * n, (i + 1) * n)
        x = img[sl].astype(np.float64).mean(axis=1) @ w + b
        v = valid[sl].astype(bool)
        x = x[v]
        mean = x.mean(axis=0)
        var_unbiased = x.var(axis=0) * (len(x) / max(len(x) - 1, 1))
        run = {
            "mean": (1 - BN_MOMENTUM) * run["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * run["var"] + BN_MOMENTUM * var_unbiased,
        }

    got = jax.device_get(params_new["img_bn"])
    np.testing.assert_allclose(got["mean"], run["mean"], rtol=1e-4)
    np.testing.assert_allclose(got["var"], run["var"], rtol=1e-4)
    # and they genuinely moved twice: a single-EMA result would differ
    one_ema = (1 - BN_MOMENTUM) * init_stats["mean"] + BN_MOMENTUM * mean
    assert not np.allclose(got["mean"], one_ema, rtol=1e-4)


def test_soft_bce_override_gets_real_soft_targets(tmp_path):
    # loss_override=soft_bce forces soft answers for ANY model — without
    # this the loss trains against the [B,1] zero placeholder
    cfg = Config(model_name="iBOWIMG", loss_override="soft_bce").validate()
    assert cfg.soft_answer
    solver, _ = _setup(tmp_path, "iBOWIMG", num_epoch=1,
                       loss_override="soft_bce")
    batch = next(solver.batches["train"].epoch())
    assert batch.soft_answers is not None
    assert batch.soft_answers.shape[1] == solver.cfg.a_vocab_size
    metrics = solver.train()
    assert np.isfinite(metrics["train_loss"])


def test_explicit_data_parallel_is_honoured(tmp_path):
    # Config.data_parallel must shape the DEFAULT mesh (mesh=None); an
    # explicitly passed mesh (as _setup does) rightly wins otherwise
    base, qa = _setup(tmp_path, "iBOWIMG", num_epoch=1)
    store = base.batches["train"].store

    solver = Solver(base.cfg.replace(data_parallel=4), qa, store,
                    log_dir=str(tmp_path / "runs_dp"))
    assert solver.mesh.shape["data"] == 4

    with pytest.raises(ValueError, match="not divisible"):
        Solver(base.cfg.replace(data_parallel=3), qa, store,
               log_dir=str(tmp_path / "runs_dp_bad"))


def test_empty_train_split_raises_cleanly(tmp_path):
    solver, _ = _setup(tmp_path, "iBOWIMG", num_epoch=1)
    import dataclasses as _dc

    split = solver.batches["train"].split
    empty = _dc.replace(
        split,
        questions=split.questions[:0], answers=split.answers[:0],
        ques_length=split.ques_length[:0], image_ids=split.image_ids[:0],
        soft_idx=split.soft_idx[:0], soft_val=split.soft_val[:0],
    )
    solver.batches["train"].split = empty
    solver.batches["train"]._rows = solver.batches["train"]._rows[:0]
    with pytest.raises(ValueError, match="empty"):
        solver.train()


def test_grad_accum_bn_skips_all_pad_microbatches(tmp_path):
    # slices of the epoch's padded final batch can be ENTIRELY padding
    # under grad accumulation; their masked batch stats are mean=0/var=0
    # and must NOT be EMA'd into the running stats (each zero application
    # shrinks them toward 0 right before val() reads them)
    import jax

    from vqa_attention_networks_tpu.train.solver import BN_MOMENTUM

    solver, _ = _setup(tmp_path / "pad", "iBOWIMG", num_epoch=1,
                       grad_accum_steps=2, dropout_default=0.0)
    batch = next(solver.batches["train"].epoch())
    img, ques, answers, qlen, valid, soft = [
        np.asarray(x) for x in solver._device_batch(batch)
    ]
    n = img.shape[0] // 2
    valid = valid.copy()
    valid[n:] = False  # microbatch 2 is all padding
    key = jax.random.fold_in(solver._rng_base, 0)
    init_stats = {k: np.asarray(solver.params["img_bn"][k])
                  for k in ("mean", "var")}
    w = np.asarray(solver.params["img_emb"]["w"], np.float64)
    b = np.asarray(solver.params["img_emb"]["b"], np.float64)
    params_new, _, _, _ = solver._train_step(
        solver.params, solver.opt_state, img, ques, answers, qlen, valid,
        soft, key,
    )

    # expected: exactly ONE EMA application (microbatch 1), none for the
    # all-pad microbatch 2
    x = (img[:n].astype(np.float64).mean(axis=1) @ w + b)
    x = x[valid[:n].astype(bool)]
    mean = x.mean(axis=0)
    var_unbiased = x.var(axis=0) * (len(x) / max(len(x) - 1, 1))
    want = {
        "mean": (1 - BN_MOMENTUM) * init_stats["mean"] + BN_MOMENTUM * mean,
        "var": (1 - BN_MOMENTUM) * init_stats["var"]
               + BN_MOMENTUM * var_unbiased,
    }
    got = jax.device_get(params_new["img_bn"])
    np.testing.assert_allclose(got["mean"], want["mean"], rtol=1e-4)
    np.testing.assert_allclose(got["var"], want["var"], rtol=1e-4)
