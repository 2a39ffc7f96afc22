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
