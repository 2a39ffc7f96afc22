"""Checkpoint-resume determinism: interrupted training must replay the
exact batch order + dropout keys and land on the same parameters as an
uninterrupted run (a capability the reference cannot express — it only
saves final weights, solver.py:184-190)."""

import jax
import numpy as np

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.data.feature_store import (
    make_synthetic_feature_store,
)
from vqa_attention_networks_tpu.data.prepare import make_synthetic_qa_data
from vqa_attention_networks_tpu.parallel import make_mesh
from vqa_attention_networks_tpu.train.solver import Solver


def _solver(tmp_path, num_epoch, tag, **cfg_kw):
    qa = make_synthetic_qa_data(
        np.random.default_rng(0), n_train=64, n_val=16, num_images=4
    )
    store = make_synthetic_feature_store(
        str(tmp_path / f"feat_{tag}"),
        image_ids=sorted(set(qa.train.image_ids) | set(qa.val.image_ids)),
        num_regions=196,
        channels=16,
    )
    kw = dict(
        model_name="iBOWIMG",
        q_vocab_size=qa.q_vocab_size,
        a_vocab_size=qa.a_vocab_size,
        hidden_dim=8, emb_dim=8, embed_size=8, img_feature_channel=16,
        max_question_length=qa.max_question_length,
        mfb_factor=5, mfb_out=4,
        batch_size=16,
        num_epoch=num_epoch,
        checkpoint_every_steps=0,
        out_dir=str(tmp_path / f"models_{tag}"),
        results_dir=str(tmp_path / f"results_{tag}"),
    )
    kw.update(cfg_kw)
    cfg = Config(**kw).validate()
    return Solver(cfg, qa, store, mesh=make_mesh(data=1, model=1),
                  log_dir=str(tmp_path / f"runs_{tag}"))


def test_interrupted_training_matches_straight_run(tmp_path):
    # straight: 4 epochs
    straight = _solver(tmp_path, 4, "straight")
    straight.train()

    # interrupted: 2 epochs, checkpoint, fresh solver restores + finishes
    first = _solver(tmp_path, 2, "resume")
    first.train()
    first.save_checkpoint()

    second = _solver(tmp_path, 4, "resume")
    second.restore()
    assert second.step == first.step
    second.train()

    a = jax.tree_util.tree_leaves(straight.params)
    b = jax.tree_util.tree_leaves(second.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7
        )


def test_mid_epoch_resume_matches_straight_run(tmp_path):
    """checkpoint_every_steps deliberately NOT epoch-aligned: 4 iters/epoch,
    checkpoint at step 3. Resume must skip the already-trained prefix of the
    restart epoch (not replay it from batch 0) and land on identical params."""
    straight = _solver(tmp_path, 3, "mid_straight")
    straight.train()
    assert straight.step == 12

    first = _solver(tmp_path, 1, "mid_resume", checkpoint_every_steps=3)
    first.train()  # writes a checkpoint at step 3, mid-epoch 0

    second = _solver(tmp_path, 3, "mid_resume")
    second.restore(step=3)
    assert second.step == 3
    second.train()
    assert second.step == 12  # 3 epochs x 4 iters, no double-consumed batches

    a = jax.tree_util.tree_leaves(straight.params)
    b = jax.tree_util.tree_leaves(second.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7
        )


def test_epoch_shuffle_is_function_of_seed_and_epoch(tmp_path):
    s1 = _solver(tmp_path, 1, "sh1")
    s2 = _solver(tmp_path, 1, "sh2")
    e0_a = [b.answers.copy() for b in s1.batches["train"].epoch(0)]
    e0_b = [b.answers.copy() for b in s2.batches["train"].epoch(0)]
    for x, y in zip(e0_a, e0_b):
        np.testing.assert_array_equal(x, y)
    e1 = [b.answers.copy() for b in s1.batches["train"].epoch(1)]
    assert not all(
        np.array_equal(x, y) for x, y in zip(e0_a, e1)
    )
