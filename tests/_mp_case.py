"""Shared model/batch definition for the multi-process distributed test.

Imported by BOTH the pytest process (single-process ground truth) and each
gloo worker (tests/_mp_worker.py) so the two computations are byte-identical
by construction: same tiny flagship config, same PRNGKey(0) params, same
NumPy seed-0 batch, same jitted value_and_grad.
"""

import numpy as np


def make_case():
    import jax

    from vqa_attention_networks_tpu.config import Config
    from vqa_attention_networks_tpu.models import get_model
    from vqa_attention_networks_tpu.parallel import make_mesh
    from vqa_attention_networks_tpu.train.losses import soft_cross_entropy

    n, t, regions, d = 8, 7, 16, 32
    q_vocab, a_vocab = 25, 11
    cfg = Config(
        model_name="mhb_coAtt", q_vocab_size=q_vocab, a_vocab_size=a_vocab,
        hidden_dim=16, emb_dim=8, img_feature_channel=d,
        img_feature_dim=regions, max_question_length=t,
        mfb_factor=5, mfb_out=8,
    )
    model = get_model(cfg.model_name)
    params = model.init(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((n, regions, d)).astype(np.float32)
    ques = rng.integers(0, q_vocab, size=(n, t)).astype(np.int32)
    soft = rng.random((n, a_vocab)).astype(np.float32)
    soft /= soft.sum(1, keepdims=True)

    def loss_fn(p, img, ques, soft):
        logits, _ = model.apply(p, cfg, img, ques, train=False)
        return soft_cross_entropy(logits, soft)

    return {
        "params": params,
        "batch": (img, ques, soft),
        "grad_fn": jax.jit(jax.value_and_grad(loss_fn)),
        "mesh_fn": lambda: make_mesh(model=1),
    }


def make_eval_solver(workdir, store_sub, results_sub, data_axis, n_val=24,
                     **cfg_kw):
    """Deterministic Solver for the multi-process full-eval parity test.

    Same seed-0 synthetic data + flagship config on every caller, so the
    multi-process val(full=True) and the single-process ground truth
    compute over byte-identical inputs. ``store_sub`` must be per-process
    (the synthetic store writes files); ``results_sub`` is shared — only
    the primary host writes results artifacts. ``n_val`` not divisible by
    the batch size (8) exercises the padded final batch: pad rows carry
    repeated question ids and must be masked out of every host-side
    metric by the valid mask.
    """
    import os

    from vqa_attention_networks_tpu.config import Config
    from vqa_attention_networks_tpu.data.feature_store import (
        make_synthetic_feature_store,
    )
    from vqa_attention_networks_tpu.data.prepare import make_synthetic_qa_data
    from vqa_attention_networks_tpu.parallel import make_mesh
    from vqa_attention_networks_tpu.train.solver import Solver

    rng = np.random.default_rng(0)
    qa = make_synthetic_qa_data(rng, n_train=32, n_val=n_val, num_images=4)
    store = make_synthetic_feature_store(
        os.path.join(workdir, store_sub, "feat"),
        image_ids=sorted(set(qa.train.image_ids) | set(qa.val.image_ids)),
        num_regions=196, channels=32,
    )
    cfg = Config(
        model_name="mhb_coAtt", q_vocab_size=qa.q_vocab_size,
        a_vocab_size=qa.a_vocab_size, hidden_dim=16, emb_dim=8,
        img_feature_channel=32,
        max_question_length=qa.max_question_length, mfb_factor=5,
        mfb_out=8, batch_size=8, num_epoch=1, checkpoint_every_steps=0,
        out_dir=os.path.join(workdir, store_sub, "models"),
        results_dir=os.path.join(workdir, results_sub, "results"),
        **cfg_kw,
    ).validate()
    mesh = make_mesh(data=data_axis, model=1)
    return Solver(cfg, qa, store, mesh=mesh,
                  log_dir=os.path.join(workdir, store_sub, "runs"))
