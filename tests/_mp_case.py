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
