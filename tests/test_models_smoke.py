"""Every registry model: init + jitted forward on tiny shapes, train & eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_attention_networks_tpu.config import Config, MODEL_NAMES
from vqa_attention_networks_tpu.models import get_model

N, T, L, D = 4, 9, 196, 64
A_VOCAB, Q_VOCAB = 12, 30


def _tiny_cfg(name):
    return Config(
        model_name=name,
        q_vocab_size=Q_VOCAB,
        a_vocab_size=A_VOCAB,
        hidden_dim=32,
        emb_dim=16,
        embed_size=24,
        img_feature_channel=D,
        max_question_length=T,
        mfb_factor=5,
        mfb_out=20,  # fusion_dim = 100
        att_num=4,
    ).validate()


def _batch(rng):
    img = rng.standard_normal((N, L, D)).astype(np.float32)
    ques = rng.integers(0, Q_VOCAB, size=(N, T)).astype(np.int32)
    qlen = rng.integers(1, T + 1, size=(N,)).astype(np.int32)
    return jnp.asarray(img), jnp.asarray(ques), jnp.asarray(qlen)


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_forward_shapes_and_grads(name):
    cfg = _tiny_cfg(name)
    model = get_model(name)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, cfg)
    img, ques, qlen = _batch(np.random.default_rng(0))

    # eval forward, jitted
    @jax.jit
    def fwd(p, img, ques, qlen):
        return model.apply(p, cfg, img, ques, ques_length=qlen, train=False)[0]

    logits = fwd(params, img, ques, qlen)
    assert logits.shape == (N, A_VOCAB)
    assert jnp.isfinite(logits).all()

    # train forward with dropout rng
    logits_t, aux = model.apply(
        params, cfg, img, ques, ques_length=qlen, train=True,
        rng=jax.random.PRNGKey(1),
    )
    assert logits_t.shape == (N, A_VOCAB)
    assert jnp.isfinite(logits_t).all()

    # gradients flow
    def loss_fn(p):
        lg, _ = model.apply(
            p, cfg, img, ques, ques_length=qlen, train=True,
            rng=jax.random.PRNGKey(2),
        )
        return jnp.mean(lg**2)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(jnp.isfinite(g).all() for g in flat)
    # at least one non-trivial gradient
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_determinism_eval():
    cfg = _tiny_cfg("mhb_coAtt")
    model = get_model("mhb_coAtt")
    params = model.init(jax.random.PRNGKey(0), cfg)
    img, ques, qlen = _batch(np.random.default_rng(3))
    l1, _ = model.apply(params, cfg, img, ques, ques_length=qlen, train=False)
    l2, _ = model.apply(params, cfg, img, ques, ques_length=qlen, train=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_glove_concat_path():
    cfg = _tiny_cfg("mhb_coAtt").replace(glove=True)
    model = get_model("mhb_coAtt")
    params = model.init(jax.random.PRNGKey(0), cfg)
    assert params["glove_table"].shape == (Q_VOCAB, cfg.emb_dim)
    assert params["lstm"]["w_ih"].shape[0] == 2 * cfg.emb_dim
    img, ques, qlen = _batch(np.random.default_rng(4))
    logits, _ = model.apply(params, cfg, img, ques, ques_length=qlen)
    assert logits.shape == (N, A_VOCAB)


def test_batchnorm_valid_mask_ignores_pad_rows():
    # train-mode BN stats over a padded batch (pad rows duplicate the last
    # sample, dataset.py) must equal the unpadded batch's stats
    import jax.numpy as jnp
    import numpy as np

    from vqa_attention_networks_tpu.models import layers as L

    rng = np.random.default_rng(0)
    real = rng.standard_normal((3, 8)).astype(np.float32)
    padded = np.concatenate([real, np.repeat(real[-1:], 5, axis=0)])
    valid = np.asarray([True] * 3 + [False] * 5)

    p = L.batchnorm_init(8)
    y_real, stats_real = L.batchnorm(p, jnp.asarray(real), train=True)
    y_pad, stats_pad = L.batchnorm(
        p, jnp.asarray(padded), train=True, valid=jnp.asarray(valid)
    )
    np.testing.assert_allclose(
        np.asarray(y_pad)[:3], np.asarray(y_real), rtol=1e-5, atol=1e-6
    )
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(stats_pad[k]), np.asarray(stats_real[k]),
            rtol=1e-5, atol=1e-6,
        )
