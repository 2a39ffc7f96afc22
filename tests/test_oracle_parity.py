"""Forward parity of the JAX models against independent NumPy oracles.

The oracles below transcribe the *reference op sequences* (cited per line)
directly in NumPy over the same parameter pytrees — an independent
implementation path (no jax, no shared helper code), per SURVEY.md section 4.
"""

import jax
import numpy as np

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import get_model, mhb_coatt

# Parity runs in float64: signed-sqrt has unbounded derivative at 0, so f32
# noise (XLA's tanh approximation differs from NumPy's by ~1e-5) would
# amplify into percent-level logit differences. f64 isolates semantics.


def _apply_f64(model, params, cfg, img, ques, qlen):
    jax.config.update("jax_enable_x64", True)
    try:
        p64 = jax.tree_util.tree_map(
            lambda x: jax.numpy.asarray(np.asarray(x), jax.numpy.float64), params
        )
        cfg64 = cfg.replace(compute_dtype="float64")
        logits, _ = model.apply(
            p64, cfg64, img.astype(np.float64), ques, ques_length=qlen
        )
        return np.asarray(logits)
    finally:
        jax.config.update("jax_enable_x64", False)

N, T, L, D = 3, 7, 196, 32
Q_VOCAB, A_VOCAB = 25, 11
HID, EMB = 16, 12
K, O = 5, 8  # fusion = 40


def _cfg(name):
    return Config(
        model_name=name, q_vocab_size=Q_VOCAB, a_vocab_size=A_VOCAB,
        hidden_dim=HID, emb_dim=EMB, img_feature_channel=D,
        max_question_length=T, mfb_factor=K, mfb_out=O,
    )


def _np(p):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), p)


# ---------------------------------------------------------------------------
# NumPy oracle pieces
# ---------------------------------------------------------------------------

def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_lstm(p, x):
    """PyTorch-gate-order LSTM over [N, T, in] -> [N, T, H]
    (the recurrence behind mfb.py:27-30 / nn.LSTM)."""
    n, t, _ = x.shape
    h = np.zeros((n, p["w_hh"].shape[0]))
    c = np.zeros_like(h)
    outs = []
    for step in range(t):
        gates = (x[:, step] @ p["w_ih"] + (p["b_ih"] + p["b_hh"])
                 + h @ p["w_hh"])
        i, f, g, o = np.split(gates, 4, axis=-1)
        i, f, o = np_sigmoid(i), np_sigmoid(f), np_sigmoid(o)
        g = np.tanh(g)
        c = f * c + i * g
        h = o * np.tanh(c)
        outs.append(h)
    return np.stack(outs, axis=1)


def np_signed_sqrt(x):
    return np.sqrt(np.maximum(x, 0)) - np.sqrt(np.maximum(-x, 0))


def np_l2(x, axis=-1):
    return x / np.maximum(
        np.sqrt((x**2).sum(axis=axis, keepdims=True)), 1e-12
    )


def np_dense(p, x):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def np_glimpse(att_logits, values, real_softmax):
    """Per-glimpse loop exactly as mfb.py:82-89 / mhb_coAtt.py:84-91."""
    outs = []
    for g in range(att_logits.shape[-1]):
        if real_softmax:
            w = np_softmax(att_logits[:, :, g], axis=1)  # over positions
        else:
            w = np.ones_like(att_logits[:, :, g])  # singleton-softmax quirk
        outs.append((w[:, :, None] * values).sum(axis=1))
    return np.concatenate(outs, axis=-1)


def np_mfb_pool(z, k):
    *lead, d = z.shape
    return z.reshape(*lead, d // k, k).sum(-1)


def oracle_mhb_coatt(p, cfg, img, ques):
    """NumPy transcription of mhb_coAtt.py:61-151 (eval mode, time-major
    LSTM per the documented bugfix)."""
    emb = np.tanh(p["word_embedding"]["table"][ques])
    h = np_lstm(p["lstm"], emb)  # [N, T, H]

    att = np_dense(p["ques_att_conv2"],
                   np.maximum(np_dense(p["ques_att_conv1"], h), 0))
    q_att = np_glimpse(att, h, real_softmax=True)  # [N, 2H]

    q_proj = np_dense(p["ques_proj1"], q_att)
    img_proj = np_dense(p["img_conv1d"], img)
    z = img_proj * q_proj[:, None, :]
    z = np_signed_sqrt(np_mfb_pool(z, cfg.mfb_factor))
    n = img.shape[0]
    z = np_l2(z.reshape(n, -1)).reshape(z.shape)

    co = np_dense(p["co_att_conv2"],
                  np.maximum(np_dense(p["co_att_conv1"], z), 0))
    v_att = np_glimpse(co, img, real_softmax=True)  # [N, 2D]

    outs = []
    for stage in ("2", "3"):
        a = np_dense(p[f"ques_proj{stage}"], q_att)
        b = np_dense(p[f"img_proj{stage}"], v_att)
        f = np_l2(np_signed_sqrt(np_mfb_pool(a * b, cfg.mfb_factor)))
        outs.append(f)
    return np_dense(p["linear_pred"], np.concatenate(outs, axis=-1))


def oracle_mhb(p, cfg, img, ques, qlen):
    """NumPy transcription of mhb_coAtt.py:174-217 (typo at :214 fixed)."""
    n = ques.shape[0]
    img_pooled = img.mean(axis=1)
    emb = p["embedding"]["table"][ques]  # no tanh (mhb_coAtt.py:181)
    h_all = np_lstm(p["lstm"], emb)
    h = h_all[np.arange(n), qlen - 1]

    z1 = np_dense(p["linear_q_1"], h) * np_dense(p["linear_i_1"], img_pooled)
    m1 = np_l2(np_signed_sqrt(np_mfb_pool(z1, cfg.mfb_factor)))
    z2 = np_dense(p["linear_q_2"], h) * np_dense(p["linear_i_2"], img_pooled)
    z2 = z2 * z1  # stage-2 uses stage-1's pre-pool product (mhb_coAtt.py:205)
    m2 = np_l2(np_signed_sqrt(np_mfb_pool(z2, cfg.mfb_factor)))
    return np_dense(p["linear_out"], np.concatenate([m1, m2], axis=-1))


def oracle_mfb(p, cfg, img, ques, multilayer=False):
    """NumPy transcription of mfb.py:61-140 (eval mode). The glimpse
    softmaxes run over a singleton axis (mfb.py:84,118) -> weights all 1."""
    n = ques.shape[0]
    emb = np.tanh(p["word_embedding"]["table"][ques])
    h = np_lstm(p["lstm"], emb)

    a = np.maximum(np_dense(p["ques_att_conv1"], h), 0)
    if multilayer:
        a = np.maximum(np_dense(p["ques_att_multiconv"], a), 0)
    att = np_dense(p["ques_att_conv2"], a)
    q_att = np_glimpse(att, h, real_softmax=False)

    q_proj = np_dense(p["ques_proj1"], q_att)
    img_proj = np_dense(p["img_conv1d"], img)
    z = np_signed_sqrt(np_mfb_pool(img_proj * q_proj[:, None, :], cfg.mfb_factor))
    z = np_l2(z.reshape(n, -1)).reshape(z.shape)

    ca = np.maximum(np_dense(p["co_att_conv1"], z), 0)
    if multilayer:
        ca = np.maximum(np_dense(p["co_att_multiconv"], ca), 0)
    co = np_dense(p["co_att_conv2"], ca)
    v_att = np_glimpse(co, img, real_softmax=False)

    f = np_l2(np_signed_sqrt(np_mfb_pool(
        np_dense(p["ques_proj2"], q_att) * np_dense(p["img_proj2"], v_att),
        cfg.mfb_factor)))
    return np_dense(p["linear_pred"], f)


def np_lstm2_cells(p1, p2, seq):
    """Two stacked LSTMCells exactly as visLstm.py:53-56: layer 1 consumes the
    input token, layer 2 consumes layer-1's hidden state, per step. Returns
    the final layer-2 hidden state."""
    n, t1, _ = seq.shape
    h1 = np.zeros((n, p1["w_hh"].shape[0]))
    c1 = np.zeros_like(h1)
    h2 = np.zeros((n, p2["w_hh"].shape[0]))
    c2 = np.zeros_like(h2)
    for step in range(t1):
        gates = (seq[:, step] @ p1["w_ih"] + (p1["b_ih"] + p1["b_hh"])
                 + h1 @ p1["w_hh"])
        i, f, g, o = np.split(gates, 4, axis=-1)
        c1 = np_sigmoid(f) * c1 + np_sigmoid(i) * np.tanh(g)
        h1 = np_sigmoid(o) * np.tanh(c1)
        gates = (h1 @ p2["w_ih"] + (p2["b_ih"] + p2["b_hh"])
                 + h2 @ p2["w_hh"])
        i, f, g, o = np.split(gates, 4, axis=-1)
        c2 = np_sigmoid(f) * c2 + np_sigmoid(i) * np.tanh(g)
        h2 = np_sigmoid(o) * np.tanh(c2)
    return h2


def oracle_vis_lstm(p, cfg, img, ques, image_first):
    """NumPy transcription of visLstm.py:27-60 (eval mode; image projected to
    emb_dim per the documented intent fix; grid mean-pooled to a vector)."""
    emb_q = p["embedding_ques"]["table"][ques]  # N, T, E (visLstm.py:34)
    emb_i = np.tanh(np_dense(p["embedding_img"], img.mean(axis=1)))  # :35
    if image_first:  # visLstm.py:42-48
        seq = np.concatenate([emb_i[:, None, :], emb_q], axis=1)
    else:
        seq = np.concatenate([emb_q, emb_i[:, None, :]], axis=1)
    h2 = np_lstm2_cells(p["lstm1"], p["lstm2"], seq)  # visLstm.py:50-56
    return np_dense(p["output_layer"], h2)  # visLstm.py:58


def oracle_hiecoatten(p, cfg, img_raw, ques):
    """NumPy transcription of hieCoAtten.py:18-55 (eval mode, with the two
    documented bugfixes: Wbq on the question branch, dim-1 concat)."""
    img = np.maximum(np_dense(p["img_emb"], img_raw), 0)  # :25-26
    que = p["que_emb"]["table"][ques]  # :27
    cv = np_dense(p["fc_Wbv"], img)  # :30
    cq = np_dense(p["fc_Wbq"], que)  # :31 with fc_Wbq (bugfix)
    c = np.tanh(np.einsum("nte,nle->ntl", cq, cv))  # :32
    img_w = np_dense(p["fc_Wv"], img)  # :35
    que_w = np_dense(p["fc_Wq"], que)  # :36
    # Hv = tanh(Wv v + (Wq q)^T C)  (:38)
    hv = np.tanh(img_w + np.einsum("nte,ntl->nle", que_w, c))
    av = np_softmax(np_dense(p["fc_Whv"], hv), axis=1)[..., 0]  # :40
    v = np.einsum("nl,nle->ne", av, img)  # :42
    # Hq = tanh(Wq q + (Wv v)^T C^T)  (:45)
    hq = np.tanh(que_w + np.einsum("nle,ntl->nte", img_w, c))
    aq = np_softmax(np_dense(p["fc_Whq"], hq), axis=1)[..., 0]  # :47
    q = np.einsum("nt,nte->ne", aq, que)  # :49
    x = np.concatenate([v, q], axis=-1)  # dim-1 concat (bugfix of :52)
    return np_dense(p["fc"], x)  # :54


def np_batchnorm_eval(p, x, eps=1e-5):
    return (x - p["mean"]) / np.sqrt(p["var"] + eps) * p["scale"] + p["bias"]


def oracle_ibowimg(p, cfg, img_raw, ques):
    """NumPy transcription of networks.py:7-28 (eval mode; grid mean-pooled)."""
    img = np_batchnorm_eval(p["img_bn"], np_dense(p["img_emb"], img_raw.mean(1)))
    img = np.maximum(img, 0)  # :22 (dropout is eval-off)
    que = p["que_emb"]["table"][ques].sum(axis=1)  # :23-25 bag of words
    return np_dense(p["fc"], np.concatenate([img, que], axis=1))  # :26-27


def np_attention_1(p, f1, f2):
    """Additive attention exactly as modules.py:41-77: materialise the
    [N, T, L, D] broadcast sum and push it through the D->1 linear layer
    (the independent path for the repo's decomposed formulation)."""
    h_temp = f1[:, None, :, :] + f2[:, :, None, :]  # N, T, L, D (:53-60)
    att = (h_temp @ p["fc"]["w"])[..., 0] + p["fc"]["b"]  # N, T, L (:63-64)
    att = np_softmax(att, axis=2)  # :67
    f_hat = np.einsum("ntl,nld->ntd", att, f1)  # :68
    return f_hat, att


def oracle_attention_net(p, cfg, img_raw, ques):
    """NumPy transcription of networks.py:30-69 + modules.py:8-77 (eval mode,
    with the dim-1 concat bugfix of networks.py:64)."""
    n = ques.shape[0]
    img = np.maximum(np_dense(p["img_emb"], img_raw), 0)  # :55-56
    que = p["que_emb"]["table"][ques]  # :57
    que_att = img_att = None
    for i in range(cfg.att_num):  # :59-62
        f1, f2 = (img, que) if i % 2 == 0 else (que, img)
        f1 = np.maximum(f1, 0)  # modules.py:27
        f2 = np.maximum(f2, 0)  # modules.py:28
        f_hat, att = np_attention_1(p[f"att{i}"]["att"], f1, f2)
        f2 = np.maximum(f2 + f_hat, 0)  # modules.py:31
        if i % 2 == 0:
            img, que, que_att = f1, f2, att
        else:
            que, img, img_att = f1, f2, att
    x = np.concatenate(
        [que_att, img_att.transpose(0, 2, 1)], axis=1
    ).reshape(n, -1)  # :64-65 (dim-1 bugfix)
    x = np_dense(p["fc"], x)  # :66
    return np_batchnorm_eval(p["batchnorm"], x)  # :68


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def _inputs(rng):
    img = rng.standard_normal((N, L, D)).astype(np.float32)
    ques = rng.integers(0, Q_VOCAB, size=(N, T)).astype(np.int32)
    qlen = rng.integers(1, T + 1, size=(N,)).astype(np.int32)
    return img, ques, qlen


def test_mhb_coatt_matches_oracle():
    cfg = _cfg("mhb_coAtt")
    model = get_model("mhb_coAtt")
    params = model.init(jax.random.PRNGKey(3), cfg)
    img, ques, qlen = _inputs(np.random.default_rng(3))
    got = _apply_f64(model, params, cfg, img, ques, qlen)
    want = oracle_mhb_coatt(_np(params), cfg, img.astype(np.float64), ques)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_mhb_matches_oracle():
    cfg = _cfg("mhb")
    model = mhb_coatt.MHB
    params = model.init(jax.random.PRNGKey(4), cfg)
    img, ques, qlen = _inputs(np.random.default_rng(4))
    got = _apply_f64(model, params, cfg, img, ques, qlen)
    want = oracle_mhb(_np(params), cfg, img.astype(np.float64), ques, qlen)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_mfb_matches_oracle():
    cfg = _cfg("mfb")
    model = get_model("mfb")
    params = model.init(jax.random.PRNGKey(5), cfg)
    img, ques, qlen = _inputs(np.random.default_rng(5))
    got = _apply_f64(model, params, cfg, img, ques, qlen)
    want = oracle_mfb(_np(params), cfg, img.astype(np.float64), ques)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_mfb_multilayer_matches_oracle():
    cfg = _cfg("mfb-multilayer")
    model = get_model("mfb-multilayer")
    params = model.init(jax.random.PRNGKey(6), cfg)
    img, ques, qlen = _inputs(np.random.default_rng(6))
    got = _apply_f64(model, params, cfg, img, ques, qlen)
    want = oracle_mfb(_np(params), cfg, img.astype(np.float64), ques,
                      multilayer=True)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_vis_lstm_matches_oracle():
    for image_first, seed in ((True, 8), (False, 9)):
        cfg = _cfg("visLstm").replace(image_first=image_first)
        model = get_model("visLstm")
        params = model.init(jax.random.PRNGKey(seed), cfg)
        img, ques, qlen = _inputs(np.random.default_rng(seed))
        got = _apply_f64(model, params, cfg, img, ques, qlen)
        want = oracle_vis_lstm(
            _np(params), cfg, img.astype(np.float64), ques, image_first
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_hiecoatten_matches_oracle():
    cfg = _cfg("hieCoAtten").replace(embed_size=HID)
    model = get_model("hieCoAtten")
    params = model.init(jax.random.PRNGKey(10), cfg)
    img, ques, qlen = _inputs(np.random.default_rng(10))
    got = _apply_f64(model, params, cfg, img, ques, qlen)
    want = oracle_hiecoatten(_np(params), cfg, img.astype(np.float64), ques)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def _randomize_bn_stats(params, name, rng):
    """Replace a batchnorm layer's running stats so the eval normalisation is
    exercised with non-identity statistics."""
    dim = np.asarray(params[name]["mean"]).shape[0]
    params = dict(params)
    params[name] = dict(
        params[name],
        mean=jax.numpy.asarray(rng.standard_normal(dim), jax.numpy.float32),
        var=jax.numpy.asarray(0.3 + rng.random(dim), jax.numpy.float32),
        scale=jax.numpy.asarray(
            0.5 + rng.random(dim), jax.numpy.float32
        ),
        bias=jax.numpy.asarray(rng.standard_normal(dim), jax.numpy.float32),
    )
    return params


def test_ibowimg_matches_oracle():
    cfg = _cfg("iBOWIMG").replace(embed_size=HID)
    model = get_model("iBOWIMG")
    rng = np.random.default_rng(11)
    params = _randomize_bn_stats(
        model.init(jax.random.PRNGKey(11), cfg), "img_bn", rng
    )
    img, ques, qlen = _inputs(rng)
    got = _apply_f64(model, params, cfg, img, ques, qlen)
    want = oracle_ibowimg(_np(params), cfg, img.astype(np.float64), ques)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_attention_net_matches_oracle():
    cfg = _cfg("attentionNet").replace(embed_size=HID, att_num=6)
    model = get_model("attentionNet")
    rng = np.random.default_rng(12)
    params = _randomize_bn_stats(
        model.init(jax.random.PRNGKey(12), cfg), "batchnorm", rng
    )
    img, ques, qlen = _inputs(rng)
    got = _apply_f64(model, params, cfg, img, ques, qlen)
    want = oracle_attention_net(
        _np(params), cfg, img.astype(np.float64), ques
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_mfb_quirk_glimpses_are_uniform_sums():
    """MFB's singleton-axis softmax makes both glimpses the plain sum over
    positions (mfb.py:84-85) — structural check of the quirk."""
    from vqa_attention_networks_tpu.ops.fusion import two_glimpse_pool

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((N, L, 2)).astype(np.float32)
    vals = rng.standard_normal((N, L, 6)).astype(np.float32)
    pooled = np.asarray(two_glimpse_pool(logits, vals, uniform_quirk=True))
    want = vals.astype(np.float64).sum(axis=1)
    # both glimpses collapse to the identical unweighted sum
    np.testing.assert_array_equal(pooled[:, :6], pooled[:, 6:])
    # f32 sum-ordering noise over 196 near-cancelling terms -> loose atol
    np.testing.assert_allclose(pooled[:, :6], want, atol=0.1)


def test_quirk_flag_switches_mfb_softmax_axis():
    """keep_reference_quirks=False gives MFB real per-position softmax
    (different logits than the quirk path, config.py policy)."""
    cfg_q = _cfg("mfb")
    cfg_fixed = cfg_q.replace(keep_reference_quirks=False)
    model = get_model("mfb")
    params = model.init(jax.random.PRNGKey(7), cfg_q)
    img, ques, qlen = _inputs(np.random.default_rng(7))
    l_quirk, _ = model.apply(params, cfg_q, img, ques, ques_length=qlen)
    l_fixed, _ = model.apply(params, cfg_fixed, img, ques, ques_length=qlen)
    assert not np.allclose(np.asarray(l_quirk), np.asarray(l_fixed), atol=1e-4)
