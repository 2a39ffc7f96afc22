"""Training-dynamics parity: the flagship model trained in this framework and
in a torch transcription of the reference must produce the same loss
trajectory from identical weights and batches.

The torch twin below re-expresses the reference op sequence
(mhb_coAtt.py:61-151 with the two documented bugfixes: time-major LSTM scan,
dim-correct concat) plus the reference training rule (KLDivLoss on
log_softmax outputs, solver.py:26-27,91-94; Adam lr=7e-4, solver.py:30)
through torch autograd + torch.optim.Adam — a fully independent
differentiation and optimiser path. Identical initial weights, identical
synthetic batches, dropout disabled; the per-step losses must agree.

This is the strongest accuracy-parity proxy available without the real
dataset (SURVEY.md section 6): if gradients or optimiser dynamics diverged
anywhere, the trajectories would separate within a few steps.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from vqa_attention_networks_tpu.config import Config  # noqa: E402
from vqa_attention_networks_tpu.models import get_model  # noqa: E402
from vqa_attention_networks_tpu.train.losses import soft_cross_entropy  # noqa: E402

N, T, L, D = 8, 7, 196, 16
Q_VOCAB, A_VOCAB = 25, 11
HID, EMB = 16, 8
K, O = 5, 8  # fusion 40
LR = 7e-4  # solver.py:30
STEPS = 12


# ---------------------------------------------------------------------------
# torch twin (independent autograd path over the same parameter tree)
# ---------------------------------------------------------------------------

def _t_lstm(p, x):
    """Time-major LSTM scan, PyTorch gate order i,f,g,o (mhb_coAtt.py:27-31
    with the documented time-scan bugfix)."""
    n, t, _ = x.shape
    hdim = p["w_hh"].shape[0]
    h = torch.zeros(n, hdim, dtype=x.dtype)
    c = torch.zeros_like(h)
    outs = []
    for step in range(t):
        gates = (x[:, step] @ p["w_ih"] + (p["b_ih"] + p["b_hh"])
                 + h @ p["w_hh"])
        i, f, g, o = torch.split(gates, hdim, dim=-1)
        c = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(g)
        h = torch.sigmoid(o) * torch.tanh(c)
        outs.append(h)
    return torch.stack(outs, dim=1)


def _t_dense(p, x):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def _t_ssqrt(x):
    return torch.sqrt(torch.relu(x)) - torch.sqrt(torch.relu(-x))


def _t_l2(x, eps=1e-12):
    norm = torch.sqrt((x * x).sum(dim=-1, keepdim=True))
    return x / torch.clamp(norm, min=eps)


def _t_kpool(z, k):
    *lead, d = z.shape
    return z.reshape(*lead, d // k, k).sum(-1)


def _t_glimpse(att, values):
    """Real per-position softmax glimpses (mhb_coAtt.py:84-91,114-121)."""
    outs = []
    for g in range(att.shape[-1]):
        w = torch.softmax(att[:, :, g], dim=1)
        outs.append((w.unsqueeze(-1) * values).sum(dim=1))
    return torch.cat(outs, dim=-1)


def torch_mhb_coatt(p, img, ques, k):
    """mhb_coAtt.py:61-151 (dropout disabled)."""
    emb = torch.tanh(p["word_embedding"]["table"][ques])  # :70
    h = _t_lstm(p["lstm"], emb)  # :72-74

    att = _t_dense(p["ques_att_conv2"],
                   torch.relu(_t_dense(p["ques_att_conv1"], h)))  # :81-83
    q_att = _t_glimpse(att, h)  # :84-91

    q_proj = _t_dense(p["ques_proj1"], q_att)  # :94
    z = _t_dense(p["img_conv1d"], img) * q_proj.unsqueeze(1)  # :96-99
    z = _t_ssqrt(_t_kpool(z, k))  # :102-106
    n = img.shape[0]
    z = _t_l2(z.reshape(n, -1)).reshape(z.shape)  # :107 (grid-flat L2)

    co = _t_dense(p["co_att_conv2"],
                  torch.relu(_t_dense(p["co_att_conv1"], z)))  # :110-113
    v_att = _t_glimpse(co, img)  # :114-121

    outs = []
    for stage in ("2", "3"):  # :123-148
        a = _t_dense(p[f"ques_proj{stage}"], q_att)
        b = _t_dense(p[f"img_proj{stage}"], v_att)
        outs.append(_t_l2(_t_ssqrt(_t_kpool(a * b, k))))
    return _t_dense(p["linear_pred"], torch.cat(outs, dim=-1))


def _to_torch_tree(params):
    """Same tree, same orientation, as trainable torch doubles."""
    leaves = []

    def conv(x):
        t = torch.tensor(np.asarray(x, np.float64), requires_grad=True)
        leaves.append(t)
        return t

    return jax.tree_util.tree_map(conv, params), leaves


def torch_mhb(p, img, ques, qlen, k):
    """mhb_coAtt.py:174-217 (the plain MHB): mean-pooled grid, last-valid
    LSTM state per sample, two cascaded stages where stage 2 re-multiplies
    stage 1's pre-pool product (:205); typo at :214 fixed to mhb_12."""
    n = ques.shape[0]
    img_pooled = img.mean(dim=1)  # :178-180
    emb = p["embedding"]["table"][ques]  # no tanh (:181)
    h_all = _t_lstm(p["lstm"], emb)
    h = h_all[torch.arange(n), qlen - 1]  # :185-186

    z1 = _t_dense(p["linear_q_1"], h) * _t_dense(p["linear_i_1"], img_pooled)
    m1 = _t_l2(_t_ssqrt(_t_kpool(z1, k)))
    z2 = _t_dense(p["linear_q_2"], h) * _t_dense(p["linear_i_2"], img_pooled)
    z2 = z2 * z1  # :205
    m2 = _t_l2(_t_ssqrt(_t_kpool(z2, k)))
    return _t_dense(p["linear_out"], torch.cat([m1, m2], dim=-1))


def test_mhb_loss_trajectory_matches_torch():
    from vqa_attention_networks_tpu.models.mhb_coatt import MHB

    cfg = Config(
        model_name="mhb", q_vocab_size=Q_VOCAB, a_vocab_size=A_VOCAB,
        hidden_dim=HID, emb_dim=EMB, img_feature_channel=D,
        max_question_length=T, mfb_factor=K, mfb_out=O,
        dropout_lstm=0.0, dropout_fusion=0.0,
    ).validate()
    params = MHB.init(jax.random.PRNGKey(1), cfg)

    rng = np.random.default_rng(1)
    steps = 8
    imgs = rng.standard_normal((steps, N, 196, D))
    quess = rng.integers(0, Q_VOCAB, size=(steps, N, T)).astype(np.int32)
    softs = rng.random((steps, N, A_VOCAB))
    qlen = rng.integers(1, T + 1, size=(N,)).astype(np.int32)

    tp, tleaves = _to_torch_tree(params)
    opt = torch.optim.Adam(tleaves, lr=LR)
    torch_losses = []
    tql = torch.tensor(qlen.astype(np.int64))
    for s in range(steps):
        opt.zero_grad()
        logits = torch_mhb(
            tp, torch.tensor(imgs[s]),
            torch.tensor(quess[s].astype(np.int64)), tql, K,
        )
        loss = torch.nn.functional.kl_div(
            torch.log_softmax(logits, dim=-1),
            torch.tensor(softs[s]), reduction="mean",
        )
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    jax.config.update("jax_enable_x64", True)
    try:
        cfg64 = cfg.replace(compute_dtype="float64")
        p64 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), params
        )
        tx = optax.adam(LR)
        opt_state = tx.init(p64)
        key = jax.random.PRNGKey(2)

        @jax.jit
        def step(p, o, img, ques, soft):
            def loss_fn(p):
                logits, _ = MHB.apply(
                    p, cfg64, img, ques, ques_length=jnp.asarray(qlen),
                    train=True, rng=key,
                )
                return soft_cross_entropy(logits, soft)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        jax_losses = []
        for s in range(steps):
            p64, opt_state, loss = step(
                p64, opt_state, jnp.asarray(imgs[s]), jnp.asarray(quess[s]),
                jnp.asarray(softs[s]),
            )
            jax_losses.append(float(loss))
    finally:
        jax.config.update("jax_enable_x64", False)

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-6)


def test_mhb_coatt_loss_trajectory_matches_torch():
    cfg = Config(
        model_name="mhb_coAtt", q_vocab_size=Q_VOCAB, a_vocab_size=A_VOCAB,
        hidden_dim=HID, emb_dim=EMB, img_feature_channel=D,
        max_question_length=T, mfb_factor=K, mfb_out=O,
        dropout_lstm=0.0, dropout_fusion=0.0,
    ).validate()
    model = get_model("mhb_coAtt")
    params = model.init(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((STEPS, N, L, D))
    quess = rng.integers(0, Q_VOCAB, size=(STEPS, N, T)).astype(np.int32)
    softs = rng.random((STEPS, N, A_VOCAB))  # unnormalised, like the
    # reference's annotator-fraction vectors (data_loader.py:39-42)
    qlen = np.full((N,), T, np.int32)

    # ---- torch side -------------------------------------------------------
    tp, tleaves = _to_torch_tree(params)
    opt = torch.optim.Adam(tleaves, lr=LR)  # solver.py:30
    torch_losses = []
    for s in range(STEPS):
        opt.zero_grad()
        logits = torch_mhb_coatt(
            tp, torch.tensor(imgs[s]), torch.tensor(quess[s].astype(np.int64)),
            K,
        )
        # criterion(log_softmax(out), soft) with reduction='mean'
        # (solver.py:27 + mhb_coAtt.py:149)
        loss = torch.nn.functional.kl_div(
            torch.log_softmax(logits, dim=-1),
            torch.tensor(softs[s]), reduction="mean",
        )
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # ---- this framework (f64 to isolate semantics from summation order) ---
    jax.config.update("jax_enable_x64", True)
    try:
        cfg64 = cfg.replace(compute_dtype="float64")
        p64 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), params
        )
        tx = optax.adam(LR)
        opt_state = tx.init(p64)
        key = jax.random.PRNGKey(1)  # dropout rates are 0: key is inert

        @jax.jit
        def step(p, o, img, ques, soft):
            def loss_fn(p):
                logits, _ = model.apply(
                    p, cfg64, img, ques, ques_length=qlen, train=True, rng=key
                )
                return soft_cross_entropy(logits, soft)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        jax_losses = []
        for s in range(STEPS):
            p64, opt_state, loss = step(
                p64, opt_state, jnp.asarray(imgs[s]), jnp.asarray(quess[s]),
                jnp.asarray(softs[s]),
            )
            jax_losses.append(float(loss))
    finally:
        jax.config.update("jax_enable_x64", False)

    # identical weights + batches + lr: early steps pin the math exactly;
    # the tail tolerance covers Lyapunov amplification of f64 rounding
    # through Adam (measured: ~1e-8 through step 7, growing ~5x/step
    # after — not a semantic difference)
    np.testing.assert_allclose(jax_losses[:8], torch_losses[:8], rtol=1e-6)
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=3e-5)
    # and training must actually be moving
    assert jax_losses[-1] != jax_losses[0]


def torch_mfb(p, img, ques, k):
    """mfb.py:61-140 under the reference quirk (softmax over a singleton
    axis, mfb.py:84,118): every attention weight is exactly 1.0, so each
    glimpse is an unweighted position sum, the two glimpses of a pool are
    identical, and — because the stage-1 fused grid only feeds the co-att
    convs whose outputs are gradient-dead constants — the ENTIRE stage-1
    fusion receives zero gradient. The twin therefore computes only the
    live path; the frameworks must agree that the rest contributes nothing
    (any spurious gradient in either would split the trajectories)."""
    emb = torch.tanh(p["word_embedding"]["table"][ques])
    h = _t_lstm(p["lstm"], emb)
    g = h.sum(dim=1)
    q_att = torch.cat([g, g], dim=-1)  # [N, 2H]

    gi = img.sum(dim=1)
    v_att = torch.cat([gi, gi], dim=-1)  # [N, 2D]

    a = _t_dense(p["ques_proj2"], q_att)
    b = _t_dense(p["img_proj2"], v_att)
    final = _t_l2(_t_ssqrt(_t_kpool(a * b, k)))
    return _t_dense(p["linear_pred"], final)


def test_mfb_loss_trajectory_matches_torch():
    from vqa_attention_networks_tpu.train.losses import cross_entropy

    cfg = Config(
        model_name="mfb", q_vocab_size=Q_VOCAB, a_vocab_size=A_VOCAB,
        hidden_dim=HID, emb_dim=EMB, img_feature_channel=D,
        max_question_length=T, mfb_factor=K, mfb_out=O,
        dropout_lstm=0.0, dropout_fusion=0.0,
    ).validate()
    assert not cfg.soft_answer  # mfb trains with CE (solver.py:29)
    model = get_model("mfb")
    params = model.init(jax.random.PRNGKey(3), cfg)

    rng = np.random.default_rng(3)
    steps = 8
    imgs = rng.standard_normal((steps, N, L, D))
    quess = rng.integers(0, Q_VOCAB, size=(steps, N, T)).astype(np.int32)
    labels = rng.integers(0, A_VOCAB, size=(steps, N)).astype(np.int32)

    tp, tleaves = _to_torch_tree(params)
    opt = torch.optim.Adam(tleaves, lr=LR)
    torch_losses = []
    for s in range(steps):
        opt.zero_grad()
        logits = torch_mfb(
            tp, torch.tensor(imgs[s]),
            torch.tensor(quess[s].astype(np.int64)), K,
        )
        loss = torch.nn.functional.cross_entropy(
            logits, torch.tensor(labels[s].astype(np.int64))
        )
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    jax.config.update("jax_enable_x64", True)
    try:
        cfg64 = cfg.replace(compute_dtype="float64")
        p64 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), params
        )
        tx = optax.adam(LR)
        opt_state = tx.init(p64)
        key = jax.random.PRNGKey(4)

        @jax.jit
        def step(p, o, img, ques, lab):
            def loss_fn(p):
                logits, _ = model.apply(
                    p, cfg64, img, ques, train=True, rng=key
                )
                return cross_entropy(logits, lab)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        jax_losses = []
        for s in range(steps):
            p64, opt_state, loss = step(
                p64, opt_state, jnp.asarray(imgs[s]), jnp.asarray(quess[s]),
                jnp.asarray(labels[s]),
            )
            jax_losses.append(float(loss))
    finally:
        jax.config.update("jax_enable_x64", False)

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-6)


def test_ibowimg_loss_trajectory_matches_torch():
    """iBOWIMG pins the BATCH-NORM training dynamics against torch's
    functional batch_norm: biased variance for normalisation, unbiased for
    the running stats, momentum 0.1 — and the running stats folded back
    into the params every step exactly as the solver does."""
    from vqa_attention_networks_tpu.train.losses import cross_entropy
    from vqa_attention_networks_tpu.train.solver import _merge_batch_stats

    E = 16
    cfg = Config(
        model_name="iBOWIMG", q_vocab_size=Q_VOCAB, a_vocab_size=A_VOCAB,
        embed_size=E, img_feature_channel=D, max_question_length=T,
        dropout_default=0.0,
    ).validate()
    model = get_model("iBOWIMG")
    params = model.init(jax.random.PRNGKey(5), cfg)

    rng = np.random.default_rng(5)
    steps = 8
    imgs = rng.standard_normal((steps, N, L, D))
    quess = rng.integers(0, Q_VOCAB, size=(steps, N, T)).astype(np.int32)
    labels = rng.integers(0, A_VOCAB, size=(steps, N)).astype(np.int32)

    # ---- torch twin ------------------------------------------------------
    def t(x, trainable=True):
        return torch.tensor(np.asarray(x, np.float64),
                            requires_grad=trainable)

    tp = {
        "img_emb": {k: t(v) for k, v in params["img_emb"].items()},
        "que_emb": {"table": t(params["que_emb"]["table"])},
        "fc": {k: t(v) for k, v in params["fc"].items()},
        "img_bn": {
            "scale": t(params["img_bn"]["scale"]),
            "bias": t(params["img_bn"]["bias"]),
            # running stats are buffers (F.batch_norm updates them
            # in-place, which requires_grad tensors forbid)
            "mean": t(params["img_bn"]["mean"], trainable=False),
            "var": t(params["img_bn"]["var"], trainable=False),
        },
    }
    leaves = [tp["img_emb"]["w"], tp["img_emb"]["b"],
              tp["que_emb"]["table"], tp["fc"]["w"], tp["fc"]["b"],
              tp["img_bn"]["scale"], tp["img_bn"]["bias"]]
    opt = torch.optim.Adam(leaves, lr=LR)
    torch_losses = []
    for s in range(steps):
        opt.zero_grad()
        imgv = torch.tensor(imgs[s]).mean(dim=1)
        x = _t_dense(tp["img_emb"], imgv)
        x = torch.nn.functional.batch_norm(
            x, tp["img_bn"]["mean"], tp["img_bn"]["var"],
            tp["img_bn"]["scale"], tp["img_bn"]["bias"],
            training=True, momentum=0.1, eps=1e-5,
        )
        x = torch.relu(x)
        que = tp["que_emb"]["table"][
            torch.tensor(quess[s].astype(np.int64))
        ].sum(dim=1)
        logits = _t_dense(tp["fc"], torch.cat([x, que], dim=-1))
        loss = torch.nn.functional.cross_entropy(
            logits, torch.tensor(labels[s].astype(np.int64))
        )
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # ---- jax side --------------------------------------------------------
    jax.config.update("jax_enable_x64", True)
    try:
        cfg64 = cfg.replace(compute_dtype="float64")
        p64 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), params
        )
        tx = optax.adam(LR)
        opt_state = tx.init(p64)
        key = jax.random.PRNGKey(6)

        @jax.jit
        def step(p, o, img, ques, lab):
            def loss_fn(p):
                logits, aux = model.apply(
                    p, cfg64, img, ques, train=True, rng=key
                )
                return cross_entropy(logits, lab), aux

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(p)
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return _merge_batch_stats(p, aux), o, loss

        jax_losses = []
        for s in range(steps):
            p64, opt_state, loss = step(
                p64, opt_state, jnp.asarray(imgs[s]), jnp.asarray(quess[s]),
                jnp.asarray(labels[s]),
            )
            jax_losses.append(float(loss))

        np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-6)
        # the running stats themselves must track torch's
        np.testing.assert_allclose(
            np.asarray(p64["img_bn"]["mean"]),
            tp["img_bn"]["mean"].detach().numpy(), rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(p64["img_bn"]["var"]),
            tp["img_bn"]["var"].detach().numpy(), rtol=1e-6,
        )
    finally:
        jax.config.update("jax_enable_x64", False)


def torch_hiecoatten(p, img_f, ques):
    """hieCoAtten.py:18-55 with the two documented bugfixes (fc_Wbq on the
    question branch, dim-1 concat); dropout disabled."""
    img = torch.relu(_t_dense(p["img_emb"], img_f))  # [N, 196, E]
    que = p["que_emb"]["table"][ques]  # [N, T, E]

    cv = _t_dense(p["fc_Wbv"], img)
    cq = _t_dense(p["fc_Wbq"], que)
    c = torch.tanh(torch.einsum("nte,nle->ntl", cq, cv))

    img_w = _t_dense(p["fc_Wv"], img)
    que_w = _t_dense(p["fc_Wq"], que)

    hv = torch.tanh(img_w + torch.einsum("nte,ntl->nle", que_w, c))
    av = torch.softmax(_t_dense(p["fc_Whv"], hv), dim=1)  # [N, 196, 1]
    v = torch.einsum("nl,nle->ne", av[..., 0], img)

    hq = torch.tanh(que_w + torch.einsum("nle,ntl->nte", img_w, c))
    aq = torch.softmax(_t_dense(p["fc_Whq"], hq), dim=1)  # [N, T, 1]
    q = torch.einsum("nt,nte->ne", aq[..., 0], que)

    return _t_dense(p["fc"], torch.cat([v, q], dim=-1))


def torch_vis_lstm(p, img_f, ques, image_first):
    """visLstm.py:30-60: image embedding as first (or last) token of a
    2-layer LSTM over the question; final layer-2 state -> logits."""
    emb_q = p["embedding_ques"]["table"][ques]
    emb_i = torch.tanh(_t_dense(p["embedding_img"], img_f.mean(dim=1)))
    if image_first:
        seq = torch.cat([emb_i.unsqueeze(1), emb_q], dim=1)
    else:
        seq = torch.cat([emb_q, emb_i.unsqueeze(1)], dim=1)
    h1 = _t_lstm(p["lstm1"], seq)
    h2 = _t_lstm(p["lstm2"], h1)
    return _t_dense(p["output_layer"], h2[:, -1])


def _dynamics_harness(model_name, torch_fwd, seed, **cfg_kw):
    """Shared CE-loss trajectory comparison (the soft-answer models have
    their own tests above)."""
    from vqa_attention_networks_tpu.train.losses import cross_entropy

    cfg = Config(
        model_name=model_name, q_vocab_size=Q_VOCAB, a_vocab_size=A_VOCAB,
        hidden_dim=HID, emb_dim=EMB, img_feature_channel=D,
        max_question_length=T, mfb_factor=K, mfb_out=O,
        dropout_lstm=0.0, dropout_fusion=0.0, dropout_default=0.0,
        **cfg_kw,
    ).validate()
    model = get_model(model_name)
    params = model.init(jax.random.PRNGKey(seed), cfg)

    rng = np.random.default_rng(seed)
    steps = 8
    imgs = rng.standard_normal((steps, N, L, D))
    quess = rng.integers(0, Q_VOCAB, size=(steps, N, T)).astype(np.int32)
    labels = rng.integers(0, A_VOCAB, size=(steps, N)).astype(np.int32)

    tp, tleaves = _to_torch_tree(params)
    opt = torch.optim.Adam(tleaves, lr=LR)
    torch_losses = []
    for s in range(steps):
        opt.zero_grad()
        logits = torch_fwd(
            tp, torch.tensor(imgs[s]), torch.tensor(quess[s].astype(np.int64))
        )
        loss = torch.nn.functional.cross_entropy(
            logits, torch.tensor(labels[s].astype(np.int64))
        )
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    jax.config.update("jax_enable_x64", True)
    try:
        cfg64 = cfg.replace(compute_dtype="float64")
        p64 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), params
        )
        tx = optax.adam(LR)
        opt_state = tx.init(p64)
        key = jax.random.PRNGKey(seed + 100)

        @jax.jit
        def step(p, o, img, ques, lab):
            def loss_fn(p):
                logits, _ = model.apply(
                    p, cfg64, img, ques, train=True, rng=key
                )
                return cross_entropy(logits, lab)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        jax_losses = []
        for s in range(steps):
            p64, opt_state, loss = step(
                p64, opt_state, jnp.asarray(imgs[s]), jnp.asarray(quess[s]),
                jnp.asarray(labels[s]),
            )
            jax_losses.append(float(loss))
    finally:
        jax.config.update("jax_enable_x64", False)

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-6)


def test_hiecoatten_loss_trajectory_matches_torch():
    _dynamics_harness("hieCoAtten", torch_hiecoatten, seed=7, embed_size=16)


def test_vis_lstm_loss_trajectory_matches_torch():
    _dynamics_harness(
        "visLstm",
        lambda p, img, ques: torch_vis_lstm(p, img, ques, image_first=True),
        seed=8, image_first=True,
    )


def test_attentionnet_loss_trajectory_matches_torch():
    """attentionNet: 6 alternating additive-attention layers + final BN.
    The torch twin materialises the decomposed score as the reference's
    single D->1 linear over the broadcast sum, plus torch BN as in the
    iBOWIMG test."""
    from vqa_attention_networks_tpu.train.losses import cross_entropy
    from vqa_attention_networks_tpu.train.solver import _merge_batch_stats

    E = 16
    cfg = Config(
        model_name="attentionNet", q_vocab_size=Q_VOCAB,
        a_vocab_size=A_VOCAB, embed_size=E, img_feature_channel=D,
        max_question_length=T, att_num=4, dropout_default=0.0,
    ).validate()
    model = get_model("attentionNet")
    params = model.init(jax.random.PRNGKey(9), cfg)

    def t_att1(p, f1, f2):
        s1 = (f1 @ p["fc"]["w"] + p["fc"]["b"])[..., 0]  # [N, L]
        s2 = (f2 @ p["fc"]["w"])[..., 0]  # [N, T] (bias counted once)
        att = torch.softmax(s2.unsqueeze(2) + s1.unsqueeze(1), dim=2)
        return torch.einsum("ntl,nld->ntd", att, f1), att

    def t_layer(p, f1, f2):
        f1 = torch.relu(f1)
        f2 = torch.relu(f2)
        f_hat, att = t_att1(p["att"], f1, f2)
        return f1, torch.relu(f2 + f_hat), att

    rng = np.random.default_rng(9)
    steps = 8
    imgs = rng.standard_normal((steps, N, L, D))
    quess = rng.integers(0, Q_VOCAB, size=(steps, N, T)).astype(np.int32)
    labels = rng.integers(0, A_VOCAB, size=(steps, N)).astype(np.int32)

    def t(x, trainable=True):
        return torch.tensor(np.asarray(x, np.float64),
                            requires_grad=trainable)

    tp = {}
    leaves = []
    for name in ("img_emb", "que_emb", "fc"):
        tp[name] = {k: t(v) for k, v in params[name].items()}
        leaves += list(tp[name].values())
    for i in range(cfg.att_num):
        tp[f"att{i}"] = {"att": {"fc": {
            k: t(v) for k, v in params[f"att{i}"]["att"]["fc"].items()
        }}}
        leaves += list(tp[f"att{i}"]["att"]["fc"].values())
    tp["batchnorm"] = {
        "scale": t(params["batchnorm"]["scale"]),
        "bias": t(params["batchnorm"]["bias"]),
        "mean": t(params["batchnorm"]["mean"], trainable=False),
        "var": t(params["batchnorm"]["var"], trainable=False),
    }
    leaves += [tp["batchnorm"]["scale"], tp["batchnorm"]["bias"]]

    opt = torch.optim.Adam(leaves, lr=LR)
    torch_losses = []
    for s in range(steps):
        opt.zero_grad()
        img = torch.relu(_t_dense(tp["img_emb"], torch.tensor(imgs[s])))
        que = tp["que_emb"]["table"][torch.tensor(quess[s].astype(np.int64))]
        que_att = img_att = None
        for i in range(cfg.att_num):
            if i % 2 == 0:
                img, que, que_att = t_layer(tp[f"att{i}"], img, que)
            else:
                que, img, img_att = t_layer(tp[f"att{i}"], que, img)
        x = torch.cat(
            [que_att, img_att.transpose(1, 2)], dim=1
        ).reshape(N, -1)
        x = _t_dense(tp["fc"], x)
        x = torch.nn.functional.batch_norm(
            x, tp["batchnorm"]["mean"], tp["batchnorm"]["var"],
            tp["batchnorm"]["scale"], tp["batchnorm"]["bias"],
            training=True, momentum=0.1, eps=1e-5,
        )
        loss = torch.nn.functional.cross_entropy(
            x, torch.tensor(labels[s].astype(np.int64))
        )
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    jax.config.update("jax_enable_x64", True)
    try:
        cfg64 = cfg.replace(compute_dtype="float64")
        p64 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), params
        )
        tx = optax.adam(LR)
        opt_state = tx.init(p64)
        key = jax.random.PRNGKey(109)

        @jax.jit
        def step(p, o, img, ques, lab):
            def loss_fn(p):
                logits, aux = model.apply(
                    p, cfg64, img, ques, train=True, rng=key
                )
                return cross_entropy(logits, lab), aux

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(p)
            updates, o = tx.update(grads, o, p)
            return _merge_batch_stats(optax.apply_updates(p, updates), aux), o, loss

        jax_losses = []
        for s in range(steps):
            p64, opt_state, loss = step(
                p64, opt_state, jnp.asarray(imgs[s]), jnp.asarray(quess[s]),
                jnp.asarray(labels[s]),
            )
            jax_losses.append(float(loss))
    finally:
        jax.config.update("jax_enable_x64", False)

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-6)
