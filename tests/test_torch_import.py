"""Reference-checkpoint importer parity.

For every model family: build a REAL torch ``nn.Module`` whose attribute
names match the reference's ``__init__`` exactly (so ``state_dict()`` has
the reference on-disk layout, solver.py:190), let torch initialise it
(default init — non-zero biases, randomized BN running stats), import the
state_dict with ``import_state_dict``, and require forward parity between
torch's own layer implementations (``nn.LSTM``/``nn.Conv2d``/``F.linear``
— an independent compute path that would expose any transpose, gate-order
or field-mapping error) and this framework's ``apply`` at f64.

Also: export->import round trips bit-exactly, and mismatched checkpoints
fail loudly instead of silently mis-mapping.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vqa_attention_networks_tpu.config import Config  # noqa: E402
from vqa_attention_networks_tpu.models import get_model  # noqa: E402
from vqa_attention_networks_tpu.utils.torch_import import (  # noqa: E402
    clean_state_dict,
    export_state_dict,
    import_state_dict,
)

N, T, L, D = 3, 7, 196, 32
Q_VOCAB, A_VOCAB = 25, 11
HID, EMB = 16, 12
K, O = 5, 8  # fusion = 40
E = 16  # embed_size for the iBOWIMG/attentionNet/hieCoAtten families


def _cfg(name, **kw):
    return Config(
        model_name=name, q_vocab_size=Q_VOCAB, a_vocab_size=A_VOCAB,
        hidden_dim=HID, emb_dim=EMB, img_feature_channel=D,
        max_question_length=T, mfb_factor=K, mfb_out=O,
        dropout_lstm=0.0, dropout_fusion=0.0, dropout_default=0.0, **kw,
    ).validate()


def _inputs(seed):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((N, L, D))
    ques = rng.integers(1, Q_VOCAB, size=(N, T)).astype(np.int32)
    qlen = rng.integers(1, T + 1, size=(N,)).astype(np.int32)
    return img, ques, qlen


def _fw_logits(model, cfg, params, img, ques, qlen):
    """Framework forward at f64 (matches the oracle-parity methodology)."""
    jax.config.update("jax_enable_x64", True)
    try:
        p64 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), params
        )
        logits, _ = model.apply(
            p64, cfg.replace(compute_dtype="float64"),
            img.astype(np.float64), ques, ques_length=qlen,
        )
        return np.asarray(logits)
    finally:
        jax.config.update("jax_enable_x64", False)


def _check_family(name, tmodule, tforward, img, ques, qlen, cfg=None,
                  rtol=2e-6):
    # rtol covers the importer's f32 parameter storage vs the torch twin's
    # f64 weights; the math itself matches far tighter
    cfg = cfg or _cfg(name)
    model = get_model(name)
    tmodule = tmodule.double().eval()
    sd = {k: v.detach().numpy() for k, v in tmodule.state_dict().items()}

    template = model.init(jax.random.PRNGKey(0), cfg)
    params = import_state_dict(name, sd, template)

    with torch.no_grad():
        want = tforward(
            tmodule, torch.tensor(img), torch.tensor(ques.astype(np.int64)),
            torch.tensor(qlen.astype(np.int64)),
        ).numpy()
    got = _fw_logits(model, cfg, params, img, ques, qlen)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=1e-10)

    # export -> import round trip is exact
    back = import_state_dict(name, export_state_dict(name, params), template)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, back,
    )


# ---------------------------------------------------------------------------
# torch twins: reference attribute names, documented-bugfix forward semantics
# ---------------------------------------------------------------------------

def _t_glimpse(att, values, dim):
    """2-glimpse softmax pooling; ``dim`` distinguishes MFB's singleton-axis
    quirk (mfb.py:84) from MHBCoAtt's real position softmax (mhb_coAtt.py:86)."""
    feats = []
    for i in range(2):
        w = F.softmax(att[:, :, i:i + 1], dim=1 if dim == "position" else 2)
        feats.append((w * values).sum(dim=1))
    return torch.cat(feats, dim=-1)


def _t_mfb_tail(z, k):
    z = z.view(z.shape[0], -1, k).sum(-1)
    z = torch.sqrt(F.relu(z)) - torch.sqrt(F.relu(-z))
    return F.normalize(z)


class _TMHBCoAtt(nn.Module):
    """mhb_coAtt.py:22-59 layer graph (glove optional)."""

    def __init__(self, glove=False):
        super().__init__()
        self.word_embedding = nn.Embedding(Q_VOCAB, EMB)
        self.lstm = nn.LSTM(EMB * (2 if glove else 1), HID, num_layers=1,
                            batch_first=True)
        self.ques_att_conv1 = nn.Conv2d(HID, 512, [1, 1])
        self.ques_att_conv2 = nn.Conv2d(512, 2, [1, 1])
        self.ques_proj1 = nn.Linear(2 * HID, K * O)
        self.img_conv1d = nn.Conv2d(D, K * O, [1, 1])
        self.co_att_conv1 = nn.Conv2d(O, 512, [1, 1])
        self.co_att_conv2 = nn.Conv2d(512, 2, [1, 1])
        self.ques_proj2 = nn.Linear(2 * HID, K * O)
        self.ques_proj3 = nn.Linear(2 * HID, K * O)
        self.img_proj2 = nn.Linear(2 * D, K * O)
        self.img_proj3 = nn.Linear(2 * D, K * O)
        self.linear_pred = nn.Linear(2 * O, A_VOCAB)
        self._glove = glove
        if glove:
            # the frozen device-side table (framework deviation; the torch
            # side receives the same rows as an input matrix)
            self.register_buffer(
                "_glove_table",
                torch.tensor(np.random.default_rng(77).standard_normal(
                    (Q_VOCAB, EMB))),
                persistent=False,
            )

    def _conv_seq(self, x, conv1, conv2):
        # [N, T, C] -> conv-as-matmul via the 1x1 kernels
        h = x.permute(0, 2, 1).unsqueeze(3)  # N, C, T, 1
        h = conv2(F.relu(conv1(h)))  # N, 2, T, 1
        return h[:, :, :, 0].permute(0, 2, 1)  # N, T, 2

    def forward(self, img, ques, qlen):
        emb = torch.tanh(self.word_embedding(ques))
        if self._glove:
            emb = torch.cat([emb, self._glove_table[ques]], dim=-1)
        h, _ = self.lstm(emb)  # time-major scan (documented bugfix)

        q_att = _t_glimpse(self._conv_seq(h, self.ques_att_conv1,
                                          self.ques_att_conv2), h, "position")

        q_proj = self.ques_proj1(q_att)  # [N, KO]
        imgp = img.permute(0, 2, 1).unsqueeze(3)  # N, D, L, 1
        z = self.img_conv1d(imgp)[:, :, :, 0].permute(0, 2, 1)  # N, L, KO
        z = z * q_proj.unsqueeze(1)
        z = z.view(N, L, O, K).sum(-1)  # N, L, O
        z = torch.sqrt(F.relu(z)) - torch.sqrt(F.relu(-z))
        z = F.normalize(z.reshape(N, -1)).view(N, L, O)  # grid-flat L2

        v_att = _t_glimpse(self._conv_seq(z, self.co_att_conv1,
                                          self.co_att_conv2), img, "position")

        outs = []
        for qp, ip in ((self.ques_proj2, self.img_proj2),
                       (self.ques_proj3, self.img_proj3)):
            outs.append(_t_mfb_tail(qp(q_att) * ip(v_att), K))
        return self.linear_pred(torch.cat(outs, dim=-1))


class _TMHB(nn.Module):
    """mhb_coAtt.py:155-172 (capitalised attribute names; typo at :214
    fixed to mhb_12)."""

    def __init__(self):
        super().__init__()
        self.Embedding = nn.Embedding(Q_VOCAB, EMB)
        self.LSTM = nn.LSTM(EMB, HID, num_layers=1, batch_first=False)
        self.linear_q_1 = nn.Linear(HID, K * O)
        self.linear_q_2 = nn.Linear(HID, K * O)
        self.linear_i_1 = nn.Linear(D, K * O)
        self.linear_i_2 = nn.Linear(D, K * O)
        self.linear_out = nn.Linear(2 * O, A_VOCAB)

    def forward(self, img, ques, qlen):
        pooled = img.mean(dim=1)
        emb = self.Embedding(ques).permute(1, 0, 2)  # T, N, E
        outs, _ = self.LSTM(emb)  # T, N, H
        h = outs[qlen - 1, torch.arange(N)]  # last valid step per sample

        z1 = self.linear_q_1(h) * self.linear_i_1(pooled)
        m1 = _t_mfb_tail(z1, K)
        z2 = self.linear_q_2(h) * self.linear_i_2(pooled) * z1
        m2 = _t_mfb_tail(z2, K)
        return self.linear_out(torch.cat([m1, m2], dim=-1))


class _TMFB(nn.Module):
    """mfb.py:22-59 (+multilayer variant); quirk softmax over the singleton
    axis (mfb.py:84,118) -> every glimpse weight is exactly 1."""

    def __init__(self, multilayer):
        super().__init__()
        self.word_embedding = nn.Embedding(Q_VOCAB, EMB)
        self.lstm = nn.LSTM(EMB, HID, num_layers=1, batch_first=True)
        self.ques_att_conv1 = nn.Conv2d(HID, 1024, [1, 1])
        self.co_att_conv1 = nn.Conv2d(O, 1024, [1, 1])
        if multilayer:
            self.ques_att_multiconv = nn.Conv2d(1024, 512, [1, 1])
            self.co_att_multiconv = nn.Conv2d(1024, 512, [1, 1])
            self.ques_att_conv2 = nn.Conv2d(512, 2, [1, 1])
            self.co_att_conv2 = nn.Conv2d(512, 2, [1, 1])
        else:
            self.ques_att_conv2 = nn.Conv2d(1024, 2, [1, 1])
            self.co_att_conv2 = nn.Conv2d(1024, 2, [1, 1])
        self.ques_proj1 = nn.Linear(2 * HID, K * O)
        self.img_conv1d = nn.Conv2d(D, K * O, [1, 1])
        self.ques_proj2 = nn.Linear(2 * HID, K * O)
        self.img_proj2 = nn.Linear(2 * D, K * O)
        self.linear_pred = nn.Linear(O, A_VOCAB)

    def forward(self, img, ques, qlen):
        emb = torch.tanh(self.word_embedding(ques))
        h, _ = self.lstm(emb)
        # quirk glimpses: unweighted position sums, both glimpses identical
        g = h.sum(dim=1)
        q_att = torch.cat([g, g], dim=-1)
        gi = img.sum(dim=1)
        v_att = torch.cat([gi, gi], dim=-1)
        z = self.ques_proj2(q_att) * self.img_proj2(v_att)
        return self.linear_pred(_t_mfb_tail(z, K))


class _THieCoAtten(nn.Module):
    """hieCoAtten.py:7-16 with the two documented bugfixes (fc_Wbq on the
    question branch, dim-1 concat)."""

    def __init__(self):
        super().__init__()
        self.img_emb = nn.Linear(D, E, bias=True)
        self.que_emb = nn.Embedding(Q_VOCAB, E)
        self.fc_Wbv = nn.Linear(E, E)
        self.fc_Wbq = nn.Linear(E, E)
        self.fc_Wv = nn.Linear(E, E)
        self.fc_Wq = nn.Linear(E, E)
        self.fc_Whv = nn.Linear(E, 1)
        self.fc_Whq = nn.Linear(E, 1)
        self.fc = nn.Linear(2 * E, A_VOCAB)

    def forward(self, img_f, ques, qlen):
        img = F.relu(self.img_emb(img_f))
        que = self.que_emb(ques)
        c = torch.tanh(
            torch.matmul(self.fc_Wbq(que), self.fc_Wbv(img).transpose(1, 2))
        )  # N, T, L
        img_w = self.fc_Wv(img)
        que_w = self.fc_Wq(que)
        hv = torch.tanh(
            img_w + torch.matmul(que_w.transpose(1, 2), c).transpose(1, 2)
        )
        av = F.softmax(self.fc_Whv(hv), dim=1)
        v = torch.bmm(av.permute(0, 2, 1), img)[:, 0]
        hq = torch.tanh(
            que_w
            + torch.matmul(img_w.transpose(1, 2), c.transpose(1, 2)).transpose(1, 2)
        )
        aq = F.softmax(self.fc_Whq(hq), dim=1)
        q = torch.bmm(aq.permute(0, 2, 1), que)[:, 0]
        return self.fc(torch.cat([v, q], dim=-1))


class _TVisLSTM(nn.Module):
    """visLstm.py:8-21; image embedding as first token (image_first=True)."""

    def __init__(self):
        super().__init__()
        self.embedding_ques = nn.Embedding(Q_VOCAB, EMB)
        self.embedding_img = nn.Linear(D, EMB)
        self.lstm1 = nn.LSTMCell(EMB, HID)
        self.lstm2 = nn.LSTMCell(HID, HID)
        self.output_layer = nn.Linear(HID, A_VOCAB)

    def forward(self, img_f, ques, qlen):
        emb_q = self.embedding_ques(ques)  # N, T, E
        emb_i = torch.tanh(self.embedding_img(img_f.mean(dim=1)))
        seq = torch.cat([emb_i.unsqueeze(1), emb_q], dim=1)
        h1 = c1 = h2 = c2 = torch.zeros(N, HID, dtype=seq.dtype)
        for t in range(seq.shape[1]):
            h1, c1 = self.lstm1(seq[:, t], (h1, c1))
            h2, c2 = self.lstm2(h1, (h2, c2))
        return self.output_layer(h2)


class _TIBowImg(nn.Module):
    """networks.py:8-13; grid mean-pooled to the fc7-style vector."""

    def __init__(self):
        super().__init__()
        self.img_emb = nn.Linear(D, E, bias=True)
        self.img_bn = nn.BatchNorm1d(E)
        self.que_emb = nn.Embedding(Q_VOCAB, E)
        self.fc = nn.Linear(2 * E, A_VOCAB)

    def forward(self, img_f, ques, qlen):
        img = F.relu(self.img_bn(self.img_emb(img_f.mean(dim=1))))
        que = self.que_emb(ques).sum(dim=1)
        return self.fc(torch.cat([img, que], dim=1))


ATT_NUM = 4


class _TAttentionNet(nn.Module):
    """networks.py:31-45; att modules hold their Attention_1 as
    ``att_layer`` (modules.py:16) whose parameters are one D->1 linear."""

    def __init__(self):
        super().__init__()
        self.img_emb = nn.Linear(D, E, bias=True)
        self.que_emb = nn.Embedding(Q_VOCAB, E)
        for i in range(ATT_NUM):
            m = nn.Module()
            m.att_layer = nn.Module()
            m.att_layer.fc = nn.Linear(E, 1)
            self.add_module(f"att{i}", m)
        self.fc = nn.Linear(2 * L * T, A_VOCAB)
        self.batchnorm = nn.BatchNorm1d(A_VOCAB)

    @staticmethod
    def _att1(fc, f1, f2):
        score = fc(f2.unsqueeze(2) + f1.unsqueeze(1))[..., 0]  # N, T, L
        att = F.softmax(score, dim=2)
        return torch.matmul(att, f1), att

    def _layer(self, i, f1, f2):
        f1 = F.relu(f1)
        f2 = F.relu(f2)
        f_hat, att = self._att1(getattr(self, f"att{i}").att_layer.fc, f1, f2)
        return f1, F.relu(f2 + f_hat), att

    def forward(self, img_f, ques, qlen):
        img = F.relu(self.img_emb(img_f))
        que = self.que_emb(ques)
        que_att = img_att = None
        for i in range(ATT_NUM):
            if i % 2 == 0:
                img, que, que_att = self._layer(i, img, que)
            else:
                que, img, img_att = self._layer(i, que, img)
        x = torch.cat([que_att, img_att.transpose(1, 2)], dim=1).reshape(N, -1)
        return self.batchnorm(self.fc(x))


def _randomize_bn(bn):
    with torch.no_grad():
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_()
        bn.bias.normal_()


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_import_mhb_coatt():
    torch.manual_seed(0)
    img, ques, qlen = _inputs(10)
    _check_family("mhb_coAtt", _TMHBCoAtt(), _TMHBCoAtt.forward,
                  img, ques, qlen)


def test_import_mhb_coatt_glove():
    torch.manual_seed(1)
    img, ques, qlen = _inputs(11)
    tm = _TMHBCoAtt(glove=True)
    cfg = _cfg("mhb_coAtt", glove=True)
    model = get_model("mhb_coAtt")
    template = model.init(
        jax.random.PRNGKey(0), cfg,
        glove_table=tm._glove_table.numpy().astype(np.float32),
    )
    sd = {k: v.detach().numpy()
          for k, v in tm.double().eval().state_dict().items()}
    params = import_state_dict("mhb_coAtt", sd, template)
    # the table has no torch counterpart: carried from the template
    np.testing.assert_array_equal(
        np.asarray(params["glove_table"]), np.asarray(template["glove_table"])
    )
    with torch.no_grad():
        want = tm(torch.tensor(img),
                  torch.tensor(ques.astype(np.int64)), None).numpy()
    # f32 table + f64 framework pass: compare against the f32-rounded rows
    tm_f32 = tm  # buffer already f64; framework casts the f32 param up
    del tm_f32
    got = _fw_logits(model, cfg, params, img, ques, qlen)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_import_mhb():
    torch.manual_seed(2)
    img, ques, qlen = _inputs(12)
    _check_family("mhb", _TMHB(), _TMHB.forward, img, ques, qlen)


def test_import_mfb():
    torch.manual_seed(3)
    img, ques, qlen = _inputs(13)
    _check_family("mfb", _TMFB(multilayer=False), _TMFB.forward,
                  img, ques, qlen)


def test_import_mfb_multilayer():
    torch.manual_seed(4)
    img, ques, qlen = _inputs(14)
    _check_family("mfb-multilayer", _TMFB(multilayer=True), _TMFB.forward,
                  img, ques, qlen)


def test_import_hiecoatten():
    torch.manual_seed(5)
    img, ques, qlen = _inputs(15)
    _check_family("hieCoAtten", _THieCoAtten(), _THieCoAtten.forward,
                  img, ques, qlen, cfg=_cfg("hieCoAtten", embed_size=E))


def test_import_vis_lstm():
    torch.manual_seed(6)
    img, ques, qlen = _inputs(16)
    _check_family("visLstm", _TVisLSTM(), _TVisLSTM.forward, img, ques, qlen,
                  cfg=_cfg("visLstm", image_first=True))


def test_import_ibowimg():
    torch.manual_seed(7)
    img, ques, qlen = _inputs(17)
    tm = _TIBowImg()
    _randomize_bn(tm.img_bn)
    _check_family("iBOWIMG", tm, _TIBowImg.forward, img, ques, qlen,
                  cfg=_cfg("iBOWIMG", embed_size=E))


def test_import_attention_net():
    torch.manual_seed(8)
    img, ques, qlen = _inputs(18)
    tm = _TAttentionNet()
    _randomize_bn(tm.batchnorm)
    _check_family("attentionNet", tm, _TAttentionNet.forward, img, ques, qlen,
                  cfg=_cfg("attentionNet", embed_size=E, att_num=ATT_NUM))


# ---------------------------------------------------------------------------
# failure modes & plumbing
# ---------------------------------------------------------------------------

def test_module_prefix_stripped():
    sd = {"module.fc.weight": np.zeros((2, 2)), "fc.bias": np.zeros(2)}
    out = clean_state_dict(sd)
    assert set(out) == {"fc.weight", "fc.bias"}


def test_wrong_family_rejected():
    torch.manual_seed(9)
    sd = {k: v.detach().numpy() for k, v in _TMHB().state_dict().items()}
    cfg = _cfg("mhb_coAtt")
    template = get_model("mhb_coAtt").init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="missing"):
        import_state_dict("mhb_coAtt", sd, template)


def test_shape_mismatch_rejected():
    torch.manual_seed(10)
    sd = {k: v.detach().numpy() for k, v in _TMHB().state_dict().items()}
    cfg = _cfg("mhb").replace(a_vocab_size=A_VOCAB + 1)
    template = get_model("mhb").init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="shape"):
        import_state_dict("mhb", sd, template)


def test_multilayer_into_plain_mfb_rejected():
    torch.manual_seed(11)
    sd = {k: v.detach().numpy()
          for k, v in _TMFB(multilayer=True).state_dict().items()}
    cfg = _cfg("mfb")
    template = get_model("mfb").init(jax.random.PRNGKey(0), cfg)
    # the multiconv entries are unconsumed AND conv2 shapes clash
    with pytest.raises(ValueError):
        import_state_dict("mfb", sd, template)


def test_export_cli_writes_reference_loadable_pth(tmp_path):
    """tools/export_torch.py must write a .pth that (a) torch.load +
    clean_state_dict handling accepts and (b) imports back bit-exactly —
    the full migration cycle reference_user <- framework."""
    import json
    import subprocess
    import sys

    name = "iBOWIMG"
    cfg = _cfg(name)
    model = get_model(name)
    params = model.init(jax.random.PRNGKey(7), cfg)
    from vqa_attention_networks_tpu.utils import checkpoint as ckpt

    ckpt.save_weights(str(tmp_path / "models" / name), params)
    vocab = {
        "question_vocab": {f"w{i}": i + 1 for i in range(cfg.q_vocab_size - 2)}
        | {"UNK": cfg.q_vocab_size - 1},
        "answer_vocab": {f"a{i}": i for i in range(cfg.a_vocab_size)},
        "max_question_length": cfg.max_question_length,
    }
    vocab_path = tmp_path / "vocab.json"
    with open(vocab_path, "w") as f:
        json.dump(vocab, f)

    out_pth = tmp_path / f"{name}.pth"
    env = dict(os.environ)
    env["VQA_PLATFORM"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    run = subprocess.run(
        [sys.executable, "-m", "tools.export_torch", "--model_name", name,
         "--model_dir", str(tmp_path / "models"), "--vocab", str(vocab_path),
         "--out", str(out_pth),
         "--img_feature_channel", str(cfg.img_feature_channel)],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300,
    )
    assert run.returncode == 0, run.stdout + run.stderr
    assert out_pth.exists()

    from vqa_attention_networks_tpu.utils.torch_import import load_pth

    back = import_state_dict(name, load_pth(str(out_pth)),
                             model.init(jax.random.PRNGKey(0), cfg))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, back,
    )
