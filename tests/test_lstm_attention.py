"""LSTM_Attention (SURVEY C12, reference visLstm.py:62-128) vs a NumPy
oracle — including the no-softmax attention quirk (visLstm.py:91-97)."""

import jax
import numpy as np

from vqa_attention_networks_tpu.models.vis_lstm import (
    lstm_attention_apply,
    lstm_attention_init,
)

from tests.test_oracle_parity import np_sigmoid


def _np_cell(p, x, h, c):
    gates = x @ p["w_ih"] + (p["b_ih"] + p["b_hh"]) + h @ p["w_hh"]
    i, f, g, o = np.split(gates, 4, axis=-1)
    i, f, o = np_sigmoid(i), np_sigmoid(f), np_sigmoid(o)
    g = np.tanh(g)
    c = f * c + i * g
    return o * np.tanh(c), c


def oracle(p, inputs, img):
    """Transcription of visLstm.py:100-128: per-step raw dot-product
    attention of h1 against the grid feeds [v_hat ; h1] into layer 2."""
    n, t = inputs.shape
    hdim = p["lstm1"]["w_hh"].shape[0]
    emb = p["embedding"]["table"][inputs]
    h1 = c1 = h2 = c2 = np.zeros((n, hdim))
    outs = []
    for step in range(t):
        h1, c1 = _np_cell(p["lstm1"], emb[:, step], h1, c1)
        alpha = np.einsum("nd,nld->nl", h1, img)  # NO softmax (quirk)
        v_hat = np.einsum("nl,nld->nd", alpha, img)
        h2, c2 = _np_cell(p["lstm2"], np.concatenate([v_hat, h1], -1), h2, c2)
        outs.append(h2)
    return np.stack(outs, axis=1)


def test_lstm_attention_matches_oracle():
    rng = np.random.default_rng(0)
    n, t, l, hdim, vocab = 3, 5, 7, 16, 20
    params = lstm_attention_init(
        jax.random.PRNGKey(0), vocab_size=vocab, embed_dim=8, hidden_dim=hdim
    )
    inputs = rng.integers(0, vocab, size=(n, t)).astype(np.int32)
    img = rng.standard_normal((n, l, hdim)).astype(np.float32) * 0.3

    got = np.asarray(lstm_attention_apply(params, inputs, img))
    p64 = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)
    want = oracle(p64, inputs, img.astype(np.float64))
    assert got.shape == (n, t, hdim)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
