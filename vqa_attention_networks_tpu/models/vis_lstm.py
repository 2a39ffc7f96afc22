"""VIS+LSTM baseline and the per-step-attention LSTM.

``visLstm`` (reference visLstm.py:7-60 / its byte-identical duplicate
lstm_modules.py): the image, projected into the word-embedding space, is fed
as the first (``cfg.image_first``) or last token of a 2-layer LSTM stack over
the question; the final hidden state classifies the answer.

Design notes / documented deviations:
- The reference requires ``emb_dim == hidden_dim`` (visLstm.py:40) because it
  projects the image to ``hidden_dim`` yet feeds it to an LSTM with input
  ``emb_dim``; we project to ``emb_dim`` (the evident intent), removing the
  constraint.
- The reference's output layer maps to ``cfg.vocab_size`` (visLstm.py:21), a
  key its live cfg never defines; we map to the answer vocabulary.
- Given grid features [N, 196, D] we mean-pool to [N, D] (the historical
  input was a 4096-d fc7 vector); a pre-pooled [N, D] input is accepted too.
- Eval-time ``F.dropout`` (visLstm.py:34-35) is train-only here.

The whole T+1-step stack runs as a single ``jax.lax.scan`` whose per-step
input projections for BOTH layers are hoisted into batched matmuls.

``lstm_attention`` (reference ``LSTM_Attention``, visLstm.py:62-128): a
2-layer LSTM where each step computes dot-product attention of layer-1's
hidden state against the 196-region grid and feeds [v_hat ; h1] to layer 2.
Reference quirk preserved: the attention weights are raw dot products — no
softmax (visLstm.py:91-97).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import layers as L


def init(rng: jax.Array, cfg: Config) -> dict:
    ks = iter(jax.random.split(rng, 5))
    return {
        "embedding_ques": L.embedding_init(next(ks), cfg.q_vocab_size, cfg.emb_dim),
        "embedding_img": L.dense_init(
            next(ks), cfg.img_feature_channel, cfg.emb_dim
        ),
        "lstm1": L.lstm_init(next(ks), cfg.emb_dim, cfg.hidden_dim),
        "lstm2": L.lstm_init(next(ks), cfg.hidden_dim, cfg.hidden_dim),
        "output_layer": L.dense_init(next(ks), cfg.hidden_dim, cfg.a_vocab_size),
    }


def apply(
    params: dict,
    cfg: Config,
    img_features: jnp.ndarray,  # [N, 196, D] or [N, D]
    questions: jnp.ndarray,  # [N, T]
    ques_length: Optional[jnp.ndarray] = None,  # unused
    train: bool = False,
    rng: Optional[jax.Array] = None,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    del valid  # no batch-statistic layers in this model
    del ques_length
    dtype = jnp.dtype(cfg.compute_dtype)
    n, t = questions.shape

    if img_features.ndim == 3:  # grid -> vector
        img_features = jnp.mean(img_features, axis=1)
    img_features = img_features.astype(dtype)

    if train:
        assert rng is not None
        k_q, k_i = jax.random.split(rng)
    else:
        k_q = k_i = None

    # token + image embeddings (visLstm.py:34-35)
    emb_q = L.dropout(
        k_q, L.embed(params["embedding_ques"], questions, dtype),
        cfg.dropout_default, train,
    )  # [N, T, E]
    emb_i = L.dropout(
        k_i, jnp.tanh(L.dense(params["embedding_img"], img_features)),
        cfg.dropout_default, train,
    )  # [N, E]

    # image as first or last token (visLstm.py:42-48)
    if cfg.image_first:
        seq = jnp.concatenate([emb_i[:, None, :], emb_q], axis=1)  # [N, T+1, E]
    else:
        seq = jnp.concatenate([emb_q, emb_i[:, None, :]], axis=1)

    # fused 2-layer stack: hoist layer-1 input projection, scan both layers
    p1, p2 = params["lstm1"], params["lstm2"]
    hidden = cfg.hidden_dim
    x1_proj = (
        jnp.dot(seq, p1["w_ih"].astype(dtype), preferred_element_type=dtype, precision=L.matmul_precision(dtype))
        + L.lstm_bias(p1).astype(dtype)
    )  # [N, T+1, 4H]

    def step(carry, xp):
        h1, c1, h2, c2 = carry
        h1, c1 = L.lstm_cell(p1, xp, h1, c1)
        x2 = (
            jnp.dot(h1, p2["w_ih"].astype(dtype), preferred_element_type=dtype, precision=L.matmul_precision(dtype))
            + L.lstm_bias(p2).astype(dtype)
        )
        h2, c2 = L.lstm_cell(p2, x2, h2, c2)
        return (h1, c1, h2, c2), None

    zeros = jnp.zeros((n, hidden), dtype)
    (h1, c1, h2, c2), _ = jax.lax.scan(
        step, (zeros, zeros, zeros, zeros), jnp.swapaxes(x1_proj, 0, 1)
    )
    del h1, c1, c2

    logits = L.dense(params["output_layer"], h2).astype(jnp.float32)
    return logits, {}


# ---------------------------------------------------------------------------
# LSTM_Attention (visLstm.py:62-128)
# ---------------------------------------------------------------------------

def lstm_attention_init(
    rng: jax.Array, vocab_size: int, embed_dim: int = 512, hidden_dim: int = 512
) -> dict:
    ks = iter(jax.random.split(rng, 4))
    return {
        "embedding": L.embedding_init(next(ks), vocab_size, embed_dim),
        "lstm1": L.lstm_init(next(ks), embed_dim, hidden_dim),
        "lstm2": L.lstm_init(next(ks), 2 * hidden_dim, hidden_dim),
        # defined-but-unused, MIRRORING the reference: visLstm.py:75
        # creates output_layer yet forward() returns raw hidden states
        # (visLstm.py:128) without ever applying it
        "output_layer": L.dense_init(next(ks), hidden_dim, vocab_size),
    }


def lstm_attention_apply(
    params: dict,
    inputs: jnp.ndarray,  # [N, T] token ids
    img_features: jnp.ndarray,  # [N, L, D], D == hidden_dim
) -> jnp.ndarray:
    """Returns all layer-2 hidden states [N, T, H] (visLstm.py:100-128)."""
    n, t = inputs.shape
    p1, p2 = params["lstm1"], params["lstm2"]
    hidden = p1["w_hh"].shape[0]
    dtype = img_features.dtype

    emb = L.embed(params["embedding"], inputs, dtype)  # [N, T, E]
    x1_proj = (
        jnp.dot(emb, p1["w_ih"].astype(dtype), preferred_element_type=dtype, precision=L.matmul_precision(dtype))
        + L.lstm_bias(p1).astype(dtype)
    )

    def step(carry, xp):
        h1, c1, h2, c2 = carry
        h1, c1 = L.lstm_cell(p1, xp, h1, c1)
        # raw dot-product attention, NO softmax (visLstm.py:91-97 quirk)
        alpha = jnp.einsum(
            "nd,nld->nl", h1, img_features, preferred_element_type=dtype, precision=L.matmul_precision(dtype)
        )
        v_hat = jnp.einsum(
            "nl,nld->nd", alpha, img_features, preferred_element_type=dtype, precision=L.matmul_precision(dtype)
        )
        x2 = jnp.concatenate([v_hat, h1], axis=-1)
        x2 = (
            jnp.dot(x2, p2["w_ih"].astype(dtype), preferred_element_type=dtype, precision=L.matmul_precision(dtype))
            + L.lstm_bias(p2).astype(dtype)
        )
        h2, c2 = L.lstm_cell(p2, x2, h2, c2)
        return (h1, c1, h2, c2), h2

    zeros = jnp.zeros((n, hidden), dtype)
    _, h2s = jax.lax.scan(
        step, (zeros, zeros, zeros, zeros), jnp.swapaxes(x1_proj, 0, 1)
    )
    return jnp.swapaxes(h2s, 0, 1)  # [N, T, H]
