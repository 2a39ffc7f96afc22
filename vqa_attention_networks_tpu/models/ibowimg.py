"""iBOWIMG baseline, the stacked alternating-attention network, and the
reusable attention primitives.

Capability twins of reference ``networks.py`` + ``modules.py``:

- ``iBOWIMG`` (networks.py:7-28): bag-of-words question (sum of embeddings)
  concat batch-normed projected image vector -> linear classifier.
- ``AttentionNet`` (networks.py:30-69): 6 alternating additive-attention
  layers — even layers image-guides-question, odd layers
  question-guides-image — classifier over the concatenated attention maps.
- ``attention_1`` (modules.py:35-77): additive attention. The reference
  materialises a [N, T, L, D] broadcast sum and pushes it through a D->1
  linear layer; because that layer is linear, the score decomposes as
  ``w.f1[l] + w.f2[t] + b`` — computed here as two [.., D] x [D, 1] matmuls
  plus a broadcast add. Identical numerics, no [N,T,L,D] tensor in HBM.
- ``attention_2`` (modules.py:79-95): bilinear attention f2 W f1^T.
- ``attention_layer`` (modules.py:8-33): residual wrapper with ReLU.
- ``nonlinear_layer`` (modules.py:97-109): gated tanh * sigmoid unit.

Fixed reference bug: networks.py:64 concatenates the two attention maps along
dim 0 and reshapes, scrambling sample pairing; we concatenate along dim 1.

BatchNorm running stats ride inside the params pytree and are refreshed by
the train step via ``aux["batch_stats"]`` (they receive zero gradient).
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import layers as L


# ---------------------------------------------------------------------------
# attention primitives (modules.py)
# ---------------------------------------------------------------------------

def attention_1_init(rng: jax.Array, feature_size: int) -> dict:
    return {"fc": L.dense_init(rng, feature_size, 1)}


def attention_1(
    p: dict, feature_1: jnp.ndarray, feature_2: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Additive attention (modules.py:41-77).

    feature_1: [N, L, D] (attended over), feature_2: [N, T, D] (queries).
    Returns (f_hat [N, T, D], att [N, T, L]).
    """
    s1 = L.dense(p["fc"], feature_1)[..., 0]  # [N, L] — w.f1 + b
    s2 = jnp.einsum(
        "ntd,d->nt", feature_2, p["fc"]["w"][:, 0].astype(feature_2.dtype),
        preferred_element_type=feature_2.dtype,
        precision=L.matmul_precision(feature_2.dtype),
    )  # [N, T] — w.f2 (bias already counted once in s1); full precision
    # under f32 like its s1 twin (L.dense), or the decomposed score drifts
    # ~1e-3 from the reference's single D->1 linear on the MXU
    att = jax.nn.softmax(s2[:, :, None] + s1[:, None, :], axis=2)  # [N, T, L]
    f_hat = jnp.einsum(
        "ntl,nld->ntd", att, feature_1, preferred_element_type=feature_1.dtype, precision=L.matmul_precision(feature_1.dtype)
    )
    return f_hat, att


def attention_2_init(rng: jax.Array, feature_size: int) -> dict:
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": L.dense_init(k1, feature_size, feature_size, bias=False),
        "fc2": L.dense_init(k2, feature_size, 1),  # defined but unused upstream
    }


def attention_2(
    p: dict, feature_1: jnp.ndarray, feature_2: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear attention f2 . (W f1)^T (modules.py:85-95)."""
    f1w = L.dense(p["fc1"], feature_1)  # [N, L, D]
    att = jax.nn.softmax(
        jnp.einsum(
            "ntd,nld->ntl", feature_2, f1w, preferred_element_type=feature_1.dtype, precision=L.matmul_precision(feature_1.dtype)
        ),
        axis=2,
    )
    f_hat = jnp.einsum(
        "ntl,nld->ntd", att, feature_1, preferred_element_type=feature_1.dtype, precision=L.matmul_precision(feature_1.dtype)
    )
    return f_hat, att


def attention_layer_init(rng: jax.Array, feature_size: int, att_type: int = 1) -> dict:
    # att_type is static config, not a parameter — callers pass it to
    # attention_layer at apply time.
    if att_type == 1:
        return {"att": attention_1_init(rng, feature_size)}
    return {"att": attention_2_init(rng, feature_size)}


def attention_layer(
    p: dict, feature_1: jnp.ndarray, feature_2: jnp.ndarray, att_type: int = 1
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ReLU embed -> attention -> residual + ReLU (modules.py:26-33)."""
    f1 = jax.nn.relu(feature_1)
    f2 = jax.nn.relu(feature_2)
    att_fn = attention_1 if att_type == 1 else attention_2
    f_hat, att = att_fn(p["att"], f1, f2)
    return f1, jax.nn.relu(f2 + f_hat), att


def nonlinear_layer_init(rng: jax.Array, f_size: int) -> dict:
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": L.dense_init(k1, f_size, f_size),
        "fc2": L.dense_init(k2, f_size, f_size),
    }


def nonlinear_layer(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Gated tanh * sigmoid unit (modules.py:103-109)."""
    return jnp.tanh(L.dense(p["fc1"], x)) * jax.nn.sigmoid(L.dense(p["fc2"], x))


# ---------------------------------------------------------------------------
# iBOWIMG (networks.py:7-28)
# ---------------------------------------------------------------------------

def _ibow_init(rng: jax.Array, cfg: Config) -> dict:
    ks = iter(jax.random.split(rng, 3))
    e = cfg.embed_size
    return {
        "img_emb": L.dense_init(next(ks), cfg.img_feature_channel, e),
        "img_bn": L.batchnorm_init(e),
        "que_emb": L.embedding_init(next(ks), cfg.q_vocab_size, e),
        "fc": L.dense_init(next(ks), 2 * e, cfg.a_vocab_size),
    }


def _ibow_apply(
    params: dict,
    cfg: Config,
    img_features: jnp.ndarray,  # [N, 196, D] or [N, D]
    questions: jnp.ndarray,  # [N, T]
    ques_length: Optional[jnp.ndarray] = None,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    del ques_length
    dtype = jnp.dtype(cfg.compute_dtype)
    if img_features.ndim == 3:  # grid -> vector (historic input was fc7)
        img_features = jnp.mean(img_features, axis=1)
    img_features = img_features.astype(dtype)

    if train:
        assert rng is not None
        k_i, k_q = jax.random.split(rng)
    else:
        k_i = k_q = None

    img = L.dense(params["img_emb"], img_features)
    img, bn_stats = L.batchnorm(params["img_bn"], img, train, valid=valid)
    img = L.dropout(k_i, jax.nn.relu(img), cfg.dropout_default, train)

    que = L.embed(params["que_emb"], questions, dtype)
    que = L.dropout(k_q, que, cfg.dropout_default, train)
    que = jnp.sum(que, axis=1)  # bag of words (networks.py:25)

    logits = L.dense(
        params["fc"], jnp.concatenate([img, que], axis=-1)
    ).astype(jnp.float32)
    return logits, {"batch_stats": {"img_bn": bn_stats}}


IBOWIMG = SimpleNamespace(init=_ibow_init, apply=_ibow_apply, __name__="iBOWIMG")


# ---------------------------------------------------------------------------
# AttentionNet (networks.py:30-69)
# ---------------------------------------------------------------------------

def _attnet_init(rng: jax.Array, cfg: Config) -> dict:
    ks = iter(jax.random.split(rng, cfg.att_num + 3))
    e = cfg.embed_size
    p = {
        "img_emb": L.dense_init(next(ks), cfg.img_feature_channel, e),
        "que_emb": L.embedding_init(next(ks), cfg.q_vocab_size, e),
        "fc": L.dense_init(
            next(ks),
            2 * cfg.img_feature_dim * cfg.max_question_length,
            cfg.a_vocab_size,
        ),
        "batchnorm": L.batchnorm_init(cfg.a_vocab_size),
    }
    # all layers use att_type 1 (networks.py:35-42 sets type 1 in both arms)
    for i in range(cfg.att_num):
        p[f"att{i}"] = attention_layer_init(next(ks), e, att_type=1)
    return p


def _attnet_apply(
    params: dict,
    cfg: Config,
    img_features: jnp.ndarray,  # [N, 196, D]
    questions: jnp.ndarray,  # [N, T]
    ques_length: Optional[jnp.ndarray] = None,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    del ques_length
    dtype = jnp.dtype(cfg.compute_dtype)
    n = questions.shape[0]

    if train:
        assert rng is not None
        k_i, k_q = jax.random.split(rng)
    else:
        k_i = k_q = None

    img = jax.nn.relu(L.dense(params["img_emb"], img_features.astype(dtype)))
    img = L.dropout(k_i, img, cfg.dropout_default, train)  # [N, 196, E]
    que = L.embed(params["que_emb"], questions, dtype)
    que = L.dropout(k_q, que, cfg.dropout_default, train)  # [N, T, E]

    que_att = img_att = None
    for i in range(cfg.att_num):
        if i % 2 == 0:  # image guides question (networks.py:59-60)
            img, que, que_att = attention_layer(params[f"att{i}"], img, que)
        else:  # question guides image (networks.py:61-62)
            que, img, img_att = attention_layer(params[f"att{i}"], que, img)

    # feature concat along dim 1 (bugfix of networks.py:64) -> [N, 2*T*196]
    x = jnp.concatenate(
        [que_att, jnp.swapaxes(img_att, 1, 2)], axis=1
    ).reshape(n, -1)
    x = L.dense(params["fc"], x).astype(jnp.float32)
    x, bn_stats = L.batchnorm(params["batchnorm"], x, train, valid=valid)
    return x, {
        "que_att": que_att,
        "img_att": img_att,
        "batch_stats": {"batchnorm": bn_stats},
    }


ATTENTION_NET = SimpleNamespace(
    init=_attnet_init, apply=_attnet_apply, __name__="AttentionNet"
)
