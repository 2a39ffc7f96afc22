"""MFB co-attention model (+ the ``mfb-multilayer`` variant).

Capability twin of the reference's ``MFB`` (mfb.py:6-140):

  embed(tanh) -> LSTM(1024) -> 2-glimpse question attention
  -> MFB bilinear fusion with the 196x2048 image grid (project to 5000,
     Hadamard, sum-pool k=5 -> 1000, signed sqrt, L2 over the flat grid)
  -> 2-glimpse co-attention over the image regions
  -> second MFB fusion -> linear -> a_vocab logits

``mfb-multilayer`` inserts an extra 1024->512 projection + ReLU in both
attention stacks (mfb.py:35-37,48-50,78-80,111-113).

Reference quirk preserved under ``cfg.keep_reference_quirks``: both glimpse
softmaxes run over a singleton axis (mfb.py:84,118), making every attention
weight exactly 1.0 — each "glimpse" is an unweighted sum over positions, and
the two glimpses of a pool are identical. With the flag off, the softmax runs
over the position axis as in MHBCoAtt.

All 1x1 convs of the reference are expressed as matmuls over the last axis.
Returns raw logits (trained with cross-entropy: solver.py:29).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import layers as L
from vqa_attention_networks_tpu.ops.fusion import mfb_fuse_pool, two_glimpse_pool
from vqa_attention_networks_tpu.ops.pallas_fusion import grid_fuse


def _is_multilayer(cfg: Config) -> bool:
    return cfg.model_name == "mfb-multilayer"


def init(rng: jax.Array, cfg: Config) -> dict:
    ks = iter(jax.random.split(rng, 16))
    h, d_img = cfg.hidden_dim, cfg.img_feature_channel
    fusion = cfg.fusion_dim  # 5000
    p = {
        "word_embedding": L.embedding_init(next(ks), cfg.q_vocab_size, cfg.emb_dim),
        "lstm": L.lstm_init(next(ks), cfg.emb_dim, h),
        # question attention stack (mfb.py:34-39)
        "ques_att_conv1": L.dense_init(next(ks), h, 1024),
        "ques_att_conv2": L.dense_init(
            next(ks), 512 if _is_multilayer(cfg) else 1024, 2
        ),
        # fusion stage 1 (mfb.py:42-43)
        "ques_proj1": L.dense_init(next(ks), 2 * h, fusion),
        "img_conv1d": L.dense_init(next(ks), d_img, fusion),
        # co-attention stack (mfb.py:47-52)
        "co_att_conv1": L.dense_init(next(ks), cfg.mfb_out, 1024),
        "co_att_conv2": L.dense_init(
            next(ks), 512 if _is_multilayer(cfg) else 1024, 2
        ),
        # fusion stage 2 (mfb.py:55-56)
        "ques_proj2": L.dense_init(next(ks), 2 * h, fusion),
        "img_proj2": L.dense_init(next(ks), 2 * d_img, fusion),
        # classifier (mfb.py:59)
        "linear_pred": L.dense_init(next(ks), cfg.mfb_out, cfg.a_vocab_size),
    }
    if _is_multilayer(cfg):
        p["ques_att_multiconv"] = L.dense_init(next(ks), 1024, 512)
        p["co_att_multiconv"] = L.dense_init(next(ks), 1024, 512)
    return p


def _att_logits(p: dict, name: str, x: jnp.ndarray, multilayer: bool) -> jnp.ndarray:
    """conv1x1 -> ReLU [-> conv1x1 -> ReLU] -> conv1x1 (mfb.py:76-81,109-114)."""
    a = jax.nn.relu(L.dense(p[f"{name}_conv1"], x))
    if multilayer:
        a = jax.nn.relu(L.dense(p[f"{name}_multiconv"], a))
    return L.dense(p[f"{name}_conv2"], a)


def apply(
    params: dict,
    cfg: Config,
    img_features: jnp.ndarray,  # [N, 196, 2048]
    questions: jnp.ndarray,  # [N, T] int
    ques_length: Optional[jnp.ndarray] = None,  # unused by this model
    train: bool = False,
    rng: Optional[jax.Array] = None,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    del valid  # no batch-statistic layers in this model
    del ques_length
    multilayer = _is_multilayer(cfg)
    quirk = cfg.keep_reference_quirks
    n = questions.shape[0]
    dtype = jnp.dtype(cfg.compute_dtype)
    img_features = img_features.astype(dtype)

    if train:
        assert rng is not None
        k_l, k_m1, k_m2 = jax.random.split(rng, 3)
    else:
        k_l = k_m1 = k_m2 = None

    # question encoder (mfb.py:68-70)
    emb = jnp.tanh(L.embed(params["word_embedding"], questions, dtype))
    h_seq = L.lstm(params["lstm"], emb)  # [N, T, H]
    h_seq = L.dropout(k_l, h_seq, cfg.dropout_lstm, train)

    # 2-glimpse question attention (mfb.py:72-89)
    q_att_logits = _att_logits(params, "ques_att", h_seq, multilayer)  # [N, T, 2]
    q_att_feature = two_glimpse_pool(q_att_logits, h_seq, uniform_quirk=quirk)

    # stage-1 MFB fusion with the image grid (mfb.py:91-106) — fused Pallas
    # kernel on TPU at inference (ops/pallas_fusion.py)
    q_proj = L.dense(params["ques_proj1"], q_att_feature)  # [N, 5000]
    fused = grid_fuse(
        img_features, params["img_conv1d"], q_proj, cfg.mfb_factor,
        rng=k_m1, dropout_rate=cfg.dropout_fusion, train=train,
        site=cfg.dropout_site,
    )  # [N, 196, 1000]
    # L2 over the *flattened* grid (mfb.py:105)
    fused = L.l2_normalize(fused.reshape(n, -1)).reshape(fused.shape)

    # 2-glimpse co-attention over image regions (mfb.py:108-123); the glimpse
    # pool runs over the RAW image features (mfb.py:119).
    co_logits = _att_logits(params, "co_att", fused, multilayer)  # [N, 196, 2]
    v_att_feature = two_glimpse_pool(co_logits, img_features, uniform_quirk=quirk)

    # stage-2 MFB fusion (mfb.py:125-135)
    q_proj2 = L.dense(params["ques_proj2"], q_att_feature)
    v_proj2 = L.dense(params["img_proj2"], v_att_feature)
    final = mfb_fuse_pool(
        q_proj2, v_proj2, cfg.mfb_factor,
        rng=k_m2, dropout_rate=cfg.dropout_fusion, train=train,
    )  # [N, 1000]
    final = L.l2_normalize(final)

    logits = L.dense(params["linear_pred"], final).astype(jnp.float32)
    return logits, {"q_att_logits": q_att_logits, "co_att_logits": co_logits}
