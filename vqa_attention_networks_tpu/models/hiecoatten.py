"""Hierarchical (parallel) co-attention model.

Capability twin of the reference ``HieCoAtten`` (hieCoAtten.py:5-55), the
parallel co-attention of Lu et al. 2016:

  affinity   C  = tanh(Cq @ Cv^T)                  [N, 22, 196]
  maps       Hv = tanh(Wv v + (Wq q)^T C)          [N, 196, 512]
             Hq = tanh(Wq q + (Wv v)^T C^T)        [N, 22, 512]
  attention  av = softmax(whv Hv) over regions, aq = softmax(whq Hq) over words
  answer     fc([av^T v ; aq^T q])

Returns (logits, {"av": ..., "aq": ...}) like the reference's
``(x, av, aq)`` tuple (hieCoAtten.py:55).

Fixed reference bugs (cfg.py policy note):
- hieCoAtten.py:31 applies ``fc_Wbv`` to the question branch although
  ``fc_Wbq`` is defined; we use Wbq (the paper's semantics).
- hieCoAtten.py:52 concatenates v and q along dim 0 then reshapes, pairing
  sample i's image with sample i+N/2's question; we concatenate features
  (dim 1).
- The reference's constructor cannot even be reached from its CLI
  (train_models.py:49 passes cfg positionally into ``block_num``); ours takes
  cfg directly, with img_size = cfg.img_feature_channel (the reference default
  of 1024 mismatches the actual 2048-channel ResNet features).

Deviation: eval-time dropout (F.dropout without a training flag,
hieCoAtten.py:26-39) is train-only here.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import layers as L


def init(rng: jax.Array, cfg: Config) -> dict:
    ks = iter(jax.random.split(rng, 10))
    e = cfg.embed_size
    return {
        "img_emb": L.dense_init(next(ks), cfg.img_feature_channel, e),
        "que_emb": L.embedding_init(next(ks), cfg.q_vocab_size, e),
        "fc_Wbv": L.dense_init(next(ks), e, e),
        "fc_Wbq": L.dense_init(next(ks), e, e),
        "fc_Wv": L.dense_init(next(ks), e, e),
        "fc_Wq": L.dense_init(next(ks), e, e),
        "fc_Whv": L.dense_init(next(ks), e, 1),
        "fc_Whq": L.dense_init(next(ks), e, 1),
        "fc": L.dense_init(next(ks), 2 * e, cfg.a_vocab_size),
    }


def apply(
    params: dict,
    cfg: Config,
    img_features: jnp.ndarray,  # [N, 196, D]
    questions: jnp.ndarray,  # [N, T]
    ques_length: Optional[jnp.ndarray] = None,  # unused
    train: bool = False,
    rng: Optional[jax.Array] = None,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    del valid  # no batch-statistic layers in this model
    del ques_length
    dtype = jnp.dtype(cfg.compute_dtype)
    rate = cfg.dropout_default

    if train:
        assert rng is not None
        keys = iter(jax.random.split(rng, 5))
        nxt = lambda: next(keys)  # noqa: E731
    else:
        nxt = lambda: None  # noqa: E731

    # embeddings (hieCoAtten.py:25-28)
    img = jax.nn.relu(L.dense(params["img_emb"], img_features.astype(dtype)))
    img = L.dropout(nxt(), img, rate, train)  # [N, 196, E]
    que = L.embed(params["que_emb"], questions, dtype)
    que = L.dropout(nxt(), que, rate, train)  # [N, T, E]

    # affinity (hieCoAtten.py:30-33) — Wbq on the question branch (bugfix)
    cv = L.dense(params["fc_Wbv"], img)  # [N, 196, E]
    cq = L.dense(params["fc_Wbq"], que)  # [N, T, E]

    # fused Pallas co-attention core for bf16 inference (SURVEY 7.4):
    # affinity + both attention maps + both pools in one VMEM kernel
    from vqa_attention_networks_tpu.ops import pallas_coattention as pco

    if pco.supported(questions.shape[0], dtype, train):
        coattention_core_pallas = pco.coattention_core_pallas

        img_w = L.dense(params["fc_Wv"], img)
        que_w = L.dense(params["fc_Wq"], que)
        v, q, av_m, aq_m = coattention_core_pallas(
            img, que, cv, cq, img_w, que_w,
            params["fc_Whv"]["w"], params["fc_Whq"]["w"],
        )
        x = jnp.concatenate([v.astype(dtype), q.astype(dtype)], axis=-1)
        logits = L.dense(params["fc"], x).astype(jnp.float32)
        return logits, {"av": av_m, "aq": aq_m}
    c = jnp.tanh(
        jnp.einsum("nte,nle->ntl", cq, cv, preferred_element_type=dtype, precision=L.matmul_precision(dtype))
    )  # [N, T, 196]
    c = L.dropout(nxt(), c, rate, train)

    img_w = L.dense(params["fc_Wv"], img)  # [N, 196, E]
    que_w = L.dense(params["fc_Wq"], que)  # [N, T, E]

    # image attention map (hieCoAtten.py:38-43)
    hv = jnp.tanh(
        img_w
        + jnp.einsum("nte,ntl->nle", que_w, c, preferred_element_type=dtype, precision=L.matmul_precision(dtype))
    )  # [N, 196, E]
    hv = L.dropout(nxt(), hv, rate, train)
    av = jax.nn.softmax(L.dense(params["fc_Whv"], hv), axis=1)  # [N, 196, 1]
    v = jnp.einsum(
        "nl,nle->ne", av[..., 0], img, preferred_element_type=dtype, precision=L.matmul_precision(dtype)
    )  # [N, E]

    # question attention map (hieCoAtten.py:45-50)
    hq = jnp.tanh(
        que_w
        + jnp.einsum("nle,ntl->nte", img_w, c, preferred_element_type=dtype, precision=L.matmul_precision(dtype))
    )  # [N, T, E]
    hq = L.dropout(nxt(), hq, rate, train)
    aq = jax.nn.softmax(L.dense(params["fc_Whq"], hq), axis=1)  # [N, T, 1]
    q = jnp.einsum("nt,nte->ne", aq[..., 0], que, preferred_element_type=dtype, precision=L.matmul_precision(dtype))

    # classifier over the feature concat (dim-1; bugfix of hieCoAtten.py:52)
    x = jnp.concatenate([v, q], axis=-1)
    logits = L.dense(params["fc"], x).astype(jnp.float32)
    return logits, {"av": av[..., 0], "aq": aq[..., 0]}
