"""MHB + co-attention (the reference's headline model) and plain MHB.

``MHBCoAtt`` (reference mhb_coAtt.py:6-151) shares the MFB skeleton but:
- optional GloVe: a frozen [q_vocab, 300] table embedded **on device** and
  concatenated to the learned embedding, doubling the LSTM input
  (mhb_coAtt.py:27-31,70-72 — the reference ships a [N,22,300] host matrix per
  batch instead);
- attention stacks are 512 wide (mhb_coAtt.py:40-41,49-50);
- the glimpse softmaxes run over the *real* position axis
  (mhb_coAtt.py:86,116);
- TWO cascaded output-fusion blocks (proj2/proj3) whose 1000-d outputs concat
  to 2000 before the classifier (mhb_coAtt.py:123-148).

Trained with soft cross-entropy against the annotator answer distribution
(KLDivLoss in the reference, solver.py:26-27); ``apply`` returns raw logits —
the loss applies log_softmax, which matches the reference's in-model
``F.log_softmax`` (mhb_coAtt.py:149) exactly.

Fixed reference bugs (documented, cfg.py policy note):
- mhb_coAtt.py:72-74 feeds [T, N, H] into a ``batch_first`` LSTM, scanning
  across the *batch* (information leaks between samples). We scan over time.
- mhb_coAtt.py:214 ``linear_out(mhb_22)`` is a NameError; the evident intent
  ``mhb_12`` is implemented.

``MHB`` (reference mhb_coAtt.py:153-217): mean-pooled image grid, last-valid
LSTM state per sample via ``ques_length`` (mhb_coAtt.py:185-186), two cascaded
MHB stages where the stage-2 product re-multiplies stage-1's pre-pool product
(mhb_coAtt.py:205) — the Multi-modal Hadamard Bilinear cascade.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import layers as L
from vqa_attention_networks_tpu.ops.fusion import (
    mfb_fuse_pool,
    mfb_sumpool,
    two_glimpse_pool,
)
from vqa_attention_networks_tpu.ops.pallas_attention import glimpse_attention
from vqa_attention_networks_tpu.ops.pallas_fusion import grid_fuse


# ---------------------------------------------------------------------------
# MHBCoAtt
# ---------------------------------------------------------------------------

def init(rng: jax.Array, cfg: Config, glove_table=None) -> dict:
    ks = iter(jax.random.split(rng, 16))
    h, d_img = cfg.hidden_dim, cfg.img_feature_channel
    fusion = cfg.fusion_dim
    p = {
        "word_embedding": L.embedding_init(next(ks), cfg.q_vocab_size, cfg.emb_dim),
        "lstm": L.lstm_init(next(ks), cfg.lstm_input_dim, h),
        "ques_att_conv1": L.dense_init(next(ks), h, 512),
        "ques_att_conv2": L.dense_init(next(ks), 512, 2),
        "ques_proj1": L.dense_init(next(ks), 2 * h, fusion),
        "img_conv1d": L.dense_init(next(ks), d_img, fusion),
        "co_att_conv1": L.dense_init(next(ks), cfg.mfb_out, 512),
        "co_att_conv2": L.dense_init(next(ks), 512, 2),
        "ques_proj2": L.dense_init(next(ks), 2 * h, fusion),
        "ques_proj3": L.dense_init(next(ks), 2 * h, fusion),
        "img_proj2": L.dense_init(next(ks), 2 * d_img, fusion),
        "img_proj3": L.dense_init(next(ks), 2 * d_img, fusion),
        "linear_pred": L.dense_init(next(ks), 2 * cfg.mfb_out, cfg.a_vocab_size),
    }
    if cfg.glove:
        if glove_table is None:
            # placeholder so shapes are always well-defined; real runs install
            # the offline table (data/glove.py) here.
            glove_table = jnp.zeros((cfg.q_vocab_size, cfg.emb_dim), jnp.float32)
        p["glove_table"] = jnp.asarray(glove_table, jnp.float32)
    return p


def _output_fusion(
    params: dict, cfg: Config, stage: str,
    q_att: jnp.ndarray, v_att: jnp.ndarray,
    rng: Optional[jax.Array], train: bool,
) -> jnp.ndarray:
    """One output MFB block: proj-q * proj-v -> pool -> signed sqrt -> L2
    (mhb_coAtt.py:123-133 for stage '2', 135-145 for stage '3')."""
    q_proj = L.dense(params[f"ques_proj{stage}"], q_att)
    v_proj = L.dense(params[f"img_proj{stage}"], v_att)
    z = mfb_fuse_pool(
        q_proj, v_proj, cfg.mfb_factor,
        rng=rng, dropout_rate=cfg.dropout_fusion, train=train,
    )
    return L.l2_normalize(z)


def apply(
    params: dict,
    cfg: Config,
    img_features: jnp.ndarray,  # [N, 196, 2048]
    questions: jnp.ndarray,  # [N, T]
    ques_length: Optional[jnp.ndarray] = None,  # unused
    train: bool = False,
    rng: Optional[jax.Array] = None,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    del valid  # no batch-statistic layers in this model
    del ques_length
    n = questions.shape[0]
    dtype = jnp.dtype(cfg.compute_dtype)
    img_features = img_features.astype(dtype)

    if train:
        assert rng is not None
        k_l, k_m1, k_m2, k_m3 = jax.random.split(rng, 4)
    else:
        k_l = k_m1 = k_m2 = k_m3 = None

    # encoder (mhb_coAtt.py:69-75); GloVe rows gathered on device and frozen
    emb = jnp.tanh(L.embed(params["word_embedding"], questions, dtype))
    if cfg.glove:
        glove = jax.lax.stop_gradient(
            jnp.take(params["glove_table"].astype(dtype), questions, axis=0)
        )
        emb = jnp.concatenate([emb, glove], axis=-1)
    h_seq = L.lstm(params["lstm"], emb)  # [N, T, H] — time scan (bugfix, see above)
    h_seq = L.dropout(k_l, h_seq, cfg.dropout_lstm, train)

    # 2-glimpse question attention with REAL softmax over T
    # (mhb_coAtt.py:81-91) — fused Pallas block on TPU at bf16 inference
    if train:
        q_att_logits = L.dense(
            params["ques_att_conv2"],
            jax.nn.relu(L.dense(params["ques_att_conv1"], h_seq)),
        )  # [N, T, 2]
        q_att_feature = two_glimpse_pool(q_att_logits, h_seq,
                                         uniform_quirk=False)
    else:
        q_att_logits = None
        q_att_feature = glimpse_attention(
            h_seq, params["ques_att_conv1"], params["ques_att_conv2"], h_seq,
            uniform_quirk=False,
        )

    # stage-1 fusion with the image grid (mhb_coAtt.py:93-108) and the
    # co-attention with REAL softmax over the 196 regions
    # (mhb_coAtt.py:110-121). At bf16 inference on TPU both stages run as ONE
    # VMEM-resident Pallas kernel (ops/pallas_wq_fusion.py): the fused grid —
    # 401 MB/batch at production shapes — never exists in HBM.
    q_proj = L.dense(params["ques_proj1"], q_att_feature)
    co_logits = None
    from vqa_attention_networks_tpu.ops import pallas_wq_fusion as wqf

    if (
        not train
        and cfg.fast_path != "composed"  # dispatch policy (config.py)
        and wqf.supported(img_features, params["img_conv1d"]["w"],
                          cfg.mfb_factor)
    ):
        # "auto" promotes the pair kernel on even batches: the r4 hardware
        # A/B measured it faster on both the headline (60,964 vs 59,814
        # qa-pairs/s, bench.py) and the micro (69,418 vs 68,146 qa-pairs/s,
        # bench_wq_kernel) — bit-exact vs the single-sample kernel, so no
        # accuracy implication. Odd batches (static at trace time) and
        # fast_path="pallas" take the single-sample kernel.
        use_pair = cfg.fast_path == "pallas_pair" or (
            cfg.fast_path == "auto" and img_features.shape[0] % 2 == 0
        )
        v_att_feature = wqf.stage1_coattention(
            img_features, params["img_conv1d"], q_proj,
            params["co_att_conv1"], params["co_att_conv2"], cfg.mfb_factor,
            pair=use_pair,
        )
    else:
        fused = grid_fuse(
            img_features, params["img_conv1d"], q_proj, cfg.mfb_factor,
            rng=k_m1, dropout_rate=cfg.dropout_fusion, train=train,
            site=cfg.dropout_site,
        )
        fused = L.l2_normalize(fused.reshape(n, -1)).reshape(fused.shape)
        if train:
            co_logits = L.dense(
                params["co_att_conv2"],
                jax.nn.relu(L.dense(params["co_att_conv1"], fused)),
            )  # [N, 196, 2]
            v_att_feature = two_glimpse_pool(co_logits, img_features,
                                             uniform_quirk=False)
        else:
            v_att_feature = glimpse_attention(
                fused.astype(img_features.dtype),
                params["co_att_conv1"], params["co_att_conv2"], img_features,
                uniform_quirk=False,
            )

    # cascaded output fusions (mhb_coAtt.py:123-148)
    out2 = _output_fusion(params, cfg, "2", q_att_feature, v_att_feature, k_m2, train)
    out3 = _output_fusion(params, cfg, "3", q_att_feature, v_att_feature, k_m3, train)
    logits = L.dense(
        params["linear_pred"], jnp.concatenate([out2, out3], axis=-1)
    ).astype(jnp.float32)
    return logits, {"q_att_logits": q_att_logits, "co_att_logits": co_logits}


# ---------------------------------------------------------------------------
# MHB (no attention) — exposed as a model-module namespace
# ---------------------------------------------------------------------------

def _mhb_init(rng: jax.Array, cfg: Config) -> dict:
    ks = iter(jax.random.split(rng, 8))
    h, d_img = cfg.hidden_dim, cfg.img_feature_channel
    fusion = cfg.fusion_dim
    return {
        "embedding": L.embedding_init(next(ks), cfg.q_vocab_size, cfg.emb_dim),
        "lstm": L.lstm_init(next(ks), cfg.emb_dim, h),
        "linear_q_1": L.dense_init(next(ks), h, fusion),
        "linear_q_2": L.dense_init(next(ks), h, fusion),
        "linear_i_1": L.dense_init(next(ks), d_img, fusion),
        "linear_i_2": L.dense_init(next(ks), d_img, fusion),
        "linear_out": L.dense_init(next(ks), 2 * cfg.mfb_out, cfg.a_vocab_size),
    }


def _mhb_apply(
    params: dict,
    cfg: Config,
    img_features: jnp.ndarray,  # [N, 196, 2048]
    questions: jnp.ndarray,  # [N, T]
    ques_length: Optional[jnp.ndarray] = None,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    del valid  # no batch-statistic layers in this model
    assert ques_length is not None, "MHB gathers the last valid LSTM step"
    n = questions.shape[0]
    dtype = jnp.dtype(cfg.compute_dtype)

    if train:
        assert rng is not None
        k_l, k_m1, k_m2 = jax.random.split(rng, 3)
    else:
        k_l = k_m1 = k_m2 = None

    # mean-pool the grid (mhb_coAtt.py:178-180)
    img_pooled = jnp.mean(img_features.astype(dtype), axis=1)  # [N, 2048]

    # no tanh on the embedding in MHB (mhb_coAtt.py:181)
    emb = L.embed(params["embedding"], questions, dtype)
    h_seq = L.lstm(params["lstm"], emb)  # [N, T, H]
    # last valid timestep per sample (mhb_coAtt.py:185-186); clamped so a
    # zero-token question (punctuation-only text) reads step 0, not the
    # negative index -1 (== the final step of an all-pad scan)
    h_last = h_seq[jnp.arange(n), jnp.maximum(ques_length, 1) - 1]
    h_last = L.dropout(k_l, h_last, cfg.dropout_lstm, train)

    # stage 1 (mhb_coAtt.py:190-199)
    z1 = L.dense(params["linear_q_1"], h_last) * L.dense(
        params["linear_i_1"], img_pooled
    )
    z1_dropped = L.dropout(k_m1, z1, cfg.dropout_fusion, train)
    m1 = L.l2_normalize(L.signed_sqrt(mfb_sumpool(z1_dropped, cfg.mfb_factor)))

    # stage 2 re-multiplies stage-1's pre-pool product (mhb_coAtt.py:201-211)
    z2 = L.dense(params["linear_q_2"], h_last) * L.dense(
        params["linear_i_2"], img_pooled
    )
    z2 = z2 * z1_dropped
    z2 = L.dropout(k_m2, z2, cfg.dropout_fusion, train)
    m2 = L.l2_normalize(L.signed_sqrt(mfb_sumpool(z2, cfg.mfb_factor)))

    # classifier over the concat — mhb_coAtt.py:213-214 with the typo fixed
    logits = L.dense(
        params["linear_out"], jnp.concatenate([m1, m2], axis=-1)
    ).astype(jnp.float32)
    return logits, {}


MHB = SimpleNamespace(init=_mhb_init, apply=_mhb_apply, __name__="MHB")
