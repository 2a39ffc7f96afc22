"""Loss functions with the reference's exact semantics.

The reference selects ``nn.KLDivLoss()`` for the soft-answer models (mhb,
mhb_coAtt) and ``nn.CrossEntropyLoss()`` otherwise (solver.py:26-29). Both
are reproduced bit-for-bit in expectation, extended with a ``valid`` mask so
statically-shaped padded batches contribute nothing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def soft_cross_entropy(
    logits: jnp.ndarray,  # [N, A] raw logits
    soft_targets: jnp.ndarray,  # [N, A] annotator distribution
    valid: Optional[jnp.ndarray] = None,  # [N] bool
) -> jnp.ndarray:
    """KLDivLoss(log_softmax(logits), targets) with reduction='mean'.

    PyTorch's KLDiv mean reduction averages over ALL elements (N*A), and its
    pointwise term is ``t * (log t - input)`` with 0*log(0) := 0
    (solver.py:27 applied to mhb_coAtt.py:149's log_softmax outputs).
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    t = soft_targets
    # 0*log0 -> 0: mask before the log
    log_t = jnp.log(jnp.where(t > 0, t, 1.0))
    elem = t * (log_t - log_probs)
    if valid is not None:
        elem = elem * valid[:, None].astype(elem.dtype)
        n = jnp.maximum(jnp.sum(valid.astype(elem.dtype)), 1.0)
    else:
        n = jnp.asarray(logits.shape[0], elem.dtype)
    return jnp.sum(elem) / (n * logits.shape[-1])


def cross_entropy(
    logits: jnp.ndarray,  # [N, A]
    labels: jnp.ndarray,  # [N] int
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """nn.CrossEntropyLoss semantics: mean NLL of log_softmax at the label."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    if valid is not None:
        nll = nll * valid.astype(nll.dtype)
        n = jnp.maximum(jnp.sum(valid.astype(nll.dtype)), 1.0)
    else:
        n = jnp.asarray(logits.shape[0], nll.dtype)
    return jnp.sum(nll) / n


def soft_bce(
    logits: jnp.ndarray,  # [N, A]
    soft_labels: jnp.ndarray,  # [N, A] raw soft-label vector
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """The legacy trainer's 'soft BCE' loss (train_hfd.py:69-72):
    s = softmax(labels); elementwise -s log p - (1-s) log(1-p), summed over
    answers, mean over batch.

    The reference feeds raw logits where probabilities are expected (its
    models return logits) — a latent NaN factory. Here p = softmax(logits)
    and the log terms are computed stably (documented deviation)."""
    s = jax.nn.softmax(soft_labels, axis=-1)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    # log(1-p) = log(-expm1(log_p)). expm1 keeps full precision near
    # log_p == 0 where exp() rounds to exactly 1.0 (log1p(-exp(log_p))
    # returned -inf there: one ulp of exp error, or any bf16 log_p in
    # (-2^-8, 0], aborted the run with an inf loss). The clamp bounds the
    # term for a fully-confident class; eps is dtype-aware.
    eps = jnp.asarray(jnp.finfo(log_p.dtype).tiny, log_p.dtype)
    log_1mp = jnp.log(-jnp.expm1(jnp.minimum(log_p, -eps)))
    elem = -s * log_p - (1.0 - s) * log_1mp
    per_row = jnp.sum(elem, axis=-1)
    if valid is not None:
        per_row = per_row * valid.astype(per_row.dtype)
        n = jnp.maximum(jnp.sum(valid.astype(per_row.dtype)), 1.0)
    else:
        n = jnp.asarray(logits.shape[0], per_row.dtype)
    return jnp.sum(per_row) / n


def correct_count(
    logits: jnp.ndarray,
    labels: jnp.ndarray,  # [N] int — hard labels OR argmax of soft labels
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Number of exact-match argmax predictions (solver.py:96-101,148-153)."""
    pred = jnp.argmax(logits, axis=-1)
    hit = (pred == labels).astype(jnp.float32)
    if valid is not None:
        hit = hit * valid.astype(hit.dtype)
    return jnp.sum(hit)


def topk_correct_count(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    k: int = 3,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Top-k hit count — the metric the reference's TF eval script defines
    (evaluate_tf.py:69-76, top-3)."""
    _, topk = jax.lax.top_k(logits, k)
    hit = jnp.any(topk == labels[:, None], axis=-1).astype(jnp.float32)
    if valid is not None:
        hit = hit * valid.astype(hit.dtype)
    return jnp.sum(hit)


def vqa_consensus_scores(soft_idx: "np.ndarray", soft_val: "np.ndarray",
                         preds: "np.ndarray", soft_n: "np.ndarray",
                         total_annotators: int = 10) -> "np.ndarray":
    """Official VQA accuracy per sample, with the official leave-one-out
    averaging: ``mean over the 10 choose-9 annotator subsets of
    min(#matching_in_subset / 3, 1)``.

    The metric every VQA paper/leaderboard reports; the reference never
    implemented it (its eval is argmax-vs-argmax exact match,
    solver.py:150-153). Host-side numpy over the SPARSE soft rows
    (QASplit.soft_idx/soft_val, [B, 10]) — runs once per eval batch for
    every model family, soft-trained or not.

    Raw counts: the prepared soft values store ``count / n_in_vocab``
    (utils.py:250-265, reproduced in data/prepare.py:build_soft_answers)
    and ``soft_n`` carries n_in_vocab per row, so the predicted answer's
    annotator count is exactly ``value * soft_n`` (the fractions alone
    cannot recover it — a unanimous answer is 1.0 at every n). Closed form
    of the subset average for count c out of T annotators: excluding one
    of the c matching annotators leaves c-1 matches (c such subsets),
    excluding any other leaves c (T-c subsets), so
    ``score = (c*min((c-1)/3, 1) + (T-c)*min(c/3, 1)) / T``.
    Out-of-vocab annotator answers count toward T (they are real
    annotators who simply cannot match an in-vocab prediction). Rows with
    no in-vocab annotator answers score 0.
    """
    import numpy as np

    preds = np.asarray(preds)
    val = np.asarray(soft_val, np.float64)
    n = np.asarray(soft_n, np.float64)
    hit = np.asarray(soft_idx) == preds[:, None]  # [B, W]
    c = np.rint((val * hit).sum(axis=1) * n)
    t = float(total_annotators)
    return (c * np.minimum((c - 1) / 3.0, 1.0)
            + (t - c) * np.minimum(c / 3.0, 1.0)) / t
