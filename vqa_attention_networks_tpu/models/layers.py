"""Shared neural building blocks, TPU-first.

Design notes
------------
- Parameters are plain nested dicts (pytrees); weights are stored
  ``[in, out]`` so every projection is a row-major matmul straight onto the
  MXU (the reference's 1x1 ``nn.Conv2d`` layers are exactly these matmuls,
  e.g. mfb.py:34-39, mhb_coAtt.py:40-41).
- The LSTM is a ``jax.lax.scan`` over time with the input projection hoisted
  *out* of the recurrence: ``x @ W_ih`` for all T steps is one large batched
  matmul; only ``h @ W_hh`` stays inside the scan. This keeps the MXU busy
  where the reference relies on cuDNN (mfb.py:27-30).
- Initialisation matches the reference's blanket
  ``init.xavier_uniform_`` over non-bias parameters (train_models.py:54-56),
  with PyTorch's fan convention. Biases are zero-initialised (deviation: the
  reference leaves PyTorch's default uniform bias init in place).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


def matmul_precision(dtype) -> Optional[jax.lax.Precision]:
    """JAX's default matmul precision feeds the MXU bf16 inputs even for
    float32 operands (~1e-3 relative error). Under a float32/float64 compute
    dtype the reference-faithful choice is full-precision passes; under bf16
    the default is already right and fastest."""
    if jnp.dtype(dtype) in (jnp.float32, jnp.float64):
        return jax.lax.Precision.HIGHEST
    return None


# --------------------------------------------------------------------------
# initialisers
# --------------------------------------------------------------------------

def xavier_uniform(
    rng: jax.Array, shape: Tuple[int, ...], fan_in: int, fan_out: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """PyTorch-convention xavier uniform: U(-a, a), a = sqrt(6/(fi+fo))."""
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, minval=-a, maxval=a)


def dense_init(rng: jax.Array, d_in: int, d_out: int, bias: bool = True) -> Params:
    p: Params = {"w": xavier_uniform(rng, (d_in, d_out), d_in, d_out)}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(
        x, p["w"].astype(x.dtype),
        preferred_element_type=x.dtype,
        precision=matmul_precision(x.dtype),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def embedding_init(rng: jax.Array, vocab: int, dim: int) -> Params:
    # PyTorch fans for an [V, E] embedding matrix: fan_in=E, fan_out=V.
    return {"table": xavier_uniform(rng, (vocab, dim), dim, vocab)}


def embed(p: Params, ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.take(p["table"].astype(dtype), ids, axis=0)


# --------------------------------------------------------------------------
# LSTM (lax.scan recurrence; PyTorch gate order i, f, g, o)
# --------------------------------------------------------------------------

def lstm_init(rng: jax.Array, d_in: int, hidden: int) -> Params:
    k_ih, k_hh = jax.random.split(rng)
    return {
        # PyTorch stores weight_ih as [4H, d_in]; fans are (d_in, 4H).
        "w_ih": xavier_uniform(k_ih, (d_in, 4 * hidden), d_in, 4 * hidden),
        "w_hh": xavier_uniform(k_hh, (hidden, 4 * hidden), hidden, 4 * hidden),
        # TWO bias vectors like torch nn.LSTM (b_ih + b_hh): they receive
        # identical gradients but step INDEPENDENTLY under Adam, so the
        # total gate bias moves 2x per step vs a single fused bias — a
        # fused "b" would silently halve the reference's effective bias
        # learning rate. Forward-wise only the sum matters.
        "b_ih": jnp.zeros((4 * hidden,), jnp.float32),
        "b_hh": jnp.zeros((4 * hidden,), jnp.float32),
    }


def lstm_bias(p: Params) -> jnp.ndarray:
    """The summed gate bias (b_ih + b_hh, torch semantics)."""
    return p["b_ih"] + p["b_hh"]


def lstm_cell(
    p: Params,
    x_proj: jnp.ndarray,  # [N, 4H] — already x @ w_ih (+ bias)
    h: jnp.ndarray,
    c: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step given the precomputed input projection."""
    gates = x_proj + jnp.dot(
        h, p["w_hh"].astype(h.dtype),
        preferred_element_type=h.dtype,
        precision=matmul_precision(h.dtype),
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm(
    p: Params,
    x: jnp.ndarray,  # [N, T, d_in]
    h0: Optional[jnp.ndarray] = None,
    c0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full unrolled-by-scan LSTM; returns all hidden states [N, T, H]."""
    n, t, _ = x.shape
    hidden = p["w_hh"].shape[0]
    dtype = x.dtype
    # Hoisted input projection: one [N*T, d_in] x [d_in, 4H] matmul.
    x_proj = (
        jnp.dot(x, p["w_ih"].astype(dtype), preferred_element_type=dtype,
                precision=matmul_precision(dtype))
        + lstm_bias(p).astype(dtype)
    )
    if h0 is None:
        h0 = jnp.zeros((n, hidden), dtype)
    if c0 is None:
        c0 = jnp.zeros((n, hidden), dtype)

    def step(carry, xp):
        h, c = carry
        h, c = lstm_cell(p, xp, h, c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(hs, 0, 1)  # [N, T, H]


# --------------------------------------------------------------------------
# elementwise / normalisation primitives
# --------------------------------------------------------------------------

def dropout(
    rng: Optional[jax.Array], x: jnp.ndarray, rate: float, train: bool
) -> jnp.ndarray:
    """Inverted dropout. No-op at eval time.

    Deviation (documented): the reference calls ``F.dropout`` without a
    training flag in several eval paths (networks.py:22-24, hieCoAtten.py:26-33,
    visLstm.py:34-35), silently applying dropout during evaluation. Here
    dropout is strictly train-only.
    """
    if not train or rate <= 0.0:
        return x
    assert rng is not None, "dropout in train mode needs an rng"
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def signed_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """Power normalisation sqrt(relu(x)) - sqrt(relu(-x))
    (mfb.py:104, mhb_coAtt.py:106,198)."""
    return jnp.sqrt(jax.nn.relu(x)) - jnp.sqrt(jax.nn.relu(-x))


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize semantics: x / max(||x||_2, eps).

    The square-sum accumulates in (at least) f32 — a bf16 reduction over the
    196*1000-element flattened grid (mfb.py:105) would be badly lossy."""
    acc = jnp.promote_types(x.dtype, jnp.float32)
    norm = jnp.sqrt(
        jnp.sum(jnp.square(x.astype(acc)), axis=axis, keepdims=True)
    )
    return (x.astype(acc) / jnp.maximum(norm, eps)).astype(x.dtype)


# --------------------------------------------------------------------------
# batch norm (iBOWIMG / AttentionNet use BatchNorm1d: networks.py:11,44)
# --------------------------------------------------------------------------

def batchnorm_init(dim: int) -> Params:
    return {
        "scale": jnp.ones((dim,), jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
        # running stats: non-trained leaves, refreshed by the train step
        "mean": jnp.zeros((dim,), jnp.float32),
        "var": jnp.ones((dim,), jnp.float32),
    }


def batchnorm(
    p: Params, x: jnp.ndarray, train: bool,
    eps: float = 1e-5, valid=None,
) -> Tuple[jnp.ndarray, Params]:
    """BatchNorm over axis 0. Returns (y, this batch's statistics).

    The returned stats are the RAW batch mean / unbiased variance (torch's
    running-stat inputs); the momentum EMA into the running stats is owned
    by the train step (solver._merge_batch_stats), so that gradient
    accumulation can apply it once per microbatch — torch applies momentum
    on every forward (networks.py:11,44), and a single end-of-step EMA
    would make the running stats converge ~grad_accum_steps times slower.
    At eval the running stats come back unchanged (the EMA's fixed point).

    ``valid`` masks pad rows out of the TRAIN-mode statistics: the final
    batch of an epoch is padded by duplicating its last sample
    (dataset.py), and unmasked stats would let one sample carry most of
    the weight — skewing the normalisation of the real rows and leaking
    into the running stats every epoch."""
    if train:
        # statistics accumulate in f32 even under bf16 compute: a bf16
        # mean/var over a 1024-row batch carries percent-level cancellation
        # error straight into the f32 running stats (same policy as
        # l2_normalize's promoted reduction)
        xs = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        if valid is not None:
            w = valid.astype(xs.dtype)
            n = jnp.maximum(jnp.sum(w), 1.0)
            wn = (w / n)[:, None]
            mean = jnp.sum(xs * wn, axis=0)
            var = jnp.sum(jnp.square(xs - mean) * wn, axis=0)
            unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        else:
            mean = jnp.mean(xs, axis=0)
            var = jnp.var(xs, axis=0)
            n = xs.shape[0]
            unbiased = var * (n / max(n - 1, 1))
        new_stats = {"mean": mean, "var": unbiased}
    else:
        mean, var = p["mean"], p["var"]
        new_stats = {"mean": p["mean"], "var": p["var"]}
    y = (x.astype(mean.dtype) - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype), new_stats
