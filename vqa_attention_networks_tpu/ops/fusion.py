"""MFB/MHB fusion and glimpse-attention primitives (XLA-composed).

These are the exact op sequences the reference executes through PyTorch:

- ``mfb_sumpool``: the k-way factor pool of Multi-modal Factorised Bilinear
  fusion — reshape [..., o*k] -> [..., o, k] -> sum over k
  (mfb.py:100-101, mhb_coAtt.py:102-103,195-196). Channel c of the 5000-wide
  product maps to (c // k, c % k), i.e. output-major, matching the reference's
  permute+view.
- ``mfb_fuse_pool``: Hadamard product -> dropout -> sum-pool -> signed sqrt,
  the full fusion chain up to (but excluding) the site-specific L2
  normalisation (whose axis differs between the image-grid site, which
  normalises over the flattened [196*1000], mfb.py:105, and the final vector
  site, which normalises over [1000], mfb.py:135).
- ``two_glimpse_pool``: the 2-glimpse attention pool. ``uniform_quirk=True``
  reproduces MFB's softmax over a singleton axis (mfb.py:84,118) — every
  weight is exactly 1.0, so each glimpse degenerates to an unweighted sum
  over positions. ``False`` is the real per-position softmax used by
  MHBCoAtt (mhb_coAtt.py:86,116).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vqa_attention_networks_tpu.models.layers import dropout, signed_sqrt


def refactor_output_major(x: jnp.ndarray, o: int, k: int,
                          o_pad: int) -> jnp.ndarray:
    """[..., F=o*k] -> [..., k, o_pad]: split the output-major fusion axis
    (channel c = o_idx*k + j, mfb.py:100-101) onto its own k axis and
    zero-pad O to the lane width.

    THE layout contract shared by every Pallas fusion kernel (wq, combined
    co-attention, train fusion) and their mask-replay/backward paths — keep
    exactly one implementation so the kernels cannot desynchronize.
    """
    x3 = x.reshape(*x.shape[:-1], o, k)
    x3 = jnp.swapaxes(x3, -1, -2)
    return jnp.pad(x3, [(0, 0)] * (x3.ndim - 1) + [(0, o_pad - o)])


def mfb_sumpool(z: jnp.ndarray, k: int) -> jnp.ndarray:
    """[..., o*k] -> [..., o]: sum over the k bilinear factors."""
    *lead, d = z.shape
    assert d % k == 0, f"fusion dim {d} not divisible by factor {k}"
    return jnp.sum(z.reshape(*lead, d // k, k), axis=-1)


def mfb_fuse_pool(
    a: jnp.ndarray,
    b: jnp.ndarray,
    k: int,
    *,
    rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.1,
    train: bool = False,
) -> jnp.ndarray:
    """Hadamard -> dropout -> k-sum-pool -> signed sqrt.

    ``a`` and ``b`` broadcast against each other (the image-grid site fuses
    [N, L, o*k] with [N, 1, o*k]).
    """
    z = a * b
    z = dropout(rng, z, dropout_rate, train)
    return signed_sqrt(mfb_sumpool(z, k))


def grid_fuse_weight_contracted(
    img: jnp.ndarray,  # [N, L, D]
    w: jnp.ndarray,  # [D, F]
    b: jnp.ndarray,  # [F]
    q_proj: jnp.ndarray,  # [N, F]
    k: int,
) -> jnp.ndarray:
    """The 5x-fewer-FLOPs formulation of the image-grid fusion.

    The k-factor pool is linear over channels, so the question vector
    contracts into the weights FIRST:

        pooled[n,l,o] = img[n,l,:] @ W_q[n,:,o] + bq[n,o]
        W_q[n,d,o]    = sum_j W[d, o*k+j] * q[n, o*k+j]
        bq[n,o]       = sum_j b[o*k+j]    * q[n, o*k+j]

    — mathematically identical to (img@W + b) * q -> k-pool
    (mfb.py:96-103), but the big matmul contracts D x O instead of D x O*k:
    0.85 GFLOP/sample instead of 4.1. Measured 2.0x faster than the fused
    Pallas kernel on TPU v5e at batch 1024.

    Trade-off: the combined per-sample weights round to bf16 before the MXU,
    adding ~0.5% relative noise that the signed sqrt amplifies near zero
    (p99 ~5% relative vs the composed chain on N(0,1) inputs). This is the
    bf16 *speed* path; float32 compute keeps the exact composed semantics
    (grid_fuse dispatches).
    """
    n, l, d = img.shape
    f = w.shape[1]
    o = f // k
    w3 = w.reshape(d, o, k)
    q3 = q_proj.reshape(n, o, k)
    wq = jnp.einsum(
        "dok,nok->ndo",
        w3.astype(jnp.bfloat16),
        q3.astype(jnp.bfloat16),
        preferred_element_type=jnp.bfloat16,
    )  # [N, D, O] per-sample pooled weights
    bq = jnp.einsum(
        "ok,nok->no", b.reshape(o, k), q3, preferred_element_type=jnp.float32
    )
    pooled = (
        jnp.einsum(
            "nld,ndo->nlo", img.astype(jnp.bfloat16), wq,
            preferred_element_type=jnp.float32,
        )
        + bq[:, None, :]
    )
    # bf16 output halves the HBM traffic of the [N, 196, 1000] grid through
    # the L2 normalise + co-attention stack that consume it (the norm itself
    # accumulates in f32, layers.l2_normalize)
    return signed_sqrt(pooled).astype(jnp.bfloat16)


def grid_fuse_pooled(
    img: jnp.ndarray,  # [N, L, D]
    w: jnp.ndarray,  # [D, F]
    b: jnp.ndarray,  # [F]
    q_proj: jnp.ndarray,  # [N, F]
    k: int,
    *,
    rng: Optional[jax.Array],
    dropout_rate: float,
    train: bool,
) -> jnp.ndarray:
    """TPU-first fast-train fusion: dropout on the POOLED output.

    The reference regularises the PRE-pool product (mfb.py:99), whose mask
    lives on [N, L, O*k] — that site forces training to compute the full
    O*k-wide fusion: ~16 GFLOP/sample fwd+bwd at production dims (one
    forward L·D·F matmul plus three more in the backward — d_img, d_W, and
    the z0 recompute; ops/pallas_train_fusion.py). Moving the mask AFTER
    the k-pool + signed sqrt unlocks the weight-contracted formulation
    (grid_fuse_weight_contracted) for training too: the k factor contracts
    into per-sample weights first, and the MXU work drops to
    ~2.5 GFLOP/sample fwd+bwd (L·D·O forward + two L·D·O backward passes).

    Semantics: ``dropout(signed_sqrt(k-pool((img@W + b) * q)), rate)`` —
    standard activation dropout on the fusion feature map. Whole pooled
    units drop instead of 1/k of the factors, so this is a DIFFERENT
    regulariser from the reference recipe (Config.dropout_site documents
    the contract; the convergence soak gates training quality).

    Memory: the per-sample contracted weights wq [N, D, O] are the one big
    intermediate (4.3 GB bf16 at batch 1024). ``jax.checkpoint`` around
    the fused forward drops it from the residual set — the backward
    recomputes wq (VPU k·D·O) plus one L·D·O matmul, already counted
    above. Dropout stays OUTSIDE the checkpoint so the mask is drawn once.

    Dtype: bf16 inputs take grid_fuse_weight_contracted verbatim (bit-
    identical to the bf16 inference math, so train/eval see the same
    forward function); wider dtypes contract in their own precision (the
    same reordering without the bf16 rounding).

    On TPU at bf16 the chain up to the mask runs as VMEM-resident Pallas
    kernels instead (ops/pallas_pooled_fusion.py): the per-sample
    contracted weights and their gradient never exist in HBM — the
    measured r5 headroom of the XLA formulation
    (docs/ARCHITECTURE.md "Training-step roofline").
    ``VQA_COMPOSED_POOLED_FUSION=1`` forces this XLA chain.
    """
    if train and img.dtype == jnp.bfloat16:
        from vqa_attention_networks_tpu.ops import pallas_pooled_fusion as ppf

        if ppf.supported(img.shape[0], w.shape[1], k, img.shape[2]):
            out = ppf.pooled_grid_fuse(img, w, b, q_proj, k)  # [N, L, O] f32
            return dropout(rng, out.astype(img.dtype), dropout_rate, train)

    @jax.checkpoint
    def _fused(img, w, b, q_proj):
        if img.dtype == jnp.bfloat16:
            return grid_fuse_weight_contracted(img, w, b, q_proj, k)
        n = img.shape[0]
        d = img.shape[2]
        o = w.shape[1] // k
        w3 = w.reshape(d, o, k).astype(img.dtype)
        q3 = q_proj.reshape(n, o, k).astype(img.dtype)
        wq = jnp.einsum("dok,nok->ndo", w3, q3)
        bq = jnp.einsum(
            "ok,nok->no", b.reshape(o, k).astype(img.dtype), q3,
            preferred_element_type=jnp.float32,
        )
        pooled = jnp.einsum(
            "nld,ndo->nlo", img, wq, preferred_element_type=jnp.float32,
        ) + bq[:, None, :]
        return signed_sqrt(pooled).astype(img.dtype)

    return dropout(rng, _fused(img, w, b, q_proj), dropout_rate, train)


def two_glimpse_pool(
    att_logits: jnp.ndarray,  # [N, P, G]
    values: jnp.ndarray,  # [N, P, D]
    *,
    uniform_quirk: bool,
) -> jnp.ndarray:
    """Pool ``values`` under G attention glimpses -> [N, G*D] (glimpse-major).

    Matches the reference's per-glimpse loop + concat
    (mfb.py:82-89,116-123; mhb_coAtt.py:84-91,114-121) as a single einsum.
    """
    n, p, g = att_logits.shape
    d = values.shape[-1]
    if uniform_quirk:
        # softmax over a singleton axis == all-ones weights (mfb.py:84,118)
        weights = jnp.ones_like(att_logits)
    else:
        weights = jax.nn.softmax(att_logits, axis=1)
    # accumulate the position sum in (at least) f32 even under bf16 compute;
    # full-precision passes when the compute dtype is f32/f64. The softmax
    # ran in the logits' dtype; the pool runs in the VALUES' dtype (weights
    # cast down under bf16 compute — probabilities lose ~1e-3, the fast path).
    from vqa_attention_networks_tpu.models.layers import matmul_precision

    acc = jnp.promote_types(values.dtype, jnp.float32)
    pooled = jnp.einsum(
        "npg,npd->ngd", weights.astype(values.dtype), values,
        preferred_element_type=acc, precision=matmul_precision(values.dtype),
    )
    return pooled.reshape(n, g * d).astype(values.dtype)
