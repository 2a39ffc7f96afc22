"""Fused Pallas TPU kernels for the TRAINING-mode grid fusion.

The training chain (mfb.py:96-104 with the dropout at mfb.py:99) is

    z      = (img @ W + b) * q          [N, L, F]
    zd     = dropout(z, rate)           mask on the pre-pool product
    pooled = k-pool(zd)                 [N, L, O]
    out    = signed_sqrt(pooled)

Composed in XLA, z (and its dropout mask) materialise in HBM as the
backward residual — 1.3 GB at batch 256 — and the mask costs a
250M-element threefry draw per step. Here:

- the FORWARD kernel draws the mask with the on-core PRNG
  (``pltpu.prng_seed`` / ``prng_random_bits``) and never writes z or the
  mask to HBM; the only residual is the kernel's own output
  (signed_sqrt is invertible: d out/d pooled = 0.5/|out|);
- the BACKWARD replays the identical mask from the same per-instance seed
  (same draw order), in two kernels whose grid orders match their
  accumulation patterns: d_img accumulates over output tiles (o fastest),
  d_W/d_b accumulate over batch tiles (n fastest); d_q falls out of the
  d_W/d_b pass (it needs the recomputed pre-Hadamard z0).

Layout follows ops/pallas_fusion.py: the fusion axis is re-factored to
[.., k, O_pad] with the k factor on its own sublane axis.

Seeding: instance (oi, ni) uses ``seed + oi * 2^16 + ni`` and draws k masks
in j order — identical in forward and both backward kernels, so the mask
replays bit-exactly. A fixed seed + shapes -> deterministic masks, which
also makes ``jax.test_util.check_grads``-style finite differences valid.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NB = 4
_TF = 1280


from vqa_attention_networks_tpu.ops.fusion import (
    refactor_output_major as _refactor,
)


def _mask(shape, thr_keep: int):
    bits = pltpu.prng_random_bits(shape)
    return (pltpu.bitcast(bits, jnp.uint32) < jnp.uint32(thr_keep)).astype(
        jnp.float32
    )


def _seed_for(oi, ni, seed_ref):
    return seed_ref[0] + oi * 65536 + ni


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, img_ref, w_ref, b_ref, q_ref, out_ref,
                *, k: int, thr_keep: int, inv_keep: float):
    nb, l, d = img_ref.shape
    to = w_ref.shape[2]
    oi = pl.program_id(0)
    ni = pl.program_id(1)
    pltpu.prng_seed(_seed_for(oi, ni, seed_ref))

    img = img_ref[:].reshape(nb * l, d)
    acc = jnp.zeros((nb, l, to), jnp.float32)
    for j in range(k):
        z = jnp.dot(img, w_ref[:, j, :], preferred_element_type=jnp.float32)
        z = z + b_ref[0, j, :][None, :].astype(jnp.float32)
        z = z.reshape(nb, l, to) * q_ref[:, j, :][:, None, :].astype(
            jnp.float32
        )
        if inv_keep == 1.0:  # rate == 0: exactness-test path, no draws
            acc += z
        else:
            m = _mask((nb, l, to), thr_keep)
            acc += z * (m * inv_keep)
    out_ref[:] = jnp.sqrt(jax.nn.relu(acc)) - jnp.sqrt(jax.nn.relu(-acc))


# ---------------------------------------------------------------------------
# backward 1: d_img (grid n-major so the d_img block accumulates over o tiles)
# ---------------------------------------------------------------------------

def _bwd_img_kernel(seed_ref, g_ref, out_ref_res, w_ref, q_ref, dimg_ref,
                    *, k: int, thr_keep: int, inv_keep: float):
    nb, l, d = dimg_ref.shape
    to = w_ref.shape[2]
    ni = pl.program_id(0)  # slow
    oi = pl.program_id(1)  # fast -> dimg block revisited consecutively
    pltpu.prng_seed(_seed_for(oi, ni, seed_ref))

    # d pooled = g * 0.5 / |out| (signed_sqrt'), |out| = sqrt(|pooled|).
    # At pooled == 0 the composed chain's gradient is exactly 0 (jax.nn.relu
    # defines relu'(0) = 0) — and pooled IS exactly 0 wherever dropout
    # removed all k factors (p = rate^k per element, ~1e3 events per batch
    # at rate 0.1). A clamped 1/|out| would inject ~5e19-scaled spikes
    # there (observed: upstream grad norms blew up 1e10x).
    out = out_ref_res[:]
    g_pooled = g_ref[:] * jnp.where(
        out == 0.0, 0.0, 0.5 / jnp.maximum(jnp.abs(out), 1e-20)
    )

    @pl.when(oi == 0)
    def _():
        dimg_ref[:] = jnp.zeros_like(dimg_ref)

    acc = jnp.zeros((nb * l, d), jnp.float32)
    for j in range(k):
        if inv_keep == 1.0:
            g_z = g_pooled * q_ref[:, j, :][:, None, :].astype(jnp.float32)
        else:
            m = _mask((nb, l, to), thr_keep)  # identical draw order as fwd
            g_z = g_pooled * (m * inv_keep) * q_ref[:, j, :][:, None, :].astype(
                jnp.float32
            )
        # contract the to axis with W's to axis -> [nb*l, D]
        acc += jax.lax.dot_general(
            g_z.reshape(nb * l, to), w_ref[:, j, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dimg_ref[:] += acc.reshape(nb, l, d).astype(dimg_ref.dtype)


# ---------------------------------------------------------------------------
# backward 2: d_W, d_b, d_q (grid o-major so d_W/d_b accumulate over n tiles)
# ---------------------------------------------------------------------------

def _bwd_w_kernel(seed_ref, g_ref, out_ref_res, img_ref, w_ref, b_ref, q_ref,
                  dw_ref, db_ref, dq_ref,
                  *, k: int, thr_keep: int, inv_keep: float):
    nb, l, d = img_ref.shape
    to = w_ref.shape[2]
    oi = pl.program_id(0)  # slow
    ni = pl.program_id(1)  # fast -> dw/db blocks revisited consecutively
    pltpu.prng_seed(_seed_for(oi, ni, seed_ref))

    out = out_ref_res[:]
    # zero where pooled == 0, matching relu'(0) = 0 (see _bwd_img_kernel)
    g_pooled = g_ref[:] * jnp.where(
        out == 0.0, 0.0, 0.5 / jnp.maximum(jnp.abs(out), 1e-20)
    )

    @pl.when(ni == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    img = img_ref[:].reshape(nb * l, d)
    for j in range(k):
        if inv_keep == 1.0:
            g_zd = g_pooled
        else:
            m = _mask((nb, l, to), thr_keep)
            g_zd = g_pooled * (m * inv_keep)  # [nb, l, to]
        q_j = q_ref[:, j, :][:, None, :].astype(jnp.float32)
        g_prod = (g_zd * q_j).reshape(nb * l, to)  # grad wrt (img W + b)
        # d_W[:, j, :] += img^T @ g_prod  (contract the nb*l axes)
        dw_ref[:, j, :] += jax.lax.dot_general(
            img, g_prod,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dw_ref.dtype)
        db_ref[:, j, :] += jnp.sum(
            g_prod, axis=0, keepdims=True
        ).astype(db_ref.dtype)
        # d_q needs z0 = img W + b (recomputed, never stored)
        z0 = jnp.dot(img, w_ref[:, j, :], preferred_element_type=jnp.float32)
        z0 = z0 + b_ref[0, j, :][None, :].astype(jnp.float32)
        dq_ref[:, j, :] = jnp.sum(
            g_zd * z0.reshape(nb, l, to), axis=1
        ).astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wiring
# ---------------------------------------------------------------------------

def _prep(img, w, b, q_proj, k, nb, tf):
    n, l, d = img.shape
    f = w.shape[1]
    o = f // k
    to = tf // k
    o_pad = -(-o // to) * to
    w3 = _refactor(w.astype(img.dtype), o, k, o_pad)
    b3 = _refactor(b.reshape(1, -1), o, k, o_pad)
    q3 = _refactor(q_proj, o, k, o_pad)
    return w3, b3, q3, o, to, o_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def train_grid_fuse(img, w, b, q_proj, seed, k: int, rate: float):
    """dropout(z, rate) fused into the grid-fusion chain; ``seed`` is an
    int32 scalar array (fold the step counter in for fresh masks)."""
    out, _ = _train_fwd(img, w, b, q_proj, seed, k, rate)
    return out


def _run_fwd(img, w3, b3, q3, seed, k, rate, o, to, o_pad, nb):
    n, l, d = img.shape
    thr_keep = min(int((1.0 - rate) * 4294967296.0), 4294967295)
    inv_keep = 1.0 / (1.0 - rate)
    grid = (o_pad // to, n // nb)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, thr_keep=thr_keep,
                          inv_keep=inv_keep),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
            pl.BlockSpec((nb, l, d), lambda oi, ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k, to), lambda oi, ni: (0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, to), lambda oi, ni: (0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, k, to), lambda oi, ni: (ni, 0, oi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, l, to), lambda oi, ni: (ni, 0, oi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, l, o_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed.reshape(1), img, w3, b3, q3)
    return out


def _train_fwd(img, w, b, q_proj, seed, k, rate):
    nb, tf = _NB, _TF
    w3, b3, q3, o, to, o_pad = _prep(img, w, b, q_proj, k, nb, tf)
    out_pad = _run_fwd(img, w3, b3, q3, seed, k, rate, o, to, o_pad, nb)
    out = out_pad[..., :o] if o_pad != o else out_pad
    return out, (img, w, b, q_proj, seed, out_pad)


def _train_bwd(k, rate, res, g):
    img, w, b, q_proj, seed, out_pad = res
    nb, tf = _NB, _TF
    n, l, d = img.shape
    f = w.shape[1]
    w3, b3, q3, o, to, o_pad = _prep(img, w, b, q_proj, k, nb, tf)
    thr_keep = min(int((1.0 - rate) * 4294967296.0), 4294967295)
    inv_keep = 1.0 / (1.0 - rate)
    g_pad = (
        jnp.pad(g, ((0, 0), (0, 0), (0, o_pad - o))) if o_pad != o else g
    ).astype(jnp.float32)

    # --- d_img: grid (n, o) with o fastest -------------------------------
    dimg = pl.pallas_call(
        functools.partial(_bwd_img_kernel, k=k, thr_keep=thr_keep,
                          inv_keep=inv_keep),
        grid=(n // nb, o_pad // to),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nb, l, to), lambda ni, oi: (ni, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, l, to), lambda ni, oi: (ni, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k, to), lambda ni, oi: (0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, k, to), lambda ni, oi: (ni, 0, oi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, l, d), lambda ni, oi: (ni, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, l, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed.reshape(1), g_pad, out_pad, w3, q3)

    # --- d_W, d_b, d_q: grid (o, n) with n fastest ------------------------
    dw3, db3, dq3 = pl.pallas_call(
        functools.partial(_bwd_w_kernel, k=k, thr_keep=thr_keep,
                          inv_keep=inv_keep),
        grid=(o_pad // to, n // nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nb, l, to), lambda oi, ni: (ni, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, l, to), lambda oi, ni: (ni, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, l, d), lambda oi, ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k, to), lambda oi, ni: (0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, to), lambda oi, ni: (0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, k, to), lambda oi, ni: (ni, 0, oi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d, k, to), lambda oi, ni: (0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, to), lambda oi, ni: (0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, k, to), lambda oi, ni: (ni, 0, oi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((d, k, o_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, k, o_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, k, o_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed.reshape(1), g_pad, out_pad, img, w3, b3, q3)

    def _unfactor(x3):  # [..., k, O_pad] -> [..., F]
        x3 = x3[..., :o]
        return jnp.swapaxes(x3, -1, -2).reshape(*x3.shape[:-2], o * k)

    import numpy as np

    dimg = dimg.astype(img.dtype)
    dw = _unfactor(dw3).astype(w.dtype)
    db = _unfactor(db3)[0].astype(b.dtype)
    dq = _unfactor(dq3).astype(q_proj.dtype)
    # integer input -> float0 cotangent
    dseed = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return dimg, dw, db, dq, dseed


train_grid_fuse.defvjp(
    lambda img, w, b, q, seed, k, rate: _train_fwd(img, w, b, q, seed, k, rate),
    _train_bwd,
)


def supported(n: int, rate: float, f: Optional[int] = None,
              k: Optional[int] = None, nb: int = _NB) -> bool:
    """Default-on for TPU training (burned in round 2): speed parity with
    the composed chain at batch 512 (92.0 vs 92.8 ms/step) and, because it
    eliminates the [N, 196, 5000] f32 pre-pool dropout residual, it is the
    only path that FITS at batch 1024 on a 16 GB v5e (composed:
    RESOURCE_EXHAUSTED; fused: 173.9 ms/step). ``VQA_DISABLE_PALLAS``
    remains the kill switch; ``VQA_COMPOSED_TRAIN_FUSION`` forces the
    composed chain."""
    import os

    if os.environ.get("VQA_DISABLE_PALLAS"):
        return False
    if os.environ.get("VQA_COMPOSED_TRAIN_FUSION"):
        return False
    if f is not None and k is not None:
        # layout contract of _prep/BlockSpecs: the in-kernel O tile is
        # _TF//k and must be lane-aligned, and F must split evenly into
        # k factors — otherwise Mosaic rejects the kernel at compile time
        # where the composed fallback would have worked
        if f % k or _TF % k or (_TF // k) % 128:
            return False
    return (
        jax.default_backend() == "tpu" and n % nb == 0 and 0.0 < rate < 1.0
    )
