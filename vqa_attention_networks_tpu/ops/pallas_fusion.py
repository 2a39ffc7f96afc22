"""Fused Pallas TPU kernel for the MFB/MHB image-grid fusion.

The hottest op sequence in the model family (mfb.py:96-104,
mhb_coAtt.py:98-106) is, per sample:

    z     = (img[196, 2048] @ W[2048, 5000] + b) * q_proj[5000]   (Hadamard)
    pool  = z.reshape(196, 1000, 5).sum(-1)                        (k-factor)
    out   = sqrt(relu(pool)) - sqrt(relu(-pool))                   (signed sqrt)

Composed in XLA, the [N, 196, 5000] product round-trips HBM twice
(~7.8 MB/sample/direction). This kernel fuses projection, bias, Hadamard,
k-pool and signed-sqrt in VMEM: HBM sees only the inputs and the 5x smaller
pooled output.

Blocking (grid = (O_tiles, N_tiles), N fastest):
- the fusion axis is re-factored at dispatch into [.., k, O] with the k
  factor on its own (full) sublane axis — Mosaic cannot relayout lanes into
  sublanes, so an in-kernel [.., o*k] -> [.., o, k] reshape is not lowerable;
  instead the pool is k statically-unrolled [NB*196, D] x [D, TO] matmuls
  accumulated in f32 on the VPU;
- W's [D, k, TO] block (bf16) stays resident while the batch streams past it
  (its index map is constant in the fast grid axis), so weight traffic is
  O_tiles * |W| instead of N * |W|;
- measured on TPU v5e at batch 1024: ~1.2x over the XLA-composed chain, and
  ~1.5x less HBM traffic. (A variant that pools via a 0/1 matmul is ~10%
  faster still but routes the f32 product through the MXU's bf16 path,
  losing ~1e-2 relative precision under the signed sqrt — rejected.)

The kernel is inference-only (training inserts dropout *inside* the chain,
mfb.py:99 — the composed XLA path handles that); ``grid_fuse`` dispatches.
The final L2 normalisation stays outside (its axis differs per call site:
flat-grid at mfb.py:105 vs vector at mfb.py:135).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqa_attention_networks_tpu.models.layers import (
    dropout,
    matmul_precision,
    signed_sqrt,
)
from vqa_attention_networks_tpu.ops.pallas_wq_fusion import _interpret_flag
from vqa_attention_networks_tpu.ops.fusion import (
    grid_fuse_weight_contracted,
    mfb_sumpool,
    refactor_output_major,
)

# default tiles: NB*196 rows x TF fusion columns per instance.
# Mosaic requires 128-aligned block minors, and 5000 has no 128-multiple
# divisor, so the dispatcher zero-pads the fusion axis to the next multiple
# of TF (5000 -> 5120): padded columns pool to signed_sqrt(0) = 0 and are
# sliced off. TF = 1280 = 256 outputs * k=5 -> 256-wide aligned output tiles;
# W block = 2048*1280*2B = 5.2 MB in bf16.
_NB = 4
_TF = 1280



def _kernel(img_ref, w_ref, b_ref, q_ref, out_ref, *, k: int):
    # img [NB, L, D]; w [D, k, TO]; b [1, k, TO]; q [NB, k, TO];
    # out [NB, L, TO].  The k factor lives on its own (full) sublane axis, so
    # the pool is k statically-unrolled [NB*L, D]x[D, TO] matmuls summed in
    # f32 — no minor-axis reshapes (Mosaic cannot relayout lanes->sublanes).
    nb, l, d = img_ref.shape
    to = w_ref.shape[2]
    img = img_ref[:].reshape(nb * l, d)  # major-dim merge only
    acc = jnp.zeros((nb, l, to), jnp.float32)
    for j in range(k):
        z = jnp.dot(img, w_ref[:, j, :], preferred_element_type=jnp.float32)
        z = z + b_ref[0, j, :][None, :].astype(jnp.float32)
        z = z.reshape(nb, l, to)  # major-dim split only
        acc += z * q_ref[:, j, :][:, None, :].astype(jnp.float32)
    out_ref[:] = jnp.sqrt(jax.nn.relu(acc)) - jnp.sqrt(jax.nn.relu(-acc))


def _grid_fuse_pallas(
    img: jnp.ndarray,  # [N, L, D]
    w: jnp.ndarray,  # [D, F]
    b: jnp.ndarray,  # [F]
    q_proj: jnp.ndarray,  # [N, F]
    k: int,
    nb: int = _NB,
    tf: int = _TF,
) -> jnp.ndarray:
    n, l, d = img.shape
    f = w.shape[1]
    o = f // k
    to = tf // k  # output tile width
    assert n % nb == 0 and tf % k == 0, (n, nb, tf, k)

    # Re-factor the fusion axis: channel c = o_idx*k + j (output-major,
    # mfb.py:100-101) -> a [.., k, O_pad] layout with the k factor on its own
    # axis and the output axis zero-padded to a multiple of TO. Padded
    # outputs pool to signed_sqrt(0) = 0 and are sliced off below.
    o_pad = -(-o // to) * to

    w3 = refactor_output_major(w.astype(img.dtype), o, k, o_pad)
    b3 = refactor_output_major(b.reshape(1, -1), o, k, o_pad)
    q3 = refactor_output_major(q_proj, o, k, o_pad)  # [N, k, O_pad]

    grid = (o_pad // to, n // nb)  # N fastest => W block resident across batch

    out = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=grid,
        in_specs=[
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
        cost_estimate=pl.CostEstimate(
            flops=2 * n * l * d * k * o_pad,
            bytes_accessed=(n * l * d * img.dtype.itemsize
                            + d * k * o_pad * w3.dtype.itemsize
                            + n * l * o_pad * 4),
            transcendentals=0,
        ),
        interpret=_interpret_flag(),
    )(img, w3, b3, q3)
    return out[..., :o] if o_pad != o else out


def _grid_fuse_reference(
    img: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, q_proj: jnp.ndarray,
    k: int,
    rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    train: bool = False,
) -> jnp.ndarray:
    """XLA-composed oracle (identical semantics, differentiable).

    THE precision policy lives here once: the train dispatch path calls
    this same function with its pre-pool dropout (mfb.py:99) rather than
    repeating the cast/precision sequence."""
    acc = jnp.promote_types(img.dtype, jnp.float32)
    z = jnp.dot(img, w.astype(img.dtype), preferred_element_type=acc,
                precision=matmul_precision(img.dtype))
    z = (z + b.astype(acc)) * q_proj[:, None, :].astype(acc)
    if train and dropout_rate > 0:
        z = dropout(rng, z, dropout_rate, True)
    return signed_sqrt(mfb_sumpool(z, k))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _grid_fuse_tpu(img, w, b, q_proj, k):
    return _grid_fuse_pallas(img, w, b, q_proj, k)


def _grid_fuse_fwd(img, w, b, q_proj, k):
    return _grid_fuse_pallas(img, w, b, q_proj, k), (img, w, b, q_proj)


def _grid_fuse_bwd(k, res, g):
    # Composed-op backward (same graph XLA differentiates for the fallback).
    img, w, b, q_proj = res
    _, vjp = jax.vjp(
        lambda i, ww, bb, qq: _grid_fuse_reference(i, ww, bb, qq, k),
        img, w, b, q_proj,
    )
    return vjp(g)


_grid_fuse_tpu.defvjp(_grid_fuse_fwd, _grid_fuse_bwd)


def pallas_supported(n: int, f: int, k: int = 5, nb: int = _NB,
                     tf: int = _TF) -> bool:
    import os

    if os.environ.get("VQA_DISABLE_PALLAS"):  # A/B kill switch for benchmarks
        return False
    # _dispatch_target: honors the AOT build-box override (a CPU host
    # exporting platforms=["tpu"] must trace the same graph a TPU would)
    # and the VQA_PALLAS_INTERPRET execution proxy
    from vqa_attention_networks_tpu.ops.pallas_wq_fusion import (
        _dispatch_target,
    )

    if not _dispatch_target():
        return False
    # layout contract of the kernel's refactor/BlockSpecs (the assert at
    # _grid_fuse_pallas): reject what cannot compile so the dispatcher
    # falls back instead of crashing under VQA_FORCE_PALLAS
    if f % k or tf % k:
        return False
    return n % nb == 0


def grid_fuse(
    img: jnp.ndarray,  # [N, L, D]
    proj_params: dict,  # {"w": [D, F], "b": [F]}
    q_proj: jnp.ndarray,  # [N, F]
    k: int,
    *,
    rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.1,
    train: bool = False,
    site: str = "prepool",
) -> jnp.ndarray:
    """Dispatching entry: Pallas on TPU at inference, XLA otherwise.

    Training defaults to the reference's dropout site — the pre-pool
    product (mfb.py:99, mhb_coAtt.py:101) — served by the fused train
    kernel on TPU. ``site="pooled"`` (Config.dropout_site) moves the mask
    after the pool, unlocking the weight-contracted formulation for
    training (ops/fusion.py grid_fuse_pooled: ~6.5x fewer fusion FLOPs)."""
    w, b = proj_params["w"], proj_params.get("b")
    if b is None:
        b = jnp.zeros((w.shape[1],), w.dtype)
    if train and site == "pooled":
        from vqa_attention_networks_tpu.ops.fusion import grid_fuse_pooled

        return grid_fuse_pooled(
            img, w, b, q_proj, k, rng=rng, dropout_rate=dropout_rate,
            train=True,
        )
    if train:
        # fused train kernel (in-kernel PRNG dropout, mask replayed in the
        # backward): default on TPU — eliminates the [N, L, F] f32 pre-pool
        # dropout residual, the enabler for batch >=1024 on one chip
        from vqa_attention_networks_tpu.ops import pallas_train_fusion as ptf

        if (
            img.dtype == jnp.bfloat16  # f32 keeps the exact composed
            # semantics in training too (the kernel's MXU passes round to
            # bf16 internally, same policy as the inference branch below)
            and dropout_rate > 0
            and ptf.supported(img.shape[0], dropout_rate, w.shape[1], k)
        ):
            seed = jax.random.randint(
                rng, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32
            )
            return ptf.train_grid_fuse(
                img, w, b, q_proj, seed, k, dropout_rate
            )
        # composed: dropout lands on the pre-pool product (mfb.py:99)
        return _grid_fuse_reference(
            img, w, b, q_proj, k, rng=rng, dropout_rate=dropout_rate,
            train=True,
        )
    if img.dtype == jnp.bfloat16:
        # bf16 speed paths only — float32/float64 compute always takes the
        # exact composed chain below (the kernel's MXU passes round to bf16
        # internally, which would silently break the f32 exactness policy).
        import os

        if not os.environ.get("VQA_FORCE_PALLAS"):
            # weight-contracted formulation: 5x fewer FLOPs, 2x faster than
            # the Pallas kernel (see ops/fusion.py)
            return grid_fuse_weight_contracted(img, w, b, q_proj, k)
        if pallas_supported(img.shape[0], w.shape[1], k):
            from vqa_attention_networks_tpu.ops.pallas_wq_fusion import (
                note_kernel_trace,
            )

            note_kernel_trace()  # feeds aot.py's fast_path_traced metadata
            return _grid_fuse_tpu(img, w, b, q_proj, k)
    return _grid_fuse_reference(img, w, b, q_proj, k)
