"""Fused Pallas TPU kernels for the POOLED-site training grid fusion.

``Config.dropout_site="pooled"`` (the opt-in fast-train mode) moves the
dropout mask AFTER the k-pool + signed sqrt, which makes the fusion chain
up to the mask identical to the inference math (ops/fusion.py
grid_fuse_pooled):

    wq[n,d,o] = sum_j W[d, o*k+j] * q[n, o*k+j]     (contract q into W)
    bq[n,o]   = sum_j b[o*k+j]    * q[n, o*k+j]
    pooled    = img[n] @ wq[n] + bq[n]              (one MXU matmul)
    out       = signed_sqrt(pooled)                 [N, L, O]
    (dropout + the site-specific L2 happen OUTSIDE, in XLA)

Composed in XLA that materialises the per-sample contracted weights
``wq [N, D, O]`` in HBM — 4.3 GB bf16 at batch 1024 — once in the
forward and again in the backward (the ``jax.checkpoint`` recompute),
plus the ``d_wq`` gradient tensor: the measured r5 pooled step is ~19%
MFU with the rest in exactly this traffic (docs/ARCHITECTURE.md
"Training-step roofline", ``train_pooled_attrib``).

These kernels apply the inference wq-kernel's trick (pallas_wq_fusion.py)
to the TRAINING direction: the whole refactored weight stays resident in
VMEM (k-MAJOR ``[k, D, O_pad]`` — a ``[D, k, O]`` layout makes the
j-slice a strided sublane extraction, measured 8x slower), ``wq`` is
rebuilt per sample in VMEM f32 tiles, and neither ``wq`` nor ``d_wq``
ever exists in HBM:

- FORWARD: one grid instance per sample; O tiled inside; emits the
  f32 signed-sqrt output (the only residual — signed_sqrt is invertible,
  d out/d pooled = 0.5/|out| with the relu'(0)=0 guard, exactly the
  policy of ops/pallas_train_fusion.py).
- BACKWARD d_img: per-sample instance; rebuilds wq and contracts the O
  axis back: d_img[n] = g_pooled[n] @ wq[n]^T.
- BACKWARD d_W/d_b/d_q: grid (O tiles, N) with N fastest so the d_W/d_b
  blocks accumulate over consecutive batch revisits; per (tile, sample)
  it computes d_wq = img^T @ g_pooled in VMEM and immediately contracts
  it with q (-> d_W) and with W (-> d_q), so d_wq dies in registers.

SPMD: a bare pallas_call is REPLICATED by the partitioner under a
batch-sharded jit (every chip recomputes the whole batch — correct but
unscaled; verified on the emulated mesh). Each of the three kernels is
therefore wrapped in ``custom_partitioning`` declaring the batch axis
shardable; the d_W/d_b outputs are partial sums over the local shard, so
that wrapper's lowering inserts the ``psum`` over the batch mesh axes —
the same all-reduce XLA emits for every other weight gradient under DP.
``tests/test_pooled_fusion.py`` pins 1-device vs sharded-mesh gradient
equality (interpret mode).

Unlike the pre-pool train kernel there is NO in-kernel PRNG (the mask
lives outside on the pooled map), so these kernels also run under the
Pallas interpreter for CPU parity tests.

No reference counterpart: the reference trains the pre-pool site only
(mfb.py:99, mhb_coAtt.py:101); this is TPU-first speed work for the
documented opt-in regulariser (Config.dropout_site).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec

from vqa_attention_networks_tpu.ops.fusion import refactor_output_major

_LANE = 128
_TO_FWD = 1024  # in-kernel O tile: wq temporary [D, to] f32 stays <= 8 MB
_TO_BWD_W = 512  # d_W pass: the [k, D, to] f32 accumulator is the big block


def _pick_tile(o_pad: int, cap: int) -> int:
    to = min(cap, o_pad)
    while o_pad % to:  # o_pad is a multiple of _LANE, terminates at 128
        to //= 2
    return to


def _signed_sqrt_bwd(g, out):
    """d pooled from d out: g * 0.5/|out|, exactly 0 where out == 0
    (relu'(0) = 0 in the composed chain; see pallas_train_fusion.py for
    why a clamped 1/|out| is wrong)."""
    return g * jnp.where(out == 0.0, 0.0, 0.5 / jnp.maximum(jnp.abs(out),
                                                            1e-20))


# ---------------------------------------------------------------------------
# forward: grid (n,), whole weight resident
# ---------------------------------------------------------------------------

def _fwd_kernel(img_ref, w_ref, b_ref, q_ref, out_ref, *, k: int, to: int):
    # img [1, L, D] bf16; w [k, D, O_pad] bf16 (resident, constant index
    # map); b [k, 1, O_pad] f32 (resident); q [1, k, O_pad] bf16;
    # out [1, L, O_pad] f32
    d = w_ref.shape[1]
    o = w_ref.shape[2]
    img = img_ref[0]
    for oi in range(o // to):
        sl = slice(oi * to, (oi + 1) * to)
        wq = jnp.zeros((d, to), jnp.float32)
        bq = jnp.zeros((1, to), jnp.float32)
        for j in range(k):
            qj = q_ref[0, j, sl].astype(jnp.float32)  # [to]
            wq += w_ref[j, :, sl].astype(jnp.float32) * qj[None, :]
            bq += b_ref[j, :, sl] * qj[None, :]
        pooled = jnp.dot(
            img, wq.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        ) + bq  # [L, to]
        out_ref[0, :, sl] = (
            jnp.sqrt(jax.nn.relu(pooled)) - jnp.sqrt(jax.nn.relu(-pooled))
        )


# ---------------------------------------------------------------------------
# backward 1: d_img — grid (n,), rebuild wq, contract the O axis back
# ---------------------------------------------------------------------------

def _bwd_img_kernel(g_ref, out_res_ref, w_ref, q_ref, dimg_ref,
                    *, k: int, to: int):
    # g [1, L, O_pad] f32; out_res [1, L, O_pad] f32; w [k, D, O_pad] bf16
    # (resident); q [1, k, O_pad] bf16; dimg [1, L, D] f32
    d = w_ref.shape[1]
    o = w_ref.shape[2]
    l = g_ref.shape[1]
    g_pooled = _signed_sqrt_bwd(g_ref[0], out_res_ref[0])  # [L, O_pad] f32
    acc = jnp.zeros((l, d), jnp.float32)
    for oi in range(o // to):
        sl = slice(oi * to, (oi + 1) * to)
        wq = jnp.zeros((d, to), jnp.float32)
        for j in range(k):
            qj = q_ref[0, j, sl].astype(jnp.float32)
            wq += w_ref[j, :, sl].astype(jnp.float32) * qj[None, :]
        # d_img += g_pooled[:, sl] @ wq^T  (contract the O tile)
        acc += jax.lax.dot_general(
            g_pooled[:, sl].astype(jnp.bfloat16), wq.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dimg_ref[0] = acc


# ---------------------------------------------------------------------------
# backward 2: d_W, d_b, d_q — grid (o_tiles, n), n fastest; d_wq stays in VMEM
# ---------------------------------------------------------------------------

def _bwd_w_kernel(g_ref, out_res_ref, img_ref, w_ref, b_ref, q_ref,
                  dw_ref, db_ref, dq_ref, *, k: int):
    # blocks per (oi, ni): g/out_res [1, L, to] f32; img [1, L, D] bf16;
    # w [k, D, to] bf16; b [k, 1, to] f32; q [1, k, to] bf16;
    # dw [k, D, to] f32 (accumulates over n); db [k, 1, to] f32 (same);
    # dq [1, k, to] f32 (per sample)
    ni = pl.program_id(1)  # fast -> dw/db blocks revisited consecutively
    g_pooled = _signed_sqrt_bwd(g_ref[0], out_res_ref[0])  # [L, to] f32

    @pl.when(ni == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    # d_wq = img^T @ g_pooled  -> [D, to], never leaves VMEM
    d_wq = jax.lax.dot_general(
        img_ref[0], g_pooled.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d_bq = jnp.sum(g_pooled, axis=0, keepdims=True)  # [1, to]
    for j in range(k):
        qj = q_ref[0, j, :].astype(jnp.float32)  # [to]
        dw_ref[j] += d_wq * qj[None, :]
        db_ref[j] += d_bq * qj[None, :]
        # d_q[j] = sum_d d_wq * W[j] + d_bq * b[j]
        dq_ref[0, j, :] = (
            jnp.sum(d_wq * w_ref[j].astype(jnp.float32), axis=0)
            + d_bq[0] * b_ref[j, 0, :]
        )


# ---------------------------------------------------------------------------
# per-shard wrappers around the pallas_calls (raw tensor spaces in and out)
# ---------------------------------------------------------------------------

def _prep(dtype, w, b, q_proj, k):
    f = w.shape[1]
    o = f // k
    o_pad = -(-o // _LANE) * _LANE
    # shared output-major k-refactor (ops/fusion.py); k MAJOR for w/b so the
    # in-kernel j-slice is a contiguous [D, O] slab
    w3 = jnp.moveaxis(
        refactor_output_major(w.astype(dtype), o, k, o_pad), 1, 0
    )  # [k, D, O_pad]
    b3 = jnp.moveaxis(
        refactor_output_major(b.reshape(1, -1).astype(jnp.float32), o, k,
                              o_pad), 1, 0
    )  # [k, 1, O_pad] f32
    q3 = refactor_output_major(q_proj.astype(dtype), o, k, o_pad)
    return w3, b3, q3, o, o_pad


def _pad_o(x, o, o_pad):
    # the sliced-away O padding was exactly 0 (zero-padded w/b/q), so
    # re-padding g and the residual with zeros reconstructs the kernel
    # tensors bit-exactly
    if o_pad == o:
        return x.astype(jnp.float32)
    return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (0, o_pad - o)))


def _fwd_local(img, w, b, q_proj, k):
    n, l, d = img.shape
    w3, b3, q3, o, o_pad = _prep(img.dtype, w, b, q_proj, k)
    to = _pick_tile(o_pad, _TO_FWD)
    out_pad = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, to=to),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d, o_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, o_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, o_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, o_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, l, o_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * l * d * o_pad + 2 * n * d * o_pad * k,
            bytes_accessed=(n * l * d * 2 + d * k * o_pad * 2
                            + n * l * o_pad * 4),
            transcendentals=0,
        ),
        interpret=_interpret_flag(),
    )(img, w3, b3, q3)
    return out_pad[..., :o] if o_pad != o else out_pad


def _dimg_local(g, out, w, q_proj, k):
    n, l, _ = g.shape
    d = w.shape[0]
    w3, _, q3, o, o_pad = _prep(q_proj.dtype, w,
                                jnp.zeros((w.shape[1],), jnp.float32),
                                q_proj, k)
    g_pad = _pad_o(g, o, o_pad)
    out_pad = _pad_o(out, o, o_pad)
    to = _pick_tile(o_pad, _TO_FWD)
    return pl.pallas_call(
        functools.partial(_bwd_img_kernel, k=k, to=to),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, l, o_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, o_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d, o_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, o_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, l, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * l * d * o_pad + 2 * n * d * o_pad * k,
            bytes_accessed=(2 * n * l * o_pad * 4 + d * k * o_pad * 2
                            + n * l * d * 4),
            transcendentals=0,
        ),
        interpret=_interpret_flag(),
    )(g_pad, out_pad, w3, q3)


def _dww_local(g, out, img, w, b, q_proj, k):
    """Per-shard d_W/d_b/d_q in raw spaces (f32). Under DP, d_W and d_b
    are PARTIAL sums over the local batch shard — the partitioned wrapper
    psums them."""
    n, l, d = img.shape
    w3, b3, q3, o, o_pad = _prep(img.dtype, w, b, q_proj, k)
    g_pad = _pad_o(g, o, o_pad)
    out_pad = _pad_o(out, o, o_pad)
    to_w = _pick_tile(o_pad, _TO_BWD_W)
    dw3, db3, dq3 = pl.pallas_call(
        functools.partial(_bwd_w_kernel, k=k),
        grid=(o_pad // to_w, n),
        in_specs=[
            pl.BlockSpec((1, l, to_w), lambda oi, ni: (ni, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, to_w), lambda oi, ni: (ni, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda oi, ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d, to_w), lambda oi, ni: (0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, to_w), lambda oi, ni: (0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, to_w), lambda oi, ni: (ni, 0, oi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((k, d, to_w), lambda oi, ni: (0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, to_w), lambda oi, ni: (0, 0, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, to_w), lambda oi, ni: (ni, 0, oi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, d, o_pad), jnp.float32),
            jax.ShapeDtypeStruct((k, 1, o_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, k, o_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * l * d * o_pad + 6 * n * d * o_pad * k,
            bytes_accessed=(2 * n * l * o_pad * 4
                            + (o_pad // to_w) * n * l * d * 2
                            + 2 * d * k * o_pad * 4),
            transcendentals=0,
        ),
        interpret=_interpret_flag(),
    )(g_pad, out_pad, img, w3, b3, q3)

    # un-refactor back to the reference's output-major F axis
    def _unfactor_kmajor(x3):  # [k, ..., O_pad] -> [..., F=o*k]
        x3 = jnp.moveaxis(x3[..., :o], 0, -1)  # [..., o, k]
        return x3.reshape(*x3.shape[:-2], o * k)

    def _unfactor(x3):  # [..., k, O_pad] -> [..., F]
        x3 = jnp.swapaxes(x3[..., :o], -1, -2)
        return x3.reshape(*x3.shape[:-2], o * k)

    return _unfactor_kmajor(dw3), _unfactor_kmajor(db3)[0], _unfactor(dq3)


# ---------------------------------------------------------------------------
# SPMD partitioning: declare the batch axis shardable; psum the weight grads
# ---------------------------------------------------------------------------

def _shardings(mesh, arg_shapes, batched, ranks, out_ranks, reduced=()):
    """Build (args, outs) NamedShardings: dim 0 of ``batched`` operand
    indices (and of every output not in ``reduced``) follows operand 0's
    dim-0 spec; everything else replicates. Returns the batch spec too so
    the partition lowering knows which mesh axes to psum over."""
    spec0 = arg_shapes[0].sharding.spec
    batch = spec0[0] if len(spec0) else None

    def bsh(rank):
        return NamedSharding(mesh,
                             PartitionSpec(batch, *([None] * (rank - 1))))

    def rsh(rank):
        return NamedSharding(mesh, PartitionSpec(*([None] * rank)))

    args = tuple(
        bsh(r) if i in batched else rsh(r) for i, r in enumerate(ranks)
    )
    outs = tuple(
        rsh(r) if i in reduced else bsh(r) for i, r in enumerate(out_ranks)
    )
    return batch, args, outs


def _batch_axes(batch):
    if batch is None:
        return ()
    return batch if isinstance(batch, tuple) else (batch,)


@functools.lru_cache(maxsize=None)
def _fwd_part(k: int):
    def run(img, w, b, q_proj):
        return _fwd_local(img, w, b, q_proj, k)

    cp = custom_partitioning(run)
    cfgs = dict(batched=(0, 3), ranks=(3, 2, 1, 2), out_ranks=(3,))

    def partition(mesh, arg_shapes, result_shape):
        _, args, outs = _shardings(mesh, arg_shapes, **cfgs)
        return mesh, run, outs[0], args

    def infer(mesh, arg_shapes, result_shape):
        _, _, outs = _shardings(mesh, arg_shapes, **cfgs)
        return outs[0]

    cp.def_partition(
        partition=partition, infer_sharding_from_operands=infer,
        sharding_rule="n a b, e f, g, n h -> n i j",
        need_replication_factors=("a", "b", "e", "f", "g", "h", "i", "j"),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _dimg_part(k: int):
    def run(g, out, w, q_proj):
        return _dimg_local(g, out, w, q_proj, k)

    cp = custom_partitioning(run)
    cfgs = dict(batched=(0, 1, 3), ranks=(3, 3, 2, 2), out_ranks=(3,))

    def partition(mesh, arg_shapes, result_shape):
        _, args, outs = _shardings(mesh, arg_shapes, **cfgs)
        return mesh, run, outs[0], args

    def infer(mesh, arg_shapes, result_shape):
        _, _, outs = _shardings(mesh, arg_shapes, **cfgs)
        return outs[0]

    cp.def_partition(
        partition=partition, infer_sharding_from_operands=infer,
        sharding_rule="n a b, n c d, e f, n g -> n h i",
        need_replication_factors=("a", "b", "c", "d", "e", "f", "g", "h",
                                  "i"),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _dww_part(k: int):
    def run(g, out, img, w, b, q_proj):
        return _dww_local(g, out, img, w, b, q_proj, k)

    cp = custom_partitioning(run)
    cfgs = dict(batched=(0, 1, 2, 5), ranks=(3, 3, 3, 2, 1, 2),
                out_ranks=(2, 1, 2), reduced=(0, 1))

    def partition(mesh, arg_shapes, result_shape):
        batch, args, outs = _shardings(mesh, arg_shapes, **cfgs)
        axes = _batch_axes(batch)

        def lower(g, out, img, w, b, q_proj):
            dw, db, dq = run(g, out, img, w, b, q_proj)
            # d_W/d_b are partial sums over the local batch shard: the
            # cross-shard reduction is the SAME all-reduce XLA emits for
            # every other weight gradient under data parallelism
            for ax in axes:
                dw = jax.lax.psum(dw, ax)
                db = jax.lax.psum(db, ax)
            return dw, db, dq

        return mesh, lower, outs, args

    def infer(mesh, arg_shapes, result_shape):
        _, _, outs = _shardings(mesh, arg_shapes, **cfgs)
        return outs

    cp.def_partition(
        partition=partition, infer_sharding_from_operands=infer,
        # dw/db carry only replicated factors: the batch reduction is done
        # by the explicit psum in ``lower`` above, and the returned
        # out_shardings declare them replicated
        sharding_rule="n a b, n c d, n e f, g h, i, n j -> p q, r, n s",
        need_replication_factors=("a", "b", "c", "d", "e", "f", "g", "h",
                                  "i", "j", "p", "q", "r", "s"),
    )
    return cp


# ---------------------------------------------------------------------------
# custom-VJP entry point
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pooled_grid_fuse(img, w, b, q_proj, k: int):
    """signed_sqrt(k-pool((img@W + b) * q)) with wq/d_wq VMEM-resident.

    Returns the f32 ``[N, L, O]`` pooled map (the call site applies the
    pooled-site dropout and the compute-dtype cast; grid_fuse_pooled)."""
    out, _ = _pooled_fwd(img, w, b, q_proj, k)
    return out


def _pooled_fwd(img, w, b, q_proj, k):
    out = _fwd_part(k)(img, w, b, q_proj)
    return out, (img, w, b, q_proj, out)


def _pooled_bwd(k, res, g):
    img, w, b, q_proj, out = res
    g = g.astype(jnp.float32)
    dimg = _dimg_part(k)(g, out, w, q_proj)
    dw, db, dq = _dww_part(k)(g, out, img, w, b, q_proj)
    return (dimg.astype(img.dtype), dw.astype(w.dtype), db.astype(b.dtype),
            dq.astype(q_proj.dtype))


pooled_grid_fuse.defvjp(
    lambda img, w, b, q, k: _pooled_fwd(img, w, b, q, k),
    _pooled_bwd,
)


def _interpret_flag() -> bool:
    """Interpret whenever we are not lowering for a real TPU target (the
    same policy as pallas_wq_fusion._interpret_flag, without the AOT
    override — the train path is never exported)."""
    from vqa_attention_networks_tpu.ops.pallas_wq_fusion import (
        _interpret_flag as wq_flag,
    )

    return wq_flag()


def supported(n: int, f: Optional[int] = None, k: Optional[int] = None,
              d: Optional[int] = None) -> bool:
    """Dispatch gate for the pooled-site train kernels (grid_fuse_pooled).

    TPU-only by default (``VQA_PALLAS_INTERPRET=1`` opens the gate for the
    CPU interpret proxy, like the inference kernels).
    ``VQA_DISABLE_PALLAS`` is the process-wide kill switch;
    ``VQA_COMPOSED_POOLED_FUSION`` forces the composed XLA pooled chain."""
    if os.environ.get("VQA_DISABLE_PALLAS"):
        return False
    if os.environ.get("VQA_COMPOSED_POOLED_FUSION"):
        return False
    from vqa_attention_networks_tpu.ops.pallas_wq_fusion import (
        interpret_proxy,
    )

    if not (jax.default_backend() == "tpu" or interpret_proxy()):
        return False
    if f is not None and k is not None:
        if k <= 0 or f % k:
            return False
        if d is not None:
            o_pad = -(-(f // k) // _LANE) * _LANE
            # resident weight (bf16) + the [k, D, to] f32 d_W accumulator
            # must fit beside the streamed blocks in the 128 MB VMEM
            to_w = _pick_tile(o_pad, _TO_BWD_W)
            resident = k * d * o_pad * 2
            dw_block = k * d * to_w * 4
            if max(resident, dw_block + k * d * to_w * 2) > 80 * 1024 * 1024:
                return False
    return n >= 1
