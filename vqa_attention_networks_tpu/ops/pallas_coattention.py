"""Fused Pallas TPU kernel for the parallel co-attention core.

The hieCoAtten affinity block (SURVEY §7.4; hieCoAtten.py:30-49):

    C   = tanh(Cq . Cv^T)                          [T, L]   affinity
    Hv  = tanh(img_w + C^T . que_w)                [L, E]
    Hq  = tanh(que_w + C  . img_w)                 [T, E]
    av  = softmax(Hv . whv, axis=L);  v = av^T . img   [E]
    aq  = softmax(Hq . whq, axis=T);  q = aq^T . que   [E]

Everything for one sample fits in VMEM (L=196, T=22, E=512: ~1 MB of
activations), so the whole core — five contractions, two tanh maps, two
softmaxes and two attention pools — runs per batch-block without touching
HBM between ops. Mosaic notes: every product is a ``dot_general`` with
explicit contracting dims (no transposes materialise), reductions stay 2D,
and the attention maps are emitted as [N, P, 1] (no row/column relayout).

The fc_Whv/fc_Whq biases are scalars added uniformly to every position
(hieCoAtten.py:14-15): softmax is shift-invariant, so they are dropped —
exactly.

Returns (v, q, av, aq) like the reference forward (hieCoAtten.py:55). The
composed twin in models/hiecoatten.py remains the oracle, the f32 path and
the differentiable path; this kernel serves bf16 inference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqa_attention_networks_tpu.ops.pallas_wq_fusion import _interpret_flag

_NB = 8



def _dg(a, b, dims, out_dtype=jnp.float32):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=out_dtype,
    )


def _kernel(img_ref, que_ref, cv_ref, cq_ref, imgw_ref, quew_ref,
            whv_ref, whq_ref, v_ref, q_ref, av_ref, aq_ref):
    # img [NB, L, E]; que [NB, T, E]; cv/imgw like img; cq/quew like que;
    # whv/whq [E, 1]; out: v/q [NB, E], av [NB, L, 1], aq [NB, T, 1]
    nb = img_ref.shape[0]
    f32 = jnp.float32

    for i in range(nb):  # static unroll over the sample block
        dt = cv_ref.dtype
        cv = cv_ref[i]  # [L, E]
        cq = cq_ref[i]  # [T, E]
        # affinity: contract the E axes -> [T, L] (hieCoAtten.py:32)
        c = jnp.tanh(_dg(cq, cv, ((1,), (1,)))).astype(dt)

        img_w = imgw_ref[i]  # [L, E]
        que_w = quew_ref[i]  # [T, E]

        # Hv: contract C's T axis with que_w's T axis -> [L, E]
        hv = jnp.tanh(
            img_w.astype(f32) + _dg(c, que_w, ((0,), (0,)))
        ).astype(dt)
        # Hq: contract C's L axis with img_w's L axis -> [T, E]
        hq = jnp.tanh(
            que_w.astype(f32) + _dg(c, img_w, ((1,), (0,)))
        ).astype(dt)

        av = jax.nn.softmax(_dg(hv, whv_ref[:], ((1,), (0,))), axis=0)
        aq = jax.nn.softmax(_dg(hq, whq_ref[:], ((1,), (0,))), axis=0)
        # attended features: broadcast-weight + sublane reduce (no transpose)
        v = jnp.sum(av * img_ref[i].astype(f32), axis=0)  # [E]
        q = jnp.sum(aq * que_ref[i].astype(f32), axis=0)  # [E]

        v_ref[i, :] = v
        q_ref[i, :] = q
        av_ref[i, :, :] = av
        aq_ref[i, :, :] = aq


def supported(n: int, dtype, train: bool) -> bool:
    """Single dispatch gate (the caller must not re-derive _NB): bf16
    inference on TPU, batch tiled by _NB, kill switch honoured."""
    import os

    import jax.numpy as jnp

    if train or os.environ.get("VQA_DISABLE_PALLAS"):
        return False
    # _dispatch_target: honors the AOT build-box override (a CPU host
    # exporting platforms=["tpu"] must trace the same graph a TPU would)
    # and the VQA_PALLAS_INTERPRET execution proxy
    from vqa_attention_networks_tpu.ops.pallas_wq_fusion import (
        _dispatch_target,
    )

    if not _dispatch_target():
        return False
    return jnp.dtype(dtype) == jnp.bfloat16 and n % _NB == 0


def coattention_core_pallas(img, que, cv, cq, img_w, que_w, whv, whq,
                            nb: int = _NB):
    """All activations per-sample 3D ([N, L/T, E]); whv/whq [E, 1].
    Returns (v [N,E], q [N,E], av [N,L], aq [N,T]) in f32."""
    from vqa_attention_networks_tpu.ops.pallas_wq_fusion import (
        note_kernel_trace,
    )

    note_kernel_trace()  # feeds aot.py's fast_path_traced metadata
    n, l, e = img.shape
    t = que.shape[1]
    assert n % nb == 0, (n, nb)
    grid = (n // nb,)
    dt = img.dtype

    def spec3(p):
        return pl.BlockSpec((nb, p, e), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    v, q, av, aq = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            spec3(l), spec3(t), spec3(l), spec3(t), spec3(l), spec3(t),
            pl.BlockSpec((e, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nb, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, l, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, t, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, e), jnp.float32),
            jax.ShapeDtypeStruct((n, e), jnp.float32),
            jax.ShapeDtypeStruct((n, l, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, t, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret_flag(),
    )(img, que, cv.astype(dt), cq.astype(dt), img_w.astype(dt),
      que_w.astype(dt), whv.astype(dt), whq.astype(dt))
    return v, q, av[..., 0], aq[..., 0]
