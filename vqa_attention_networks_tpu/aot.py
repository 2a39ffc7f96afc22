"""Ahead-of-time serving artifacts (jax.export).

The serving forward is a pure function of (params, img, ques, qlen) at ONE
fixed batch size (serve.py's pad+mask contract). ``jax.export`` lowers it
once and serialises the StableHLO — a versioned, self-contained deployment
artifact:

- a build box exports for a target platform (``platforms=["tpu"]``) without
  ever holding serving traffic;
- the serving box deserialises + compiles, skipping Python-side tracing of
  the whole model zoo, and — combined with the persistent compilation cache
  (utils/compilation_cache.py) — skips XLA compilation after its first boot;
- the artifact pins the exact serving graph: a library upgrade cannot
  silently change the deployed numerics.

Weights stay OUT of the artifact (they ship via the Orbax checkpoint the
train CLI already exports); the artifact carries only the graph plus a
metadata sidecar used to validate checkpoint/vocab compatibility at load.

The reference has no analog — its deploy story is re-running the Python
model definition (predict_pytorch.py:70-83).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import get_model

_GRAPH = "serving.stablehlo"
_META = "serving.json"

# families whose bf16 TPU serving forward dispatches to a Pallas kernel
# (mhb_coAtt: the combined stage-1+co-attention kernel, models/mhb_coatt.py;
# hieCoAtten: the co-attention core, models/hiecoatten.py). Other families
# serve the composed/weight-contracted XLA graph by design, so a
# fast_path_traced=False artifact is expected for them, not a regression.
FAST_PATH_MODELS = frozenset({"mhb_coAtt", "hieCoAtten"})


def _wqf():
    # deferred: aot.py must stay importable even if the ops package is
    # being bisected; the fast-path module is only needed for TPU exports
    from vqa_attention_networks_tpu.ops import pallas_wq_fusion

    return pallas_wq_fusion


def serving_forward(cfg: Config, topk: int, input_dtype: str = "float16"):
    """THE serving forward: apply -> softmax -> top-k over one fixed batch.

    Single source of truth for both serving paths — InferenceEngine jits
    this same function, and export_serving lowers it, so the AOT artifact
    and the jit engine can never drift apart.
    """
    model = get_model(cfg.model_name)
    # a top-k wider than the answer vocab (e.g. the default --topk 5 with
    # a 3-answer yes/no-filtered vocab) is a trace-time lax.top_k error —
    # clamp instead of crashing at server start
    topk = min(topk, cfg.a_vocab_size)

    def _head(logits):
        probs = jax.nn.softmax(logits, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, topk)
        return top_i, top_p

    if input_dtype == "int8":
        # quantized feed (data/feature_store.py int8 stores): half the f16
        # feed's host->device bytes — the store-backed serving ceiling is
        # the feature DMA, not the kernel. Dequant is one fused multiply
        # in-graph.
        def fwd(params, img_q, scale, ques, qlen):
            dt = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                  else jnp.float32)
            img = img_q.astype(dt) * scale[:, None, :].astype(dt)
            logits, _ = model.apply(
                params, cfg, img, ques, ques_length=qlen, train=False
            )
            return _head(logits)

        return fwd

    def fwd(params, img, ques, qlen):
        logits, _ = model.apply(
            params, cfg, img, ques, ques_length=qlen, train=False
        )
        return _head(logits)

    return fwd


def serving_forward_banked(cfg: Config, topk: int):
    """The device-feature-cache serving forward: gather int8 rows + f16
    scales from a DEVICE-RESIDENT bank by slot index, then run the exact
    int8 forward (``serving_forward(cfg, topk, "int8")`` — one source of
    truth, so the banked path cannot drift from the per-request feed).

    A cache hit ships zero feature bytes host->device: the gather happens
    in-graph on HBM. This is the engine-side answer to the measured
    transfer-bound serving numbers (bench_serve: the f16 feed moves
    ~822 MB/batch; VQA traffic re-uses each image ~3x, reference
    data_loader.py:27-32 loads per-question features of shared images).
    """
    base = serving_forward(cfg, topk, "int8")

    def fwd(params, bank_rows, bank_scale, idx, ques, qlen):
        # bank_rows [C, L, D] int8; bank_scale [C, D] f16; idx [B] int32
        return base(params, bank_rows[idx], bank_scale[idx], ques, qlen)

    return fwd


def serving_forward_banked_sharded(cfg: Config, topk: int, mesh,
                                   data_axis: str = "data"):
    """The banked serving forward for a bank SHARDED over the ``data``
    mesh axis: device d holds bank rows ``[d*C/D, (d+1)*C/D)``, so bank
    capacity scales with the mesh instead of replicating (one chip's
    ~16 GB HBM caps a single-device bank at ~40k-image VQA-val scale —
    15.7 GB of int8 rows does NOT fit beside the model; D chips do).

    The gather is the same ICI ring as the training-side sharded feature
    bank (train/solver.py _ring_lookup): each data shard's (slot indices,
    int8-row accumulator, scale accumulator) triple rotates around the
    ``data`` ring via ``lax.ppermute``; at each stop the local bank shard
    fills the rows it owns via ``where`` (no float math — bit-exact, and
    int8 rows travel the ring at half the f16 byte cost). D rotations
    return the triple home having visited every shard. The gathered
    (rows, scales) then ride the exact int8 serving forward
    (``serving_forward(cfg, topk, "int8")``) — one source of truth, so
    this path cannot drift from the per-request feed or the single-device
    bank."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    base = serving_forward(cfg, topk, "int8")
    ndata = int(mesh.shape[data_axis])
    perm = [(j, (j + 1) % ndata) for j in range(ndata)]

    def _gather(rows_loc, scale_loc, idx_loc):
        rows_per = rows_loc.shape[0]
        acc_r = jnp.zeros(
            (idx_loc.shape[0],) + rows_loc.shape[1:], rows_loc.dtype
        )
        acc_s = jnp.zeros(
            (idx_loc.shape[0],) + scale_loc.shape[1:], scale_loc.dtype
        )
        r = idx_loc
        for _ in range(ndata):
            d = jax.lax.axis_index(data_axis)
            local = r - d * rows_per
            ok = (local >= 0) & (local < rows_per)
            safe = jnp.clip(local, 0, rows_per - 1)
            acc_r = jnp.where(ok[:, None, None], rows_loc[safe], acc_r)
            acc_s = jnp.where(ok[:, None], scale_loc[safe], acc_s)
            r = jax.lax.ppermute(r, data_axis, perm)
            acc_r = jax.lax.ppermute(acc_r, data_axis, perm)
            acc_s = jax.lax.ppermute(acc_s, data_axis, perm)
        return acc_r, acc_s

    gather = shard_map(
        _gather, mesh=mesh,
        in_specs=(P(data_axis), P(data_axis), P(data_axis)),
        out_specs=(P(data_axis), P(data_axis)),
    )

    def fwd(params, bank_rows, bank_scale, idx, ques, qlen):
        # bank_rows [C, L, D] int8 sharded (data, ...); idx [B] int32
        # sharded (data,) — the gathered batch shard stays on its device
        rows, scale = gather(bank_rows, bank_scale, idx)
        return base(params, rows, scale, ques, qlen)

    return fwd


def export_serving(
    cfg: Config,
    params,
    batch_size: int,
    topk: int = 5,
    platforms: Optional[Tuple[str, ...]] = None,
    input_dtype: str = "float16",
):
    """Lower the fixed-batch serving forward to a jax.export.Exported."""
    from jax import export as jex

    fwd = serving_forward(cfg, topk, input_dtype)
    img = jax.ShapeDtypeStruct(
        (batch_size, cfg.img_feature_dim, cfg.img_feature_channel),
        jnp.int8 if input_dtype == "int8" else jnp.float16,
    )
    ques = jax.ShapeDtypeStruct(
        (batch_size, cfg.max_question_length), jnp.int32
    )
    qlen = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
    # shape/dtype only — never np.asarray (that would fetch every device
    # weight to host just to read its dtype)
    p_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), params
    )
    kw = {}
    if platforms is not None:
        kw["platforms"] = list(platforms)
    # A CPU build box exporting for TPU must trace the SAME graph a TPU
    # host would — i.e. the Pallas fast path, not the composed fallback
    # implied by the host backend. tpu_lowering() overrides the trace-time
    # platform decisions (ops/pallas_wq_fusion.py).
    if platforms is not None and "tpu" in platforms:
        ctx = _wqf().tpu_lowering()
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        if input_dtype == "int8":
            scale = jax.ShapeDtypeStruct(
                (batch_size, cfg.img_feature_channel), jnp.float16
            )
            return jex.export(jax.jit(fwd), **kw)(
                p_spec, img, scale, ques, qlen
            )
        return jex.export(jax.jit(fwd), **kw)(p_spec, img, ques, qlen)


def save_serving_artifact(
    out_dir: str,
    cfg: Config,
    params,
    batch_size: int,
    topk: int = 5,
    platforms: Optional[Tuple[str, ...]] = None,
    input_dtype: str = "float16",
) -> str:
    """Export + write ``serving.stablehlo`` and its metadata sidecar."""
    traces_before = _wqf().kernel_trace_count()
    exported = export_serving(cfg, params, batch_size, topk, platforms,
                              input_dtype)
    fast_path_traced = _wqf().kernel_trace_count() > traces_before
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _GRAPH), "wb") as f:
        f.write(exported.serialize())
    meta = {
        "model_name": cfg.model_name,
        "batch_size": batch_size,
        # the CLAMPED value (serving_forward applies the same min): the
        # engine compares its own clamped topk against this at load, so
        # recording the raw request would reject a valid artifact whenever
        # a_vocab_size < topk
        "topk": min(topk, cfg.a_vocab_size),
        "input_dtype": input_dtype,
        "q_vocab_size": cfg.q_vocab_size,
        "a_vocab_size": cfg.a_vocab_size,
        "max_question_length": cfg.max_question_length,
        "img_feature_dim": cfg.img_feature_dim,
        "img_feature_channel": cfg.img_feature_channel,
        "compute_dtype": cfg.compute_dtype,
        "platforms": list(exported.platforms),
        # True iff the Pallas fast path was traced into this artifact —
        # lets an operator confirm a TPU-targeted export from a CPU build
        # box actually captured the kernel graph, not the composed fallback
        "fast_path_traced": fast_path_traced,
        "config": dataclasses.asdict(cfg),
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def load_serving_artifact(artifact_dir: str):
    """Deserialize -> (jitted callable over (params, img, ques, qlen), meta).

    The callable recompiles nothing at the Python level: the graph comes
    from the artifact, not from re-tracing the model code.
    """
    from jax import export as jex

    with open(os.path.join(artifact_dir, _GRAPH), "rb") as f:
        exported = jex.deserialize(f.read())
    with open(os.path.join(artifact_dir, _META)) as f:
        meta = json.load(f)
    return jax.jit(exported.call), meta
