"""End-to-end serving-engine throughput (InferenceEngine.predict_stream).

Unlike bench.py / bench_models.py — which time the bare jitted forward —
this measures the PRODUCTION serving path end to end: host-side pad +
dtype casts, H2D transfer, bf16 Pallas forward, in-jit top-k, D2H fetch of
the top-5 ids/probs, and Prediction object assembly, with the engine's
one-batch-in-flight pipelining (serve.py:86-106).

The gap between this number and bench.py's device-only rate is the host/IO
overhead a deployment actually pays (the reference has no serving path at
all; its closest analog is the one-image predict script,
predict_pytorch.py:15-94).

The ``--input_dtype int8`` arm measures the engine's quantized feed
(int8 rows + per-sample f16 scales, the quantized feature store's native
output): HALF the H2D bytes of the f16 feed — decisive when transfer
dominates (the relayed dev backend ships ~800 MB/batch at f16; a real
TPU-VM's PCIe pays the same 2x), at the int8 flip-rate cost
bench_precision.py measures.

Usage: python -m benchmarks.bench_serve [--batch 1024] [--batches 16]
           [--input_dtype float16|int8]
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.serve import InferenceEngine


def main(argv=None) -> None:
    import benchmarks.common  # noqa: F401 — runtime preamble
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--batches", type=int, default=16)
    parser.add_argument("--model", type=str, default="mhb_coAtt")
    parser.add_argument("--input_dtype", choices=("float16", "int8"),
                        default="float16")
    parser.add_argument("--by_id", action="store_true",
                        help="serve from the device-resident feature bank "
                        "(DeviceFeatureCache) with VQA-like repeat-image "
                        "traffic: steady state ships ZERO feature bytes "
                        "host->device (implies --input_dtype int8)")
    parser.add_argument("--unique_images", type=int, default=2048,
                        help="--by_id image pool size (working set of the "
                        "traffic; production HBM cost ~396 KB per CACHED "
                        "image)")
    parser.add_argument("--cache_capacity", type=int, default=0,
                        help="--by_id device-bank capacity in images; 0 = "
                        "equal to --unique_images (the everything-fits "
                        "regime). Set BELOW --unique_images to measure "
                        "the eviction regime (working set > HBM — the "
                        "VQA-val-scale reality: ~40k images x 396 KB = "
                        "15.8 GB does not fit beside the model on a "
                        "16 GB chip)")
    parser.add_argument("--zipf", type=float, default=0.0,
                        help="--by_id traffic skew: Zipf exponent over "
                        "the image pool (0 = uniform). Real serving "
                        "traffic is popularity-skewed; ~1.0 is the "
                        "classic web/cache regime")
    parser.add_argument("--warm_batches", type=int, default=0,
                        help="--by_id warm-up traffic batches before the "
                        "timed window (0 = auto). Warm-up misses are "
                        "excluded from the reported hit rate "
                        "(reset_stats) — they are a one-time cost")
    args = parser.parse_args(argv)
    if args.by_id:
        args.input_dtype = "int8"

    cfg = Config(
        model_name=args.model, q_vocab_size=15881, a_vocab_size=1000,
        compute_dtype="bfloat16",
    ).validate()
    model = get_model(args.model)
    params = model.init(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(
        cfg, params, batch_size=args.batch, input_dtype=args.input_dtype
    )

    if args.by_id:
        _bench_by_id(args, cfg, engine)
        return

    # pre-assembled host batches: this isolates the ENGINE's overhead from
    # feature-store IO (bench_host_pipeline.py covers batch assembly)
    rng = np.random.default_rng(0)
    feats_f32 = [
        np.maximum(
            rng.standard_normal(
                (args.batch, cfg.img_feature_dim, cfg.img_feature_channel),
                dtype=np.float32,
            ),
            0.0,
        )
        for _ in range(2)
    ]
    ques = rng.integers(
        0, cfg.q_vocab_size, (args.batch, 22), dtype=np.int32
    )
    qlen = rng.integers(1, 23, (args.batch,), dtype=np.int32)

    if args.input_dtype == "int8":
        # THE writer's quantization (shared with the store) — rows [n,L,D]
        # int8 + per-sample [n,D] f16 scales, the gather_quantized layout
        from vqa_attention_networks_tpu.data.feature_store import (
            quantize_features,
        )

        quantized = []
        for f in feats_f32:
            qrows, scale, _ = quantize_features(f)
            quantized.append((qrows, scale.astype(np.float16)))

        def stream(n):
            for i in range(n):
                qrows, scale = quantized[i % 2]
                yield qrows, ques, qlen, scale
    else:
        feats = [f.astype(np.float16) for f in feats_f32]

        def stream(n):
            for i in range(n):
                yield feats[i % 2], ques, qlen

    # warmup (compile)
    for _ in engine.predict_stream(stream(2)):
        pass

    t0 = time.perf_counter()
    total = 0
    for preds in engine.predict_stream(stream(args.batches)):
        total += len(preds)
    dt = time.perf_counter() - t0

    qps = total / dt
    print(
        f"{args.model} serve @ batch {args.batch}: "
        f"{total} predictions in {dt:.2f} s = {qps:,.0f} qa-pairs/s "
        f"(end-to-end, incl. host pad + top-5 fetch)",
        flush=True,
    )

    # Interpretation aid: when this number sits far below bench.py's
    # device-resident rate, the gap is the host->device link, not the
    # engine. Print the implied feature-feed bandwidth so a reader can
    # tell a ~23 MB/s dev relay from a >= 16 GB/s PCIe host at a glance.
    feat_elems = args.batch * cfg.img_feature_dim * cfg.img_feature_channel
    bytes_per_batch = feat_elems * (1 if args.input_dtype == "int8" else 2)
    gbps = bytes_per_batch * args.batches / dt / 1e9
    print(
        f"  feature feed: {bytes_per_batch / 1e6:,.0f} MB/batch "
        f"({args.input_dtype}) -> implied H2D {gbps:.3f} GB/s; "
        f"device forward is ~15 ms/batch (bench.py) — "
        f"if H2D GB/s is small, this measures the link, not the engine",
        flush=True,
    )


def _bench_by_id(args, cfg, engine) -> None:
    """Device-bank serving: warm the bank, then time VQA-like repeat
    traffic — hits gather features in-graph (zero feature bytes on the
    link; the transfer-bound serve arms motivate exactly this: f16 29
    qa-pairs/s / int8 94 on the ~23-38 MB/s dev relay), misses pay
    fetch + per-image upload and, once the bank is full, LRU eviction
    (serve.DeviceFeatureCache._take_slot).

    Honesty rules (VERDICT r4): the reported hit rate EXCLUDES warm-up
    (cache.reset_stats after the warm window — cold misses are a
    one-time cost, not a steady-state property), and the eviction regime
    is measurable by setting --cache_capacity below --unique_images
    (with --zipf for popularity-skewed traffic). With the defaults
    (capacity = pool, uniform) the steady-state hit rate is exactly 1.0
    BY CONSTRUCTION — a capacity-planning ceiling, not a typical
    deployment point."""
    import json as _json
    import time as _time

    rng = np.random.default_rng(0)
    u = args.unique_images
    cap = args.cache_capacity or u
    l, d = cfg.img_feature_dim, cfg.img_feature_channel
    rows = rng.integers(-127, 128, size=(u, l, d), dtype=np.int8)
    scale = (rng.random((u, d)).astype(np.float32) * 0.05 + 0.01).astype(
        np.float16
    )
    cache = engine.attach_feature_cache(
        capacity=cap, fetch=lambda ids: (rows[ids], scale[ids])
    )
    ques = rng.integers(
        0, cfg.q_vocab_size, (args.batch, 22), dtype=np.int32
    )
    qlen = rng.integers(1, 23, (args.batch,), dtype=np.int32)

    if args.zipf > 0:
        # popularity ranks shuffled over ids so "hot" images are not a
        # contiguous range (contiguity would alias with LRU order)
        p = 1.0 / np.arange(1, u + 1, dtype=np.float64) ** args.zipf
        p /= p.sum()
        perm = rng.permutation(u)

        def draw():
            return perm[rng.choice(u, size=args.batch, p=p)]
    else:
        def draw():
            return rng.integers(0, u, size=args.batch)

    # a sequential upload pass stands in for warm-up ONLY in the
    # everything-fits regime with auto warm-up; an explicit
    # --warm_batches always runs that much real sampled traffic
    seq_warm = cap == u and not args.warm_batches
    if seq_warm:
        warm_batches = -(-u // args.batch)
    else:
        warm_batches = args.warm_batches or max(4, 2 * u // args.batch)

    # presample every batch's ids OUTSIDE the timed windows: the zipf
    # sampler rebuilds an O(pool) probability table per rng.choice call,
    # which would otherwise bill host sampling cost to the serving engine
    # (deflating the zipf arms relative to uniform at large pools)
    warm_ids = [] if seq_warm else [draw() for _ in range(warm_batches)]
    timed_ids = [draw() for _ in range(args.batches)]

    def stream(id_batches):
        for ids in id_batches:
            yield ids, ques, qlen

    # warm: compile, fill the bank, and (capacity < pool) settle the LRU
    # into its steady mix of hits/misses/evictions
    t0 = _time.perf_counter()
    if seq_warm:
        # everything-fits: one sequential pass uploads the whole pool —
        # the cold-start cost a deployment pays once per hot set
        for start in range(0, u, args.batch):
            ids = np.arange(start, min(start + args.batch, u))
            engine.predict_batch_by_id(
                ids, ques[: len(ids)], qlen[: len(ids)]
            )
        assert cache.misses == u, (cache.misses, u)
    else:
        for _ in engine.predict_stream_by_id(stream(warm_ids)):
            pass
    warm_s = _time.perf_counter() - t0
    warm_misses = cache.misses
    cache.reset_stats()

    t0 = _time.perf_counter()
    total = 0
    for preds in engine.predict_stream_by_id(stream(timed_ids)):
        total += len(preds)
    dt = _time.perf_counter() - t0

    qps = total / dt
    hit_rate = cache.hits / max(cache.hits + cache.misses, 1)
    traffic = f"zipf({args.zipf:g})" if args.zipf > 0 else "uniform"
    print(
        f"{args.model} serve-by-id @ batch {args.batch}: pool {u} images, "
        f"bank capacity {cap} ({'everything fits' if cap >= u else 'EVICTION regime'}), "
        f"{traffic} traffic — {total} predictions in {dt:.2f} s = "
        f"{qps:,.0f} qa-pairs/s at steady-state hit rate {hit_rate:.3f} "
        f"(warm-up excluded; misses {cache.misses}, evictions "
        f"{cache.evictions}; warm {warm_batches} batches / "
        f"{warm_misses} uploads "
        f"{warm_misses * (l * d + 2 * d) / 1e6:,.0f} MB in {warm_s:.1f} s)",
        flush=True,
    )
    print(_json.dumps({
        "arm": "serve_by_id", "pool": u, "capacity": cap,
        "zipf": args.zipf, "batch": args.batch,
        "qa_pairs_per_sec": round(qps, 1),
        "steady_hit_rate": round(hit_rate, 4),
        "steady_misses": cache.misses, "evictions": cache.evictions,
    }), flush=True)


if __name__ == "__main__":
    main()
