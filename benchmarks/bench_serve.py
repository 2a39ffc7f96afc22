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

Usage: python -m benchmarks.bench_serve [--batch 1024] [--batches 16]
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
    args = parser.parse_args(argv)

    cfg = Config(
        model_name=args.model, q_vocab_size=15881, a_vocab_size=1000,
        compute_dtype="bfloat16",
    ).validate()
    model = get_model(args.model)
    params = model.init(jax.random.PRNGKey(0), cfg)
    engine = InferenceEngine(cfg, params, batch_size=args.batch)

    # pre-assembled host batches: this isolates the ENGINE's overhead from
    # feature-store IO (bench_host_pipeline.py covers batch assembly)
    rng = np.random.default_rng(0)
    feats = [
        np.maximum(
            rng.standard_normal(
                (args.batch, cfg.img_feature_dim, cfg.img_feature_channel),
                dtype=np.float32,
            ),
            0.0,
        ).astype(np.float16)
        for _ in range(2)
    ]
    ques = rng.integers(
        0, cfg.q_vocab_size, (args.batch, 22), dtype=np.int32
    )
    qlen = rng.integers(1, 23, (args.batch,), dtype=np.int32)

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


if __name__ == "__main__":
    main()
