"""Host batch-assembly throughput: can the data plane feed the device?

The flagship bf16 inference path consumes ~40k qa-pairs/s on one chip
(BENCH_r01.json); every batch the host assembles is a feature gather from the
memory-mapped store + a soft-answer densify (data/dataset.py). This measures
that assembly rate for both feeds (f16 = the bf16-training/inference feed,
f32 = the full-precision feed), with the native C++ kernels
(native/dataplane.cpp) and with the pure-NumPy fallback.

Usage: python benchmarks/bench_host_pipeline.py [--images 2000] [--batch 256]
"""

import argparse
import tempfile
import time

import numpy as np


def _assemble_rate(batches, n_batches: int, trials: int = 3) -> float:
    """Best-of-``trials`` qa-pairs/s over a sweep of ``n_batches`` assemblies."""
    best = 0.0
    for _ in range(trials):
        it = batches.epoch(0)
        t0 = time.perf_counter()
        seen = 0
        for i, b in enumerate(it):
            seen += len(b)
            if i + 1 >= n_batches:
                break
        best = max(best, seen / (time.perf_counter() - t0))
    return best


def main(argv=None) -> None:
    import benchmarks.common  # noqa: F401 — runtime preamble
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", type=int, default=2000)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--pairs", type=int, default=20000)
    parser.add_argument("--num_answers", type=int, default=1000)
    args = parser.parse_args(argv)

    from vqa_attention_networks_tpu.data import native
    from vqa_attention_networks_tpu.data.dataset import VqaBatches
    from vqa_attention_networks_tpu.data.feature_store import (
        make_synthetic_feature_store,
    )
    from vqa_attention_networks_tpu.data.prepare import make_synthetic_qa_data

    rng = np.random.default_rng(0)
    qa = make_synthetic_qa_data(
        rng, n_train=args.pairs, n_val=args.batch,
        num_images=args.images, num_answers=args.num_answers,
    )
    n_batches = max(args.pairs // args.batch - 1, 1)

    with tempfile.TemporaryDirectory() as tmp:
        store = make_synthetic_feature_store(
            tmp,
            image_ids=sorted(
                set(qa.train.image_ids) | set(qa.val.image_ids)
            ),
        )
        # page the whole store into the OS cache so neither path pays the
        # cold-mmap cost (ordering-fair comparison)
        float(np.asarray(store.features[:, 0, 0], np.float32).sum())
        float(np.asarray(store.features[:, -1, -1], np.float32).sum())
        float(np.asarray(store.features, np.float16).view(np.uint16).sum())
        import os

        have_native = native.get_lib() is not None
        for label, force_numpy in (("native", False), ("numpy ", True)):
            if force_numpy:
                # the public kill switch (checked inside native.get_lib) —
                # reaching into module privates would silently stop forcing
                # the NumPy arm if the internals were ever renamed
                os.environ["VQA_DISABLE_NATIVE"] = "1"
            elif not have_native:
                print("native library unavailable — NumPy fallback only")
                continue
            for dtype in (np.float16, np.float32):
                batches = VqaBatches(
                    qa.train, store, batch_size=args.batch,
                    num_answers=args.num_answers, soft_answer=True,
                    shuffle=True, feature_dtype=dtype,
                )
                rate = _assemble_rate(batches, n_batches)
                print(
                    f"{label} feed={np.dtype(dtype).name:8s} "
                    f"batch={args.batch:5d} {rate:12.0f} qa-pairs/s "
                    f"({rate * 196 * 2048 * np.dtype(dtype).itemsize / 1e9:.1f}"
                    f" GB/s features)",
                    flush=True,
                )
            if force_numpy:
                os.environ.pop("VQA_DISABLE_NATIVE", None)

        # ---- int8 quantized feed (tools/quantize_store.py): int8 rows +
        # f16 scales per batch, dequant happens ON DEVICE — this measures
        # the host-side assembly cost of the quarter-size feed
        from vqa_attention_networks_tpu.data.feature_store import (
            quantize_store,
        )

        q_store = quantize_store(tmp, os.path.join(tmp, "int8_store"))
        batches_q = VqaBatches(
            qa.train, q_store, batch_size=args.batch,
            num_answers=args.num_answers, soft_answer=True,
            shuffle=True, feature_dtype=np.int8,
        )
        rate = _assemble_rate(batches_q, n_batches)
        print(
            f"int8   feed=int8+scale batch={args.batch:5d} {rate:12.0f} "
            f"qa-pairs/s ({rate * 196 * 2048 / 1e9:.1f} GB/s features)",
            flush=True,
        )

        # ---- thread-pool batch assembly (dataset.parallel_epoch): the
        # training feed's scale-out lever on a multi-core TPU-VM host.
        # On this 1-core dev VM workers>1 only measures overhead; the
        # number that matters is the sweep on real hardware.
        batches = VqaBatches(
            qa.train, store, batch_size=args.batch,
            num_answers=args.num_answers, soft_answer=True,
            shuffle=True, feature_dtype=np.float16,
        )
        for workers in (1, 2, 4, 8):
            best = 0.0
            for _ in range(3):
                it = batches.parallel_epoch(0, workers=workers)
                t0 = time.perf_counter()
                seen = 0
                for i, b in enumerate(it):
                    seen += len(b)
                    if i + 1 >= n_batches:
                        break
                it.close()
                best = max(best, seen / (time.perf_counter() - t0))
            print(
                f"assembly workers={workers}  batch={args.batch:5d} "
                f"{best:12.0f} qa-pairs/s",
                flush=True,
            )

        # ---- serving gather: the store-backed request path (cli/serve.py)
        # under VQA-like repeat traffic (~3 questions/image in VQA v2).
        # Measures the LRU feature cache's effect on the per-request host
        # cost; with the cache sized to the working set the steady-state
        # rate is a dict hit + stack instead of a memmap read per request.
        from types import SimpleNamespace

        from vqa_attention_networks_tpu.cli.serve import (
            FeatureCache, VqaService,
        )

        grid_bytes = store.num_regions * store.channels * 2
        req_ids = rng.choice(
            sorted(store.row_of), size=args.pairs, replace=True
        ).tolist()
        for label, cap_mb in (("cache off", 0), ("cache 512M", 512)):
            svc = SimpleNamespace(
                cache=FeatureCache(cap_mb << 20, grid_bytes), store=store,
                int8=False,
            )
            svc._gather = lambda ids, s=svc: VqaService._gather(s, ids)
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                for start in range(0, len(req_ids), args.batch):
                    feats = VqaService._features_batch(
                        svc, req_ids[start:start + args.batch]
                    )
                    np.stack(feats)
                best = max(best, len(req_ids) / (time.perf_counter() - t0))
            stats = svc.cache.stats()
            hit = stats["hits"] / max(stats["hits"] + stats["misses"], 1)
            print(
                f"serving gather {label:10s} batch={args.batch:5d} "
                f"{best:12.0f} req/s (hit rate {hit:.2f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
