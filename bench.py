"""Headline benchmark: batched MHB+co-attention inference throughput.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "qa_pairs_per_sec", "vs_baseline": N}

Baseline (BASELINE.md north star): 10,000 QA pairs/sec/chip on TPU v5e.
The model is the flagship MHBCoAtt at production shapes (22-token questions,
196x2048 ResNet-152 grid, 1000 answers), bf16 activations, f32 logits.
"""

import json
import time

import jax
import jax.numpy as jnp

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)

BASELINE_QPS = 10_000.0


def _require_devices(timeout_s: float = 600.0) -> None:
    """Fail fast (one JSON error line) if backend init hangs.

    A healthy backend initialises in seconds; a wedged TPU relay blocks
    ``jax.devices()`` forever (observed: the axon tunnel dropping
    mid-session), which would hang the whole benchmark harness. The probe
    runs in a daemon thread so a hung init cannot keep the process alive.
    """
    import threading

    out: list = []
    err: list = []

    def probe():
        try:
            out.append(jax.devices())
        except Exception as e:  # init failed outright — report the cause
            err.append(f"{type(e).__name__}: {e}")

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not out:
        reason = err[0] if err else (
            f"backend init exceeded {timeout_s:.0f}s "
            "(device relay unreachable)"
        )
        print(
            json.dumps(
                {
                    "metric": "mhb_coAtt batched inference throughput (1 chip)",
                    "value": 0.0,
                    "unit": "qa_pairs_per_sec",
                    "vs_baseline": 0.0,
                    "error": reason,
                }
            )
        )
        raise SystemExit(2)


def main() -> None:
    _require_devices()
    enable_persistent_cache()
    batch = 1024
    cfg = Config(
        model_name="mhb_coAtt",
        q_vocab_size=15881,
        a_vocab_size=1000,
        compute_dtype="bfloat16",
    ).validate()
    model = get_model(cfg.model_name)
    params = model.init(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)

    @jax.jit
    def fwd(params, img, ques):
        logits, _ = model.apply(params, cfg, img, ques, train=False)
        return jnp.argmax(logits, axis=-1)

    # A/B control arm: "auto" promotes the two-samples-per-instance pair
    # kernel on even batches (r4 hardware win, Config.fast_path docs), so
    # the alternate arm forces the SINGLE-sample kernel. Bit-exact either
    # way — the better-measuring arm is the headline, and a single-arm win
    # here is the signal that the promotion regressed on a new toolchain.
    cfg_single = cfg.replace(fast_path="pallas")

    @jax.jit
    def fwd_single(params, img, ques):
        logits, _ = model.apply(params, cfg_single, img, ques, train=False)
        return jnp.argmax(logits, axis=-1)

    rng = jax.random.PRNGKey(1)

    # Vary inputs across iterations and FETCH every output: on relayed
    # backends block_until_ready alone under-reports (the fetch is what
    # forces completion), and constant inputs invite caching artefacts.
    import numpy as np

    def make_inputs(n, n_bufs):
        ques = jax.random.randint(
            rng, (n, cfg.max_question_length), 0, cfg.q_vocab_size, jnp.int32
        )
        imgs = [
            jax.random.normal(
                jax.random.fold_in(rng, i),
                (n, cfg.img_feature_dim, cfg.img_feature_channel),
                jnp.bfloat16,
            )
            for i in range(n_bufs)
        ]
        return imgs, ques

    imgs, ques = make_inputs(batch, 4)

    # The device executes dispatches in order, so fetching ONLY the last
    # output bounds the wall-clock of all iterations with a single host
    # round-trip (fetching every output would add ~26 ms of relay latency
    # per iteration on tunneled backends and measure the tunnel, not the
    # chip).
    iters = 32

    def measure(step_fn, imgs, ques, n, iters=iters):
        np.asarray(step_fn(params, imgs[0], ques))  # compile + warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for i in range(iters):
                out = step_fn(params, imgs[i % len(imgs)], ques)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return n * iters / best

    on_tpu = jax.default_backend() == "tpu"
    # auto == pair kernel at this (even) batch on TPU; composed elsewhere
    qps, arm = measure(fwd, imgs, ques, batch), (
        "pair" if on_tpu else "composed(auto)")
    if on_tpu:
        # The control arms below are diagnostic, never a liability: any
        # failure (e.g. a Mosaic regression on a new toolchain, or an OOM
        # at the large batch) leaves the default arm's number standing.
        import sys

        try:
            qps_single = measure(fwd_single, imgs, ques, batch)
            print(f"arm pair(auto): {qps:.1f} qa-pairs/s, "
                  f"arm single: {qps_single:.1f} qa-pairs/s",
                  file=sys.stderr)
            if qps_single > qps:
                qps, arm = qps_single, "single"
                print("WARNING: single-sample kernel beat the promoted "
                      "pair arm — revisit the auto promotion "
                      "(models/mhb_coatt.py)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — diagnostic arm only
            print(f"single control arm failed ({type(e).__name__}: {e}); "
                  "keeping auto(pair) result", file=sys.stderr)

        # Large-batch arm: throughput is the metric and batch size is free
        # for offline/batched serving — the r2 sweep measured ~+5% at 4096
        # (weight reload + dispatch amortisation). 2 input buffers of
        # 4096x196x2048 bf16 = 6.6 GB: fits beside params on 16 GB, but
        # only after the 1024 buffers are dropped.
        big = 4096
        try:
            del imgs
            imgs_big, ques_big = make_inputs(big, 2)
            qps_big = measure(fwd, imgs_big, ques_big, big, iters=8)
            print(f"arm pair@4096: {qps_big:.1f} qa-pairs/s",
                  file=sys.stderr)
            if qps_big > qps:
                qps, arm, batch = qps_big, "pair", big
            del imgs_big
        except Exception as e:  # noqa: BLE001 — diagnostic arm only
            print(f"batch-4096 arm failed ({type(e).__name__}: {e}); "
                  f"keeping batch-{batch} result", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "mhb_coAtt batched inference throughput (1 chip)",
                "value": round(qps, 1),
                "unit": "qa_pairs_per_sec",
                "vs_baseline": round(qps / BASELINE_QPS, 3),
                "kernel_arm": arm,
                "batch": batch,
            }
        )
    )


if __name__ == "__main__":
    main()
