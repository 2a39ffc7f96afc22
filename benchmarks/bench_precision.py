"""Quantify the wq-fusion kernel's precision against the f32 composed path.

Three arms on the flagship (mhb_coAtt) inference forward:

  pallas_bf16   — the default TPU path (VMEM-resident wq kernel, bf16)
  composed_bf16 — the XLA-composed twin at bf16 (VQA_DISABLE_PALLAS=1)
  composed_f32  — the composed path in float32: the accuracy reference

For each bf16 arm vs the f32 reference this reports, per batch of Xavier-
initialised weights and relu-gaussian image features (post-relu, matching
the sign/sparsity profile of real ResNet grid features,
extract_image_features.py:19-26):

  argmax agreement   — fraction of samples whose predicted answer matches
  top-5 overlap      — mean |top5_a ∩ top5_ref| / 5
  max |Δlogit|       — worst absolute logit error
  p99 |Δprob|        — 99th-percentile absolute error on softmax probs

The pallas-vs-composed-bf16 column isolates the KERNEL's contribution from
bf16 quantisation itself. All metrics reduce to scalars inside jit (the
relayed backend makes bulk fetches expensive, see benchmarks/common.py).

Usage: python -m benchmarks.bench_precision [--batch 1024] [--batches 8]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import get_model


def _metrics(logits_a: jnp.ndarray, logits_ref: jnp.ndarray) -> dict:
    agree = jnp.mean(
        (jnp.argmax(logits_a, -1) == jnp.argmax(logits_ref, -1)).astype(
            jnp.float32
        )
    )
    _, top_a = jax.lax.top_k(logits_a, 5)
    _, top_r = jax.lax.top_k(logits_ref, 5)
    overlap = jnp.mean(
        jnp.sum(
            (top_a[:, :, None] == top_r[:, None, :]).astype(jnp.float32),
            axis=(1, 2),
        )
        / 5.0
    )
    max_dlogit = jnp.max(jnp.abs(logits_a - logits_ref))
    dprob = jnp.abs(
        jax.nn.softmax(logits_a, -1) - jax.nn.softmax(logits_ref, -1)
    )
    p99_dprob = jnp.quantile(dprob.reshape(-1).astype(jnp.float32), 0.99)
    return {
        "argmax_agree": agree,
        "top5_overlap": overlap,
        "max_dlogit": max_dlogit,
        "p99_dprob": p99_dprob,
    }


_compare = jax.jit(_metrics)


def main(argv=None) -> None:
    import benchmarks.common  # noqa: F401 — runtime preamble
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--batches", type=int, default=8)
    parser.add_argument("--model", type=str, default="mhb_coAtt")
    args = parser.parse_args(argv)

    model = get_model(args.model)
    cfg16 = Config(
        model_name=args.model, q_vocab_size=15881, a_vocab_size=1000,
        compute_dtype="bfloat16",
    ).validate()
    cfg32 = cfg16.replace(compute_dtype="float32")
    params = jax.device_put(model.init(jax.random.PRNGKey(0), cfg16))

    def fwd(cfg):
        def run(p, img, ques, qlen):
            logits, _ = model.apply(
                p, cfg, img, ques, ques_length=qlen, train=False
            )
            return logits.astype(jnp.float32)

        return jax.jit(run)

    # dispatch is decided at trace time (pallas_wq_fusion.supported reads the
    # env var and the img dtype), so trace the pallas arm FIRST, then flip
    # the kill switch for the composed-bf16 arm
    assert not os.environ.get("VQA_DISABLE_PALLAS"), (
        "unset VQA_DISABLE_PALLAS — this benchmark traces both settings"
    )
    fwd_pallas = fwd(cfg16)
    fwd_f32 = fwd(cfg32)

    accum: dict = {}
    for b in range(args.batches):
        rng = jax.random.PRNGKey(100 + b)
        k_i, k_q, k_l = jax.random.split(rng, 3)
        # post-relu gaussian: real grid features are relu outputs
        img16 = jax.nn.relu(
            jax.random.normal(
                k_i, (args.batch, cfg16.img_feature_dim,
                      cfg16.img_feature_channel), jnp.bfloat16,
            )
        )
        ques = jax.random.randint(
            k_q, (args.batch, 22), 0, cfg16.q_vocab_size, jnp.int32
        )
        qlen = jax.random.randint(k_l, (args.batch,), 1, 23, jnp.int32)

        logits_pallas = fwd_pallas(params, img16, ques, qlen)
        logits_f32 = fwd_f32(params, img16.astype(jnp.float32), ques, qlen)

        os.environ["VQA_DISABLE_PALLAS"] = "1"
        try:
            if b == 0:
                fwd_comp16 = fwd(cfg16)  # fresh trace under the kill switch
            logits_comp16 = fwd_comp16(params, img16, ques, qlen)
        finally:
            del os.environ["VQA_DISABLE_PALLAS"]

        for name, (a, r) in {
            "pallas_bf16 vs composed_f32": (logits_pallas, logits_f32),
            "composed_bf16 vs composed_f32": (logits_comp16, logits_f32),
            "pallas_bf16 vs composed_bf16": (logits_pallas, logits_comp16),
        }.items():
            m = {k: float(v) for k, v in _compare(a, r).items()}
            acc = accum.setdefault(
                name,
                {"argmax_agree": [], "top5_overlap": [], "max_dlogit": [],
                 "p99_dprob": []},
            )
            for k, v in m.items():
                acc[k].append(v)
        print(f"batch {b + 1}/{args.batches} done", flush=True)

    print(f"\n{args.model} @ batch {args.batch}, "
          f"{args.batches} batches of Xavier weights / relu-gaussian features")
    header = (f"{'comparison':34s} {'argmax':>8s} {'top5':>8s} "
              f"{'max|Δlogit|':>12s} {'p99|Δprob|':>11s}")
    print(header)
    for name, acc in accum.items():
        print(
            f"{name:34s} "
            f"{np.mean(acc['argmax_agree']):8.4f} "
            f"{np.mean(acc['top5_overlap']):8.4f} "
            f"{np.max(acc['max_dlogit']):12.2e} "
            f"{np.max(acc['p99_dprob']):11.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
