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

BASELINE_QPS = 10_000.0


def main() -> None:
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

    rng = jax.random.PRNGKey(1)
    img = jax.random.normal(
        rng, (batch, cfg.img_feature_dim, cfg.img_feature_channel),
        jnp.bfloat16,
    )
    ques = jax.random.randint(
        rng, (batch, cfg.max_question_length), 0, cfg.q_vocab_size, jnp.int32
    )

    # compile + warmup
    fwd(params, img, ques).block_until_ready()

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, img, ques)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    qps = batch * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "mhb_coAtt batched inference throughput (1 chip)",
                "value": round(qps, 1),
                "unit": "qa_pairs_per_sec",
                "vs_baseline": round(qps / BASELINE_QPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
