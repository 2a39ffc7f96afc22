"""Per-model batched-inference throughput sweep (TPU, bf16, batch 1024).

Usage: python benchmarks/bench_models.py [--batch 1024] [--models a,b,...]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import timeit_last
from vqa_attention_networks_tpu.config import Config, MODEL_NAMES
from vqa_attention_networks_tpu.models import get_model


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--models", type=str, default=",".join(MODEL_NAMES))
    parser.add_argument("--compute_dtype", type=str, default="bfloat16")
    args = parser.parse_args(argv)

    batch = args.batch
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(k0, (batch, 196, 2048), jnp.bfloat16)
    ques = jax.random.randint(k1, (batch, 22), 0, 15881, jnp.int32)
    qlen = jax.random.randint(k2, (batch,), 1, 23, jnp.int32)

    for name in args.models.split(","):
        cfg = Config(
            model_name=name, q_vocab_size=15881, a_vocab_size=1000,
            compute_dtype=args.compute_dtype,
        ).validate()
        model = get_model(name)
        params = jax.device_put(model.init(jax.random.PRNGKey(0), cfg))

        @jax.jit
        def fwd(p, img, ques, qlen):
            logits, _ = model.apply(
                p, cfg, img, ques, ques_length=qlen, train=False
            )
            return jnp.argmax(logits, axis=-1)

        best = timeit_last(fwd, params, img, ques, qlen)
        print(f"{name:16s} {best * 1000:8.2f} ms/batch "
              f"{batch / best:10.0f} qa-pairs/s", flush=True)


if __name__ == "__main__":
    main()
