"""Training-step throughput (forward + backward + Adam, one jitted program).

Usage: python benchmarks/bench_train.py [--batch 256] [--rng_impl rbg]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.models import get_model
from vqa_attention_networks_tpu.train.losses import soft_cross_entropy


def main(argv=None) -> None:
    import benchmarks.common  # noqa: F401 — runtime preamble
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--model_name", type=str, default="mhb_coAtt")
    parser.add_argument("--compute_dtype", type=str, default="bfloat16")
    parser.add_argument("--rng_impl", type=str, default="threefry2x32")
    parser.add_argument("--iters", type=int, default=8)
    args = parser.parse_args(argv)

    batch = args.batch
    cfg = Config(
        model_name=args.model_name, q_vocab_size=15881, a_vocab_size=1000,
        compute_dtype=args.compute_dtype,
    ).validate()
    model = get_model(cfg.model_name)
    params = jax.device_put(model.init(jax.random.PRNGKey(0), cfg))
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(k0, (batch, 196, 2048), jnp.bfloat16).astype(
        jnp.float32
    )
    ques = jax.random.randint(k1, (batch, 22), 0, 15881, jnp.int32)
    soft = jax.nn.softmax(jax.random.normal(k2, (batch, 1000)))

    def loss_fn(p, img, ques, soft, k):
        logits, _ = model.apply(p, cfg, img, ques, train=True, rng=k)
        return soft_cross_entropy(logits, soft)

    @jax.jit
    def step(p, o, img, ques, soft, k):
        loss, grads = jax.value_and_grad(loss_fn)(p, img, ques, soft, k)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    key = jax.random.key(2, impl=args.rng_impl)
    p, o, l = step(params, opt_state, img, ques, soft, key)
    np.asarray(l)
    t0 = time.perf_counter()
    for i in range(args.iters):
        p, o, l = step(p, o, img, ques, soft, key)
    np.asarray(l)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{args.model_name} train step batch={batch} "
          f"rng={args.rng_impl}: {dt * 1000:.1f} ms -> "
          f"{batch / dt:.0f} qa-pairs/s")


if __name__ == "__main__":
    main()
