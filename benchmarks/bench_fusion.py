"""A/B the three grid-fusion implementations (TPU, batch 1024, bf16).

Usage: python benchmarks/bench_fusion.py
"""

import jax
import jax.numpy as jnp

from benchmarks.common import timeit_last
from vqa_attention_networks_tpu.ops import pallas_fusion as pf
from vqa_attention_networks_tpu.ops.fusion import grid_fuse_weight_contracted


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--batch", type=int, default=1024)
    args = parser.parse_args(argv)

    batch, k = args.batch, 5
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(k0, (batch, 196, 2048), jnp.bfloat16)
    w = jax.random.normal(k1, (2048, 5000), jnp.bfloat16) * 0.02
    b = jnp.zeros((5000,), jnp.float32)
    qp = jax.random.normal(k2, (batch, 5000), jnp.bfloat16)

    variants = {
        "composed XLA": lambda i, w, b, q: pf._grid_fuse_reference(
            i, w, b, q, k
        ).sum(),
        "Pallas fused kernel": lambda i, w, b, q: pf._grid_fuse_pallas(
            i, w, b, q, k
        ).sum(),
        "weight-contracted": lambda i, w, b, q: grid_fuse_weight_contracted(
            i, w, b, q, k
        ).sum(),
    }
    for name, fn in variants.items():
        best = timeit_last(jax.jit(fn), img, w, b, qp)
        print(f"{name:24s} {best * 1000:8.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
